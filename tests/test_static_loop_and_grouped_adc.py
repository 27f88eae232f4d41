"""Round-5 config-4 levers: static-iteration hop loops (search._run_hops)
and the grouped gated-ADC scorer (pq.gated_block_scorer_for impl="grouped").

On the CPU test mesh the grouped scorer's custom_vmap rule fires and falls
through to the einsum fallback (ops/pallas_kernels.gated_adc_sums off-TPU),
so these tests pin the batching plumbing and the loop-mode semantics; the
Pallas lowering itself is asserted on-chip by benches/c4_attack.py's
kernel_check gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from islands_tpu.core import pq as pq_mod
from islands_tpu.core.config import DistanceMetric, LeannConfig, PQConfig
from islands_tpu.core.embedding import InMemoryEmbeddingProvider
from islands_tpu.core.leann import LeannIndex


def _corpus(n=2048, dim=32, nq=64, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, dim)).astype(np.float32)
    x = (centers[rng.integers(0, 32, n)]
         + 0.5 * rng.standard_normal((n, dim)).astype(np.float32))
    q = (centers[rng.integers(0, 32, nq)]
         + 0.5 * rng.standard_normal((nq, dim)).astype(np.float32))
    return x, q


def test_grouped_scorer_matches_einsum_under_vmap():
    rng = np.random.default_rng(3)
    b, e, s, k = 24, 70, 8, 64  # deliberately not multiples of group/lanes
    tables = jnp.asarray(rng.standard_normal((b, s, k)), dtype=jnp.float32)
    codes = jnp.asarray(rng.integers(0, k, size=(b, e, s)), dtype=jnp.uint8)
    valid = jnp.asarray(rng.random((b, e)) < 0.9)

    for metric in (DistanceMetric.EUCLIDEAN, DistanceMetric.COSINE):
        grouped = pq_mod.gated_block_scorer_for(metric, "grouped")
        einsum = pq_mod.gated_block_scorer_for(metric, "einsum")
        got = jax.vmap(grouped)(tables, codes, valid)
        want = jax.vmap(einsum)(tables, codes, valid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # Unbatched call goes through the fallback body directly.
        got1 = grouped(tables[0], codes[0], valid[0])
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want[0]),
                                   rtol=1e-5, atol=1e-5)


def test_gated_adc_sums_jnp_reference():
    from islands_tpu.ops.pallas_kernels import _gated_adc_jnp

    rng = np.random.default_rng(5)
    tables = jnp.asarray(rng.standard_normal((4, 8, 32)), dtype=jnp.float32)
    codes = jnp.asarray(rng.integers(0, 32, size=(4, 10, 8)), dtype=jnp.int32)
    got = np.asarray(_gated_adc_jnp(tables, codes))
    want = np.zeros((4, 10), np.float32)
    tn = np.asarray(tables, dtype=np.float32)
    cn = np.asarray(codes)
    for b in range(4):
        for e in range(10):
            want[b, e] = sum(tn[b, s, cn[b, e, s]] for s in range(8))
    # Tolerance covers per-term bf16 rounding: XLA may fold the bf16 cast
    # into an f32 dot (TPU lowering does) or keep it; either is within
    # S * max|t| * 2^-9 of the raw-f32 lookup sum.
    np.testing.assert_allclose(got, want, atol=8 * 4 * 2.0 ** -9, rtol=0.01)


@pytest.fixture(scope="module")
def pq_index():
    x, q = _corpus()
    cfg = LeannConfig(metric=DistanceMetric.EUCLIDEAN, wave_size=512)
    idx = LeannIndex(cfg)
    idx.build_from_embeddings(
        x, with_pq=PQConfig(num_subquantizers=8, num_centroids=32,
                            training_iterations=4, seed=0))
    return idx, x, q


def _brute_ids(x, q, k=10):
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1)[:, :k]


def test_two_level_static_loop_recall_and_parity(pq_index):
    idx, x, q = pq_index
    provider = InMemoryEmbeddingProvider(x)
    gt = _brute_ids(x, q)

    kw = dict(k=10, provider=provider, ef=32, max_iters=12, routing_size=256)
    _, ids_w = idx.search_two_level(q, static_loop=False, **kw)
    _, ids_s = idx.search_two_level(q, static_loop=True, **kw)

    def rec(ids):
        return np.mean([len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10
                        for i in range(len(q))])

    rw, rs = rec(ids_w), rec(ids_s)
    # The scan form executes hops the while cond would skip; extra hops can
    # only merge equal-or-better candidates into the pool.
    assert rs >= rw - 1e-9, (rs, rw)
    assert rs > 0.8


def test_two_level_grouped_impl_matches_einsum(pq_index):
    idx, x, q = pq_index
    provider = InMemoryEmbeddingProvider(x)
    kw = dict(k=10, provider=provider, ef=32, max_iters=12, routing_size=256,
              static_loop=True)
    d_g, ids_g = idx.search_two_level(q, adc_impl="grouped", **kw)
    d_e, ids_e = idx.search_two_level(q, adc_impl="einsum", **kw)
    # Identical numerics (bf16 one-hot selection either way) => identical
    # walks and identical results.
    np.testing.assert_array_equal(ids_g, ids_e)
    np.testing.assert_allclose(d_g, d_e, rtol=1e-6, atol=1e-6)


def test_sketch_gated_static_loop(pq_index):
    # static_iters threads through the sketch-gated batched entry too.
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.search import StoredSearcher

    x, q = _corpus(n=1024, dim=32, nq=32, seed=1)
    cfg = LeannConfig(metric=DistanceMetric.EUCLIDEAN, wave_size=256,
                      sketch_dims=16)
    graph, sketch = build_index_with_sketch(jnp.asarray(x), cfg)
    searcher = StoredSearcher(graph, jnp.asarray(x),
                              DistanceMetric.EUCLIDEAN, sketch=sketch,
                              routing_size=256)
    gt = _brute_ids(x, q)
    d_w, i_w = searcher.search(q, k=10, ef=32, max_iters=10)
    d_s, i_s = searcher.search(q, k=10, ef=32, max_iters=10,
                               static_loop=True)

    def rec(ids):
        return np.mean([len(set(np.asarray(ids)[i].tolist())
                            & set(gt[i].tolist())) / 10
                        for i in range(len(q))])

    assert rec(i_s) >= rec(i_w) - 1e-9
    assert rec(i_s) > 0.8


def test_two_level_hop_merge_fused_parity(pq_index):
    """hop_merge='fused' on the two-level PQ path must return identical
    results to the inline composition (same dedup/merge/promote
    semantics; the Pallas lowering engages only on TPU)."""
    idx, x, q = pq_index
    provider = InMemoryEmbeddingProvider(x)
    kw = dict(k=10, provider=provider, ef=32, max_iters=12,
              routing_size=256, promote_width=8, final_rescore=32)
    d_i, ids_i = idx.search_two_level(q, hop_merge="inline", **kw)
    d_f, ids_f = idx.search_two_level(q, hop_merge="fused", **kw)
    np.testing.assert_array_equal(ids_i, ids_f)
    np.testing.assert_allclose(d_i, d_f, rtol=0, atol=0)
