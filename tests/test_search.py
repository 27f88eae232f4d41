"""Batched beam-search tests.

Oracles, mirroring the reference's test strategy (SURVEY.md §4):
1. parity vs a sequential heap-based best-first search (host_ref) on graphs
   where both should converge (good connectivity, wide ef);
2. recall vs brute force on a brute-force-built kNN graph (isolates search
   quality from construction quality).
"""

import numpy as np
import pytest

from islands_tpu.core import host_ref
from islands_tpu.core.config import DistanceMetric
from islands_tpu.core.csr import CsrGraph
from islands_tpu.core.search import StoredSearcher
from islands_tpu.ops import distance as D

from conftest import make_vectors


def knn_graph(x: np.ndarray, m: int, metric) -> tuple[list[list[int]], CsrGraph]:
    """Brute-force kNN adjacency (excluding self), made symmetric-ish by
    construction quality — a known-good graph for testing search."""
    d = np.array(D.pairwise_distance(x, x, metric))
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1)[:, :m]
    adjacency = [list(map(int, row)) for row in order]
    return adjacency, CsrGraph.from_adjacency(adjacency)


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE, DistanceMetric.EUCLIDEAN])
def test_recall_on_knn_graph(metric):
    n, dim, k, ef = 500, 32, 10, 64
    x = make_vectors(n, dim, seed=10)
    q = make_vectors(8, dim, seed=11)
    _, graph = knn_graph(x, m=16, metric=metric)
    searcher = StoredSearcher(graph, x, metric)
    dists, ids = searcher.search(q, k=k, ef=ef)
    dists, ids = np.asarray(dists), np.asarray(ids)

    recalls = []
    for qi in range(len(q)):
        truth = host_ref.brute_force_topk(x, q[qi], k, metric)
        recalls.append(host_ref.recall(ids[qi], [i for i, _ in truth]))
    # kNN graphs are highly navigable; demand strong recall (the reference's
    # CI floor is a lenient 35% @k=1 on its own construction, hnsw.rs:848-853;
    # here construction is exact so search itself must be near-perfect).
    assert np.mean(recalls) >= 0.9, recalls


@pytest.mark.parametrize("expand_width", [1, 4])
def test_parity_with_sequential_best_first(expand_width):
    """With expand_width=1 the device loop IS the sequential algorithm; the
    result sets must match it closely. Wider beams may only improve."""
    n, dim, ef = 300, 16, 32
    metric = DistanceMetric.EUCLIDEAN
    x = make_vectors(n, dim, seed=12)
    q = make_vectors(4, dim, seed=13)
    adjacency, graph = knn_graph(x, m=12, metric=metric)
    searcher = StoredSearcher(graph, x, metric)
    _, ids = searcher.search(q, k=10, ef=ef, expand_width=expand_width)
    ids = np.asarray(ids)

    entry = int(graph.entry_point)
    for qi in range(len(q)):
        seq = host_ref.best_first_search(adjacency, x, q[qi], entry, ef, metric)
        seq_top10 = {i for i, _ in seq[:10]}
        overlap = len(seq_top10 & set(map(int, ids[qi]))) / 10
        if expand_width == 1:
            assert overlap >= 0.9, (qi, overlap)
        else:
            # Wider beam explores a superset; allow small reordering.
            assert overlap >= 0.8, (qi, overlap)


def test_returned_distances_are_exact_and_sorted():
    n, dim = 200, 24
    metric = DistanceMetric.COSINE
    x = make_vectors(n, dim, seed=14)
    q = make_vectors(3, dim, seed=15)
    _, graph = knn_graph(x, m=10, metric=metric)
    dists, ids = StoredSearcher(graph, x, metric).search(q, k=5, ef=32)
    dists, ids = np.asarray(dists), np.asarray(ids)
    assert np.all(np.diff(dists, axis=1) >= -1e-6)
    for qi in range(len(q)):
        for j in range(5):
            if ids[qi, j] < 0:
                continue
            want = host_ref._metric_fn(str(metric))(q[qi], x[ids[qi, j]])
            assert abs(dists[qi, j] - want) < 1e-3


def test_k_larger_than_results():
    """ef >= k enforced; k results returned with -1 padding when pool can't
    fill (tiny disconnected graph)."""
    x = make_vectors(3, 8, seed=16)
    graph = CsrGraph.from_adjacency([[1], [0], []])  # node 2 unreachable
    dists, ids = StoredSearcher(graph, x, DistanceMetric.EUCLIDEAN).search(
        x[:1], k=3, ef=4
    )
    ids = np.asarray(ids)[0]
    assert set(ids[:2].tolist()) == {0, 1}
    assert ids[2] == -1


def test_empty_graph_returns_empty():
    x = np.zeros((0, 8), np.float32)
    graph = CsrGraph.empty(0, 4)
    d, ids = StoredSearcher(graph, np.zeros((1, 8), np.float32), DistanceMetric.COSINE).search(
        np.zeros((2, 8), np.float32), k=5
    )
    assert d.shape == (2, 0) and ids.shape == (2, 0)


def test_single_node_graph():
    x = make_vectors(1, 8, seed=17)
    graph = CsrGraph.from_adjacency([[]])
    d, ids = StoredSearcher(graph, x, DistanceMetric.EUCLIDEAN).search(x, k=1, ef=4)
    assert int(np.asarray(ids)[0, 0]) == 0
    assert float(np.asarray(d)[0, 0]) < 1e-5


def test_promote_width_knob():
    """promote_width caps exact scoring per hop in the sketch gate; wider
    promotion must not lose recall (monotone triage budget; round-3 tuning
    knob for the QPS/recall operating point)."""
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import LeannConfig

    metric = DistanceMetric.EUCLIDEAN
    n, dim = 400, 32
    x = make_vectors(n, dim, seed=33)
    cfg = LeannConfig(metric=metric, m=8, m0=16, reverse_slack=16, wave_size=128,
                      ef_construction=32, sketch_dims=16)
    graph, sketch = build_index_with_sketch(x, cfg)
    s = StoredSearcher(graph, x, metric, sketch=sketch)
    q = make_vectors(16, dim, seed=34)
    _, gt = D.brute_force_topk(q, x, 10, metric)
    gt = np.asarray(gt)

    def recall(ids):
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(len(gt))
        ])

    _, ids_narrow = s.search(q, k=10, ef=32, gate="sketch", promote_width=8)
    _, ids_wide = s.search(q, k=10, ef=32, gate="sketch", promote_width=32)
    r_narrow, r_wide = recall(ids_narrow), recall(ids_wide)
    assert r_wide >= r_narrow - 0.05, (r_narrow, r_wide)
    assert r_wide >= 0.8, r_wide


def test_final_rescore_knob():
    """final_rescore exact-rescores the approximate-queue head once after
    the hop loop (round-5 knob): at a narrow promote_width it must recover
    recall (>= the un-rescored run), never duplicate ids (AQ and pool are
    disjoint by construction), and keep returned distances exact+sorted."""
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import LeannConfig

    metric = DistanceMetric.EUCLIDEAN
    n, dim = 400, 32
    x = make_vectors(n, dim, seed=53)
    cfg = LeannConfig(metric=metric, m=8, m0=16, reverse_slack=16, wave_size=128,
                      ef_construction=32, sketch_dims=16)
    graph, sketch = build_index_with_sketch(x, cfg)
    s = StoredSearcher(graph, x, metric, sketch=sketch)
    q = make_vectors(16, dim, seed=54)
    _, gt = D.brute_force_topk(q, x, 10, metric)
    gt = np.asarray(gt)

    def recall(ids):
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(len(gt))
        ])

    kw = dict(k=10, ef=32, gate="sketch", promote_width=4, max_iters=6)
    _, ids_plain = s.search(q, **kw)
    d_fr, ids_fr = s.search(q, **kw, final_rescore=32)
    assert recall(ids_fr) >= recall(ids_plain) - 1e-9, (
        recall(ids_plain), recall(ids_fr))

    d_fr, ids_fr = np.asarray(d_fr), np.asarray(ids_fr)
    assert np.all(np.diff(d_fr, axis=1) >= -1e-6)
    for qi in range(len(q)):
        valid = ids_fr[qi][ids_fr[qi] >= 0]
        assert len(set(valid.tolist())) == len(valid), (qi, ids_fr[qi])
        for j in range(10):
            if ids_fr[qi, j] < 0:
                continue
            want = host_ref._metric_fn(str(metric))(q[qi], x[ids_fr[qi, j]])
            assert abs(d_fr[qi, j] - want) < 1e-3, (qi, j)


def test_max_iters_knob():
    """max_iters caps hop iterations (the batched loop runs to the slowest
    query's convergence — round-3 QPS/tail-recall knob, CLAUDE.md fact 23).
    A generous cap must match the default; a starved cap degrades recall
    gracefully and still returns valid ids on both gates."""
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import LeannConfig

    metric = DistanceMetric.EUCLIDEAN
    n, dim = 400, 32
    x = make_vectors(n, dim, seed=43)
    cfg = LeannConfig(metric=metric, m=8, m0=16, reverse_slack=16, wave_size=128,
                      ef_construction=32, sketch_dims=16)
    graph, sketch = build_index_with_sketch(x, cfg)
    s = StoredSearcher(graph, x, metric, sketch=sketch)
    q = make_vectors(16, dim, seed=44)
    _, gt = D.brute_force_topk(q, x, 10, metric)
    gt = np.asarray(gt)

    def recall(ids):
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(len(gt))
        ])

    for gate in ("sketch", "exact"):
        _, ids_default = s.search(q, k=10, ef=32, gate=gate)
        _, ids_capped = s.search(q, k=10, ef=32, gate=gate, max_iters=100)
        assert recall(ids_capped) >= recall(ids_default) - 1e-9, gate
        _, ids_starved = s.search(q, k=10, ef=32, gate=gate, max_iters=2)
        ids_starved = np.asarray(ids_starved)
        assert ids_starved.shape == (16, 10)
        valid = ids_starved[ids_starved >= 0]
        assert valid.size > 0 and valid.max() < n, gate


# ---------------------------------------------------------------------------
# Gated-loop mechanism parity (VERDICT r4 weak #6): the AQ/promote/termination
# state machine of both gated device loops must coincide with the sequential
# two-level oracle (host_ref.two_level_gated_search) when fed the SAME exact
# and approximate distances. Recall oracles elsewhere cover the outcome; these
# cover the mechanism (spec Algorithm 2, leann.rs:899-988).
# ---------------------------------------------------------------------------


def _pool_parity(dev_d, dev_i, seq_d, seq_i, qi):
    dev = {int(i): float(d) for d, i in zip(dev_d, dev_i) if np.isfinite(d)}
    seq = {int(i): float(d) for d, i in zip(seq_d, seq_i) if np.isfinite(d)}
    assert set(dev) == set(seq), (
        qi, sorted(set(dev) ^ set(seq)), len(dev), len(seq))
    for i, d in dev.items():
        assert abs(d - seq[i]) <= 1e-4 * max(1.0, abs(d)), (qi, i, d, seq[i])


@pytest.mark.parametrize("expand_width,promote_width", [(1, 4), (2, 8)])
def test_sketch_gated_parity_with_sequential_oracle(expand_width, promote_width):
    """_search_one_sketch_gated pool-set parity vs the sequential oracle:
    same exact distances (stored rows), same calibrated sketch distances
    (nbr_sketch rows are copies of node_sketch rows, ops/proj.py:199), same
    AQ margin (0.5), same fixed widths."""
    import jax.numpy as jnp

    from islands_tpu.core.search import (
        batched_sketch_gated_query, make_stored_scorer)
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.ops import proj as proj_ops

    metric = DistanceMetric.EUCLIDEAN
    n, dim, ef, aq_width, max_iters = 256, 16, 24, 32, 20
    x = make_vectors(n, dim, seed=50)
    q = make_vectors(6, dim, seed=51)
    adjacency, graph = knn_graph(x, m=8, metric=metric)
    xp = dist_ops.prep_corpus(x, metric)
    sketch = proj_ops.build_sketch_index(xp, graph.neighbors, proj_dims=16)

    qp = dist_ops.prep_query(q, metric)
    qs = proj_ops.sketch_query(qp, sketch.w, sketch.scale)
    entry = int(graph.entry_point)
    dev_d, dev_i, dev_nx = batched_sketch_gated_query(
        qp, qs, xp, sketch.scale, graph.neighbors, sketch.nbr_sketch,
        sketch.node_sketch, jnp.asarray([entry], dtype=jnp.int32),
        exact_scorer=make_stored_scorer(metric), metric=metric, dim=dim,
        ef=ef, k=ef, aq_width=aq_width, promote_width=promote_width,
        expand_width=expand_width, max_iters=max_iters,
    )
    dev_d, dev_i = np.asarray(dev_d), np.asarray(dev_i)
    dev_nx = np.asarray(dev_nx)

    raw_all = proj_ops.unpack_raw(sketch.node_sketch)
    for qi in range(len(q)):
        exact_all = np.asarray(
            dist_ops.rowwise_distance(qp[qi], xp, metric))
        approx_all = np.asarray(proj_ops.sketch_distance_calibrated(
            qs[qi], raw_all, metric, sketch.scale, dim))
        seq_d, seq_i, seq_nx = host_ref.two_level_gated_search(
            adjacency, lambda i: float(exact_all[i]),
            lambda i: float(approx_all[i]), entry,
            ef=ef, aq_width=aq_width,
            promote_width=min(promote_width, expand_width * 8),
            expand_width=expand_width, max_iters=max_iters, aq_margin=0.5,
        )
        _pool_parity(dev_d[qi], dev_i[qi], seq_d, seq_i, qi)
        assert int(dev_nx[qi]) == seq_nx, (qi, int(dev_nx[qi]), seq_nx)


@pytest.mark.parametrize("promote_exact", [True, False])
def test_two_level_pq_parity_with_sequential_oracle(promote_exact):
    """_search_one_two_level pool-set parity vs the sequential oracle, both
    promote modes (per-hop exact and pure-ADC + end rescore), fed the same
    ADC tables (pq.gated_block_scorer over whole-corpus codes)."""
    import jax.numpy as jnp

    from islands_tpu.core import pq as pq_mod
    from islands_tpu.core.config import PQConfig
    from islands_tpu.core.search import (
        batched_two_level_search, make_stored_scorer)
    from islands_tpu.ops import distance as dist_ops

    metric = DistanceMetric.EUCLIDEAN
    n, dim, ef, aq_width, max_iters = 256, 16, 24, 32, 20
    expand_width, promote_width = 2, 8
    x = make_vectors(n, dim, seed=52)
    q = make_vectors(6, dim, seed=53)
    adjacency, graph = knn_graph(x, m=8, metric=metric)
    xp = dist_ops.prep_corpus(x, metric)

    # 8x32 codebook: 32^8 cells make same-code node pairs (whose exactly-equal
    # ADC distances would make device/oracle tie-breaks diverge) vanishingly
    # unlikely at n=256, unlike 16^4 = 65536 cells (birthday ~40%).
    pq = pq_mod.ProductQuantizer(PQConfig(
        num_subquantizers=8, num_centroids=32, training_iterations=8, seed=0))
    pq.train(xp)
    codes = pq.encode(xp)
    nbr_codes = pq_mod.build_inline_codes(graph.neighbors, codes)
    prep_fn = pq_mod.gated_prep_for(metric)
    approx_scorer = pq_mod.gated_block_scorer_for(metric)

    qp = dist_ops.prep_query(q, metric)
    entry = int(graph.entry_point)
    dev_d, dev_i, dev_nx = batched_two_level_search(
        qp, xp, nbr_codes, pq.codebook.centroids, graph.neighbors,
        graph.entry_point,
        exact_scorer=make_stored_scorer(metric), approx_scorer=approx_scorer,
        prep_fn=prep_fn, ef=ef, aq_width=aq_width,
        promote_width=promote_width, expand_width=expand_width,
        max_iters=max_iters, promote_exact=promote_exact,
    )
    dev_d, dev_i = np.asarray(dev_d), np.asarray(dev_i)
    dev_nx = np.asarray(dev_nx)

    tables = prep_fn(pq.codebook.centroids, qp)  # [B, S, K]
    all_valid = jnp.ones((n,), dtype=bool)
    for qi in range(len(q)):
        exact_all = np.asarray(
            dist_ops.rowwise_distance(qp[qi], xp, metric))
        approx_all = np.asarray(approx_scorer(
            tables[qi], jnp.asarray(codes, jnp.uint8).reshape(n, -1),
            all_valid))
        seq_d, seq_i, seq_nx = host_ref.two_level_gated_search(
            adjacency, lambda i: float(exact_all[i]),
            lambda i: float(approx_all[i]), entry,
            ef=ef, aq_width=aq_width,
            promote_width=min(promote_width, expand_width * 8),
            expand_width=expand_width, max_iters=max_iters, aq_margin=0.0,
            promote_exact=promote_exact,
        )
        _pool_parity(dev_d[qi], dev_i[qi], seq_d, seq_i, qi)
        assert int(dev_nx[qi]) == seq_nx, (qi, int(dev_nx[qi]), seq_nx)


def test_hop_merge_fused_parity():
    """hop_merge='fused' (the Pallas fused dedup+merge+promote op; XLA
    composition on CPU) must return bit-identical results to the inline
    path — same dedup-first semantics, same merge network, same promote
    split — across gates, promote widths and final_rescore."""
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import LeannConfig

    metric = DistanceMetric.EUCLIDEAN
    n, dim = 400, 32
    x = make_vectors(n, dim, seed=73)
    cfg = LeannConfig(metric=metric, m=8, m0=16, reverse_slack=16,
                      wave_size=128, ef_construction=32, sketch_dims=16)
    graph, sketch = build_index_with_sketch(x, cfg)
    s = StoredSearcher(graph, x, metric, sketch=sketch)
    q = make_vectors(16, dim, seed=74)
    for kw in (
        dict(k=10, ef=32, gate="sketch", promote_width=8),
        dict(k=10, ef=32, gate="sketch", promote_width=16, max_iters=6,
             final_rescore=32),
        dict(k=5, ef=16, gate="sketch", promote_width=4, expand_width=2),
    ):
        d_i, ids_i = s.search(q, **kw, hop_merge="inline")
        d_f, ids_f = s.search(q, **kw, hop_merge="fused")
        np.testing.assert_array_equal(np.asarray(ids_i), np.asarray(ids_f))
        np.testing.assert_allclose(np.asarray(d_i), np.asarray(d_f),
                                   rtol=0, atol=0)
