"""Projection-sketch tests: pack/unpack round-trip, calibrated-distance
sanity, sketch-gated build + query recall on clustered corpora (the workload
the gate is designed for; the gated query is driven by EXACT distances, so
sketch fidelity only affects promotion order — see
search._search_one_sketch_gated)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from islands_tpu.core.build import build_index_with_sketch
from islands_tpu.core.config import DistanceMetric, LeannConfig
from islands_tpu.core.embedding import InMemoryEmbeddingProvider
from islands_tpu.core.leann import LeannIndex
from islands_tpu.core.search import StoredSearcher
from islands_tpu.ops import distance as dist_ops
from islands_tpu.ops import proj as proj_ops

CFG = dict(
    m=12, m0=24, ef_construction=64, wave_size=256, intra_wave_k=8,
    reverse_slack=12, routing_size=128,
)


def clustered(n, dim, seed=0, n_centers=32, sigma=0.8):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32)
    assign = rng.integers(0, n_centers, size=n)
    return (centers[assign] + sigma * rng.normal(size=(n, dim))).astype(np.float32)


def recall(ids, true_ids):
    k = true_ids.shape[1]
    return float(np.mean([
        len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / k
        for i in range(len(ids))
    ]))


class TestPackUnpack:
    def test_round_trip_int8(self):
        rng = np.random.default_rng(0)
        v = rng.normal(size=(13, 16)).astype(np.float32)
        scale = proj_ops.fit_scale(jnp.asarray(v))
        packed = proj_ops.quantize_pack(jnp.asarray(v), scale)
        assert packed.shape == (13, 4) and packed.dtype == jnp.int32
        raw = proj_ops.unpack_raw(packed)
        expect = np.clip(np.round(v * float(scale)), -127, 127)
        np.testing.assert_array_equal(np.asarray(raw), expect)

    def test_projection_orthonormal(self):
        w = proj_ops.make_projection(64, 16, seed=3)
        gram = np.asarray(jnp.dot(w.T, w))
        np.testing.assert_allclose(gram, np.eye(16), atol=1e-5)

    def test_projection_deterministic(self):
        a = np.asarray(proj_ops.make_projection(32, 8, seed=1))
        b = np.asarray(proj_ops.make_projection(32, 8, seed=1))
        np.testing.assert_array_equal(a, b)

    def test_bad_dims_raise(self):
        with pytest.raises(ValueError):
            proj_ops.make_projection(64, 10)  # not a multiple of 4
        with pytest.raises(ValueError):
            proj_ops.make_projection(8, 16)  # wider than input


class TestCalibratedDistance:
    @pytest.mark.parametrize("metric", [
        DistanceMetric.EUCLIDEAN, DistanceMetric.COSINE, DistanceMetric.DOT_PRODUCT,
    ])
    def test_calibrated_scale_tracks_true_distance(self, metric):
        """sketch_distance_calibrated must land on the true metric's scale
        (unbiased up to JL noise) so the gated search's cross-queue compare
        is meaningful."""
        dim, p = 64, 16
        x = clustered(512, dim, seed=4)
        q = clustered(16, dim, seed=5)
        xp = dist_ops.prep_corpus(jnp.asarray(x), metric)
        qp = dist_ops.prep_query(jnp.asarray(q), metric)
        w = proj_ops.make_projection(dim, p, seed=0)
        proj = jnp.dot(xp, w)
        scale = proj_ops.fit_scale(proj)
        packed = proj_ops.quantize_pack(proj, scale)
        qs = proj_ops.sketch_query(qp, w, scale)
        raw = proj_ops.unpack_raw(packed)
        d_approx = jax.vmap(
            lambda q1: proj_ops.sketch_distance_calibrated(q1, raw, metric, scale, dim)
        )(qs)
        d_true = dist_ops.pairwise_distance(qp, xp, metric)
        # Euclidean/cosine means agree within 30% (quantization adds <1%
        # error — measured; the remaining spread is JL distortion at P=16,
        # which the gated search absorbs via exact rescoring). Dot products
        # of clustered data have too much variance for a mean-ratio test.
        if metric != DistanceMetric.DOT_PRODUCT:
            ratio = float(jnp.mean(jnp.abs(d_approx)) / jnp.mean(jnp.abs(d_true)))
            assert 0.7 < ratio < 1.3, ratio
        # Values correlate (JL noise bounds this well below 1 at P=16; the
        # f32 un-quantized projection measures the same corr, so this tests
        # the packed pipeline end to end, not the projection's information).
        a = np.asarray(d_approx).ravel()
        t = np.asarray(d_true).ravel()
        corr = np.corrcoef(a, t)[0, 1]
        assert corr > 0.4, corr


class TestSketchBuild:
    @pytest.mark.slow
    def test_sketch_build_recall_matches_classic(self):
        metric = DistanceMetric.EUCLIDEAN
        x = jnp.asarray(clustered(2048, 48, seed=1))
        q = jnp.asarray(clustered(64, 48, seed=2))
        _, true_ids = dist_ops.brute_force_topk(q, x, 10, metric)
        true_ids = np.asarray(true_ids)

        recs = {}
        for label, sk_flag in (("sketch", True), ("classic", False)):
            cfg = LeannConfig(metric=metric, sketch_build=sk_flag, **CFG)
            g, sk = build_index_with_sketch(x, cfg)
            g.validate()
            assert sk is not None  # derived even when not built inline
            s = StoredSearcher(g, x, metric)
            _, ids = s.search(q, k=10, ef=96)
            recs[label] = recall(np.asarray(ids), true_ids)
        assert recs["sketch"] >= 0.85, recs
        assert recs["sketch"] >= recs["classic"] - 0.05, recs

    def test_build_returns_aligned_sketch(self):
        metric = DistanceMetric.EUCLIDEAN
        x = jnp.asarray(clustered(1024, 32, seed=3))
        cfg = LeannConfig(metric=metric, **CFG)
        g, sk = build_index_with_sketch(x, cfg)
        p4 = sk.node_sketch.shape[1]
        assert sk.nbr_sketch.shape == (g.num_nodes, g.max_degree * p4)
        # Inline blocks must equal node_sketch rows gathered by neighbor id.
        nbrs = np.asarray(g.neighbors)
        ns = np.asarray(sk.node_sketch)
        inline = np.asarray(sk.nbr_sketch).reshape(g.num_nodes, g.max_degree, p4)
        valid = nbrs >= 0
        np.testing.assert_array_equal(inline[valid], ns[nbrs[valid]])


class TestSketchGatedQuery:
    metric = DistanceMetric.EUCLIDEAN

    @pytest.fixture(scope="class")
    def setup(self):
        x = jnp.asarray(clustered(2048, 48, seed=7))
        q = jnp.asarray(clustered(64, 48, seed=8))
        cfg = LeannConfig(metric=self.metric, **CFG)
        g, sk = build_index_with_sketch(x, cfg)
        _, true_ids = dist_ops.brute_force_topk(q, x, 10, self.metric)
        return x, q, g, sk, np.asarray(true_ids)

    def test_gated_matches_exact_recall(self, setup):
        x, q, g, sk, true_ids = setup
        s = StoredSearcher(g, x, self.metric, sketch=sk)
        _, ids_g = s.search(q, k=10, ef=96)  # auto -> sketch (gated)
        _, ids_e = s.search(q, k=10, ef=96, gate="exact")
        r_g = recall(np.asarray(ids_g), true_ids)
        r_e = recall(np.asarray(ids_e), true_ids)
        assert r_g >= 0.85, (r_g, r_e)
        assert r_g >= r_e - 0.05, (r_g, r_e)

    def test_gated_distances_are_exact(self, setup):
        """Returned distances come from the exact scorer, not the sketch."""
        x, q, g, sk, _ = setup
        s = StoredSearcher(g, x, self.metric, sketch=sk)
        d, ids = s.search(q[:8], k=5, ef=64)
        xp = np.asarray(dist_ops.prep_corpus(x, self.metric))
        qp = np.asarray(dist_ops.prep_query(q[:8], self.metric))
        for i in range(8):
            for j in range(5):
                expect = np.linalg.norm(qp[i] - xp[ids[i, j]])
                assert abs(float(d[i, j]) - expect) < 1e-3

    def test_gate_deterministic(self, setup):
        x, q, g, sk, _ = setup
        s = StoredSearcher(g, x, self.metric, sketch=sk)
        _, a = s.search(q, k=10, ef=64)
        _, b = s.search(q, k=10, ef=64)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_leann_sketch_gate_recompute(self, setup):
        x, q, g, sk, true_ids = setup
        cfg = dataclasses.replace(
            LeannConfig(metric=self.metric, **CFG), sketch_query=True
        )
        idx = LeannIndex(cfg)
        idx.build_from_embeddings(x)
        provider = InMemoryEmbeddingProvider(np.asarray(x))
        _, ids = idx.search(q, k=10, provider=provider, ef=96)  # auto -> sketch
        assert recall(np.asarray(ids), true_ids) >= 0.85
        # Recompute fraction: only promoted candidates get recomputed.
        assert 0.0 < idx.last_recompute_fraction < 0.5
