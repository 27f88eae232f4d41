"""Property-based invariants (hypothesis), mirroring the reference's proptest
suites: distance metric axioms (src/core/distance.rs:264-328), graph
structural invariants (leann.rs:1468-1511, hnsw.rs:751-804), PQ encode/decode
shape + non-negativity (pq.rs:737-785), and storage round-trips.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

import jax.numpy as jnp

from islands_tpu.core.build import build_index
from islands_tpu.core.config import DistanceMetric, LeannConfig, PQConfig
from islands_tpu.core.pq import ProductQuantizer
from islands_tpu.core.storage import decode_graph, encode_graph
from islands_tpu.ops import distance as dist_ops

SETTLE = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

finite_vec = lambda d: arrays(
    np.float32, (d,),
    elements=st.floats(-10, 10, width=32, allow_nan=False, allow_infinity=False),
)


class TestDistanceAxioms:
    @SETTLE
    @given(a=finite_vec(16), b=finite_vec(16))
    def test_non_negative_and_symmetric(self, a, b):
        for metric in (DistanceMetric.EUCLIDEAN, DistanceMetric.MANHATTAN,
                       DistanceMetric.COSINE):
            dab = float(dist_ops.distance(jnp.asarray(a), jnp.asarray(b), metric))
            dba = float(dist_ops.distance(jnp.asarray(b), jnp.asarray(a), metric))
            assert dab >= -1e-5
            assert abs(dab - dba) <= 1e-4 * max(abs(dab), 1.0)

    @SETTLE
    @given(a=finite_vec(16))
    def test_identity(self, a):
        for metric in (DistanceMetric.EUCLIDEAN, DistanceMetric.MANHATTAN):
            d = float(dist_ops.distance(jnp.asarray(a), jnp.asarray(a), metric))
            assert abs(d) < 1e-3

    @SETTLE
    @given(a=finite_vec(16), b=finite_vec(16), c=finite_vec(16))
    def test_triangle_inequality_l2(self, a, b, c):
        m = DistanceMetric.EUCLIDEAN
        ab = float(dist_ops.distance(jnp.asarray(a), jnp.asarray(b), m))
        bc = float(dist_ops.distance(jnp.asarray(b), jnp.asarray(c), m))
        ac = float(dist_ops.distance(jnp.asarray(a), jnp.asarray(c), m))
        assert ac <= ab + bc + 1e-3

    @SETTLE
    @given(a=finite_vec(16), b=finite_vec(16))
    def test_cosine_bounds(self, a, b):
        d = float(dist_ops.distance(
            jnp.asarray(a), jnp.asarray(b), DistanceMetric.COSINE
        ))
        assert -1e-5 <= d <= 2.0 + 1e-5

    @SETTLE
    @given(v=finite_vec(16))
    def test_normalize_unit_or_zero(self, v):
        n = np.asarray(dist_ops.normalize(jnp.asarray(v)))
        norm = np.linalg.norm(n)
        assert abs(norm - 1.0) < 1e-4 or norm == 0.0


class TestGraphInvariants:
    @SETTLE
    @given(
        n=st.integers(10, 120),
        d=st.integers(4, 24),
        seed=st.integers(0, 2**16),
    )
    @pytest.mark.slow
    def test_build_structural_invariants(self, n, d, seed):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((n, d)).astype(np.float32)
        cfg = LeannConfig(m=4, m0=8, ef_construction=16, wave_size=32,
                          intra_wave_k=4, reverse_slack=8)
        g = build_index(jnp.asarray(x), cfg)
        assert g.num_nodes == n
        g.validate()  # ids in range, no self-loops, sentinel layout, entry
        degs = np.asarray(g.degrees)
        assert np.all(degs <= cfg.m0)
        # every (non-isolated possible) node reachable as someone's neighbor
        # is not required, but every node must have at least one edge when
        # n > 1 (bidirectional insertion guarantees it)
        if n > 1:
            assert np.all(degs >= 1)


class TestPQInvariants:
    @SETTLE
    @given(
        n=st.integers(40, 150),
        seed=st.integers(0, 2**16),
    )
    @pytest.mark.slow
    def test_encode_decode_shapes_and_nonneg(self, n, seed):
        rng = np.random.default_rng(seed)
        d, sq, k = 16, 4, 16
        x = rng.standard_normal((n, d)).astype(np.float32)
        pq = ProductQuantizer(PQConfig(num_subquantizers=sq, num_centroids=k,
                                       training_iterations=4, seed=0))
        pq.train(jnp.asarray(x))
        codes = pq.encode(jnp.asarray(x))
        assert codes.shape == (n, sq)
        assert int(jnp.max(codes)) < k
        rec = pq.decode(codes)
        assert rec.shape == (n, d)
        dists = np.asarray(pq.asymmetric_distance(jnp.asarray(x[:3]), codes))
        assert np.all(dists >= 0.0)


class TestStorageRoundTrip:
    @SETTLE
    @given(
        n=st.integers(2, 60),
        seed=st.integers(0, 2**16),
    )
    def test_graph_codec_round_trip(self, n, seed):
        rng = np.random.default_rng(seed)
        from islands_tpu.core.csr import CsrGraph

        adj = [
            list(rng.choice([j for j in range(n) if j != i],
                            size=min(int(rng.integers(0, 5)), n - 1),
                            replace=False))
            for i in range(n)
        ]
        levels = rng.integers(0, 3, n).astype(np.int32)
        g = CsrGraph.from_adjacency(adj, levels=levels, max_degree=8)
        g2, metric, dim = decode_graph(encode_graph(g, "euclidean", 7))
        assert dim == 7 and metric == "euclidean"
        np.testing.assert_array_equal(np.asarray(g2.degrees), np.asarray(g.degrees))
        for i in range(n):
            np.testing.assert_array_equal(g2.get_neighbors(i), g.get_neighbors(i))
