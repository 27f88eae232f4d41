"""Product-quantization tests.

Mirrors the reference's PQ test strategy (src/core/pq.rs:500-785): encode/
decode shape invariants, reconstruction quality on clustered data, asymmetric
distance vs true distance, ADC-table equivalence, compression-ratio assertion,
and seeded determinism.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from islands_tpu.core.config import ConfigError, PQConfig
from islands_tpu.core.pq import PQError, ProductQuantizer, kmeans
from tests.conftest import make_vectors


def clustered_vectors(n_clusters=8, per_cluster=64, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 5.0
    pts = np.repeat(centers, per_cluster, axis=0)
    pts += rng.standard_normal(pts.shape).astype(np.float32) * 0.1
    return pts


class TestKmeans:
    def test_recovers_clusters(self):
        import jax

        pts = clustered_vectors(n_clusters=4, per_cluster=50, dim=8)
        centroids, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), 4, 25)
        assert centroids.shape == (4, 8)
        assert assign.shape == (200,)
        # Points from the same cluster land in the same k-means cluster.
        a = np.asarray(assign)
        for c in range(4):
            block = a[c * 50 : (c + 1) * 50]
            assert len(set(block.tolist())) == 1
        # Quantization error is tiny relative to cluster spread.
        recon = np.asarray(centroids)[a]
        err = np.mean(np.sum((pts - recon) ** 2, axis=1))
        assert err < 1.0

    def test_more_clusters_than_points_is_usable(self):
        import jax

        pts = make_vectors(8, 4, seed=1)
        centroids, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), 8, 10)
        # Every point should sit on (near) its own centroid.
        recon = np.asarray(centroids)[np.asarray(assign)]
        assert np.allclose(recon, pts, atol=1e-4)


class TestConfig:
    def test_validation(self):
        with pytest.raises(ConfigError):
            PQConfig(num_subquantizers=0).validate(32)
        with pytest.raises(ConfigError):
            PQConfig(num_subquantizers=5).validate(32)  # 32 % 5 != 0
        with pytest.raises(ConfigError):
            PQConfig(num_centroids=0).validate(32)
        PQConfig(num_subquantizers=8).validate(32)

    def test_bytes_per_vector(self):
        # reference: pq.rs:57-64
        assert PQConfig(num_subquantizers=8, num_centroids=256).bytes_per_vector == 8
        assert PQConfig(num_subquantizers=8, num_centroids=257).bytes_per_vector == 16
        assert PQConfig(num_subquantizers=16, num_centroids=16).bytes_per_vector == 16


class TestProductQuantizer:
    @pytest.fixture(scope="class")
    def trained(self):
        x = clustered_vectors(n_clusters=16, per_cluster=32, dim=32, seed=3)
        pq = ProductQuantizer(
            PQConfig(num_subquantizers=4, num_centroids=32, training_iterations=15, seed=0)
        )
        pq.train(jnp.asarray(x))
        return pq, x

    def test_untrained_errors(self):
        pq = ProductQuantizer()
        with pytest.raises(PQError):
            pq.encode(jnp.zeros((4, 32)))
        with pytest.raises(PQError):
            pq.decode(jnp.zeros((4, 8), dtype=jnp.uint8))

    def test_train_requires_enough_vectors(self):
        pq = ProductQuantizer(PQConfig(num_centroids=256))
        with pytest.raises(PQError):
            pq.train(jnp.zeros((10, 32)))

    def test_encode_shapes_and_dtype(self, trained):
        pq, x = trained
        codes = pq.encode(jnp.asarray(x))
        assert codes.shape == (len(x), 4)
        assert codes.dtype == jnp.uint8
        assert int(jnp.max(codes)) < 32
        # single-vector path
        one = pq.encode(jnp.asarray(x[0]))
        assert one.shape == (4,)
        np.testing.assert_array_equal(np.asarray(one), np.asarray(codes[0]))

    def test_dimension_mismatch(self, trained):
        pq, _ = trained
        with pytest.raises(PQError):
            pq.encode(jnp.zeros((2, 64)))

    def test_decode_reconstruction(self, trained):
        pq, x = trained
        codes = pq.encode(jnp.asarray(x))
        recon = np.asarray(pq.decode(codes))
        assert recon.shape == x.shape
        # Clustered data quantizes well: relative error well under 10%.
        rel = np.linalg.norm(recon - x) / np.linalg.norm(x)
        assert rel < 0.1

    def test_asymmetric_distance_close_to_true(self, trained):
        pq, x = trained
        q = x[:8] + 0.05
        codes = pq.encode(jnp.asarray(x))
        ad = np.asarray(pq.asymmetric_distance(jnp.asarray(q), codes))  # [8, n]
        true = np.linalg.norm(q[:, None, :] - x[None, :, :], axis=-1)
        assert ad.shape == true.shape
        assert np.all(ad >= 0.0)
        # Approximation is close in an absolute sense on this scale (~5-norm data)
        assert np.mean(np.abs(ad - true)) < 0.5
        # ... and ranks the true nearest neighbor first for most queries.
        hits = np.mean(np.argmin(ad, axis=1) == np.argmin(true, axis=1))
        assert hits >= 0.5

    def test_table_distance_matches_asymmetric(self, trained):
        pq, x = trained
        q = jnp.asarray(x[:4] + 0.1)
        codes = pq.encode(jnp.asarray(x[:50]))
        tables = pq.build_distance_tables(q)
        assert tables.shape == (4, 4, 32)
        td = np.asarray(pq.table_distance(tables, codes))
        ad = np.asarray(pq.asymmetric_distance(q, codes))
        np.testing.assert_allclose(td, ad, rtol=1e-5, atol=1e-5)

    def test_single_query_single_code_paths(self, trained):
        pq, x = trained
        code = pq.encode(jnp.asarray(x[7]))
        d = pq.asymmetric_distance(jnp.asarray(x[7]), code)
        assert d.shape == ()
        assert float(d) < 0.5  # encoding of itself is near
        t = pq.build_distance_tables(jnp.asarray(x[7]))
        assert t.shape == (4, 32)
        d2 = pq.table_distance(t, code)
        np.testing.assert_allclose(float(d2), float(d), rtol=1e-5)

    def test_determinism(self):
        x = jnp.asarray(clustered_vectors(dim=16, seed=5))
        cfg = PQConfig(num_subquantizers=4, num_centroids=16, training_iterations=8, seed=42)
        a = ProductQuantizer(cfg).train(x)
        b = ProductQuantizer(cfg).train(x)
        np.testing.assert_array_equal(
            np.asarray(a.codebook.centroids), np.asarray(b.codebook.centroids)
        )

    def test_compression_ratio(self):
        # reference asserts 64x for d=128, 8 subquantizers (pq.rs:672-677):
        # 512 raw bytes -> 8 code bytes per vector.
        cfg = PQConfig(num_subquantizers=8, num_centroids=256)
        raw = 128 * 4
        assert raw // cfg.bytes_per_vector == 64

    def test_train_subsampling(self):
        x = jnp.asarray(make_vectors(4096, 16, seed=9))
        pq = ProductQuantizer(
            PQConfig(num_subquantizers=4, num_centroids=16, training_iterations=5, seed=0)
        )
        pq.train(x, max_train_points=512)
        codes = pq.encode(x, chunk=1000)  # exercises chunked encode
        assert codes.shape == (4096, 4)


class TestInlineCodeBlocks:
    """Inline neighbor-code layout + one-hot-matmul ADC for the two-level
    hop (round 4: the count-bound per-candidate code gather was the config-4
    wall; reference ADC semantics: pq.rs:307-348)."""

    def test_build_inline_codes_layout(self):
        rng = np.random.default_rng(3)
        n, m0, s = 32, 5, 8
        codes = rng.integers(0, 256, size=(n, s)).astype(np.uint8)
        neighbors = rng.integers(-1, n, size=(n, m0)).astype(np.int32)
        from islands_tpu.core.pq import build_inline_codes

        blocks = np.asarray(build_inline_codes(jnp.asarray(neighbors),
                                               jnp.asarray(codes)))
        assert blocks.shape == (n, m0 * s)
        assert blocks.dtype == np.uint8
        for i in range(n):
            for j in range(m0):
                nb = neighbors[i, j]
                expect = codes[max(nb, 0)]  # sentinel -> node 0, masked later
                np.testing.assert_array_equal(blocks[i, j * s:(j + 1) * s], expect)

    @pytest.mark.parametrize("metric_name", ["euclidean", "cosine", "dotproduct"])
    def test_block_scorer_matches_table_lookup(self, metric_name):
        rng = np.random.default_rng(11)
        s, k, e = 8, 64, 40
        tables = rng.standard_normal((s, k)).astype(np.float32)
        if metric_name == "euclidean":
            tables = np.abs(tables)  # squared partial distances are >= 0
        codes = rng.integers(0, k, size=(e, s)).astype(np.uint8)
        valid = rng.random(e) < 0.8
        from islands_tpu.core.pq import gated_block_scorer_for

        d = np.asarray(gated_block_scorer_for(metric_name)(
            jnp.asarray(tables), jnp.asarray(codes), jnp.asarray(valid)))

        sums = tables[np.arange(s)[None, :], codes.astype(int)].sum(1)
        if metric_name == "cosine":
            expect = 1.0 + sums
        elif metric_name == "euclidean":
            expect = np.sqrt(np.maximum(sums, 0.0))
        else:
            expect = sums
        # bf16 einsum operands (f32 accumulation): ~0.4%/term rounding.
        np.testing.assert_allclose(d[valid], expect[valid], rtol=3e-2, atol=3e-2)
        assert np.all(np.isinf(d[~valid]))
