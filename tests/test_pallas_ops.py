"""Pallas-kernel tests (jnp fallback paths on the CPU test mesh; the TPU
Mosaic paths are driven on hardware by the verify scripts and bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from islands_tpu.core.config import DistanceMetric, PQConfig
from islands_tpu.core.pq import ProductQuantizer, pq_scan
from islands_tpu.ops.pallas_kernels import (
    _adc_scan_jnp,
    adc_scan,
    pairwise_l2,
    pairwise_neg_dot,
)
from tests.conftest import make_vectors


class TestAdcScan:
    def test_matches_reference_semantics(self, rng):
        b, s, k, n = 4, 8, 32, 100
        tables = jnp.asarray(rng.random((b, s, k)).astype(np.float32))
        codes = jnp.asarray(rng.integers(0, k, (n, s)).astype(np.int32))
        out = np.asarray(adc_scan(tables, codes))
        # naive reference
        t = np.asarray(tables)
        c = np.asarray(codes)
        ref = np.zeros((b, n), np.float32)
        for bi in range(b):
            for ni in range(n):
                ref[bi, ni] = sum(t[bi, si, c[ni, si]] for si in range(s))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pq_scan_matches_table_distance(self):
        x = make_vectors(300, 32, seed=2)
        pq = ProductQuantizer(PQConfig(num_subquantizers=4, num_centroids=16,
                                       training_iterations=5, seed=0))
        pq.train(jnp.asarray(x))
        codes = pq.encode(jnp.asarray(x))
        q = jnp.asarray(x[:5] + 0.1)
        d_scan = np.asarray(pq_scan(pq, q, codes, DistanceMetric.EUCLIDEAN))
        tables = pq.build_distance_tables(q)
        d_tab = np.asarray(pq.table_distance(tables, codes))
        np.testing.assert_allclose(d_scan, d_tab, rtol=1e-5, atol=1e-5)


class TestPairwise:
    def test_l2_matches_numpy(self, rng):
        q = rng.standard_normal((16, 24)).astype(np.float32)
        x = rng.standard_normal((50, 24)).astype(np.float32)
        out = np.asarray(pairwise_l2(jnp.asarray(q), jnp.asarray(x)))
        ref = np.linalg.norm(q[:, None, :] - x[None, :, :], axis=-1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        out2 = np.asarray(pairwise_l2(jnp.asarray(q), jnp.asarray(x), squared=True))
        np.testing.assert_allclose(out2, ref**2, rtol=1e-3, atol=1e-3)

    def test_neg_dot(self, rng):
        q = rng.standard_normal((8, 16)).astype(np.float32)
        x = rng.standard_normal((30, 16)).astype(np.float32)
        out = np.asarray(pairwise_neg_dot(jnp.asarray(q), jnp.asarray(x)))
        np.testing.assert_allclose(out, -(q @ x.T), rtol=1e-5, atol=1e-5)
