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


class TestHopMerge:
    """Fused hop-merge op (dedup + AQ merge + promote split) — the XLA
    composition vs a naive numpy oracle, the custom_vmap batching rule, and
    the Pallas kernel itself in interpret mode. Production invariants hold
    throughout: a duplicated id always carries the same distance (the hop
    loop scores each slot from the same sketch row), and AQ ids are
    disjoint from the new discoveries (the _not_in_set masks run first)."""

    @staticmethod
    def _case(rng, e=24, a=16, pw=4, n=1 << 20):
        ids = rng.choice(n, size=e, replace=False).astype(np.int32)
        # duplicate a few ids (same distance) + invalidate a few slots
        ids[3] = ids[0]
        ids[7] = ids[0]
        ids[9] = ids[5]
        d = rng.random(e).astype(np.float32)
        d[3] = d[0]
        d[7] = d[0]
        d[9] = d[5]
        invalid = rng.random(e) < 0.25
        d = np.where(invalid, np.inf, d).astype(np.float32)
        ids = np.where(invalid, n, ids).astype(np.int32)
        na = rng.integers(a // 2, a + 1)
        aqd = np.full(a, np.inf, np.float32)
        aqd[:na] = np.sort(rng.random(na).astype(np.float32))
        aqi = np.full(a, -1, np.int32)
        aqi[:na] = n + 1 + np.arange(na)  # disjoint from new ids
        return d, ids, aqd, aqi

    @staticmethod
    def _oracle(d, ids, aqd, aqi, pw):
        seen, ent = set(), []
        for j in range(len(ids)):
            if np.isinf(d[j]) or ids[j] in seen:
                continue
            seen.add(int(ids[j]))
            ent.append((float(d[j]), int(ids[j])))
        for j in range(len(aqi)):
            if not np.isinf(aqd[j]):
                ent.append((float(aqd[j]), int(aqi[j])))
        ent.sort()
        a = len(aqi)
        full = ent + [(np.inf, -1)] * (pw + a)
        prom = full[:pw]
        aq = full[pw:pw + a]
        return (np.array([p[0] for p in prom], np.float32),
                np.array([p[1] for p in prom], np.int32),
                np.array([p[0] for p in aq], np.float32),
                np.array([p[1] for p in aq], np.int32))

    def _check(self, got, want):
        pd, pi, ad, ai = [np.asarray(g) for g in got]
        wd, wi, wad, wai = want
        np.testing.assert_allclose(pd, wd, rtol=0, atol=0)
        np.testing.assert_allclose(ad, wad, rtol=0, atol=0)
        np.testing.assert_array_equal(pi[~np.isinf(wd)], wi[~np.isinf(wd)])
        np.testing.assert_array_equal(ai[~np.isinf(wad)], wai[~np.isinf(wad)])
        # invalid slots must carry the SENTINEL id
        assert np.all(pi[np.isinf(wd)] == -1)
        assert np.all(ai[np.isinf(wad)] == -1)

    def test_xla_matches_oracle(self, rng):
        from islands_tpu.ops.pallas_kernels import _hop_merge_xla

        for pw in (2, 4, 8):
            d, ids, aqd, aqi = self._case(rng, pw=pw)
            got = _hop_merge_xla(*map(jnp.asarray, (d, ids, aqd, aqi)),
                                 promote_width=pw)
            self._check(got, self._oracle(d, ids, aqd, aqi, pw))

    def test_pallas_interpret_matches_oracle(self, rng):
        from islands_tpu.ops.pallas_kernels import _hop_merge_pallas

        b, pw = 5, 4
        cases = [self._case(rng, pw=pw) for _ in range(b)]
        args = [jnp.asarray(np.stack([c[i] for c in cases]))
                for i in range(4)]
        got = _hop_merge_pallas(*args, promote_width=pw, q_block=8,
                                interpret=True)
        for j, c in enumerate(cases):
            self._check([np.asarray(g)[j] for g in got],
                        self._oracle(*c, pw))

    def test_custom_vmap_batches(self, rng):
        import jax

        from islands_tpu.ops.pallas_kernels import (_hop_merge_xla,
                                                    hop_merge_op_for)

        pw = 4
        cases = [self._case(rng, pw=pw) for _ in range(6)]
        args = [jnp.asarray(np.stack([c[i] for c in cases]))
                for i in range(4)]
        out = jax.vmap(hop_merge_op_for(pw))(*args)
        for j, c in enumerate(cases):
            want = _hop_merge_xla(*map(jnp.asarray, c), promote_width=pw)
            for g, w in zip(out, want):
                np.testing.assert_allclose(np.asarray(g)[j], np.asarray(w),
                                           rtol=0, atol=0)

    def test_pallas_interpret_no_pad(self, rng):
        # aq_width + padded-E already a power of two => pad_between == 0
        # (config-4 shapes: ep 128 + aq 128 = 256) — the kernel must skip
        # the empty concat operand (Mosaic rejects zero-row vectors).
        from islands_tpu.ops.pallas_kernels import _hop_merge_pallas

        b, pw = 3, 4
        cases = [self._case(rng, e=16, a=16, pw=pw) for _ in range(b)]
        args = [jnp.asarray(np.stack([c[i] for c in cases]))
                for i in range(4)]
        got = _hop_merge_pallas(*args, promote_width=pw, q_block=8,
                                interpret=True)
        for j, c in enumerate(cases):
            self._check([np.asarray(g)[j] for g in got],
                        self._oracle(*c, pw))
