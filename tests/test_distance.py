"""Distance kernel tests: exact-value checks against numpy plus the
property-style invariants the reference asserts (src/core/distance.rs:264-328):
non-negativity, symmetry, identity, triangle inequality, cosine bounds."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from islands_tpu.core.config import DistanceMetric
from islands_tpu.ops import distance as D

from conftest import make_vectors

METRICS = list(DistanceMetric)


def np_distance(a, b, metric):
    if metric == DistanceMetric.COSINE:
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 1.0
        return 1.0 - float(a @ b / (na * nb))
    if metric == DistanceMetric.EUCLIDEAN:
        return float(np.linalg.norm(a - b))
    if metric == DistanceMetric.DOT_PRODUCT:
        return float(-(a @ b))
    if metric == DistanceMetric.MANHATTAN:
        return float(np.abs(a - b).sum())


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("dim", [8, 128, 384])
def test_pairwise_matches_numpy(metric, dim):
    q = make_vectors(5, dim, seed=1)
    x = make_vectors(17, dim, seed=2)
    got = np.asarray(D.pairwise_distance(q, x, metric))
    want = np.array([[np_distance(a, b, metric) for b in x] for a in q])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("metric", METRICS)
def test_rowwise_matches_pairwise(metric):
    q = make_vectors(1, 64, seed=3)[0]
    rows = make_vectors(9, 64, seed=4)
    qp = D.prep_query(q[None], metric)[0]
    rp = D.prep_corpus(rows, metric)
    got = np.asarray(D.rowwise_distance(qp, rp, metric))
    want = np.asarray(D.pairwise_distance(q[None], rows, metric))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cosine_zero_vector_is_max_distance():
    # Reference: distance.rs:82-85 — zero vectors get distance 1.0.
    z = np.zeros((1, 16), np.float32)
    v = make_vectors(1, 16, seed=5)
    assert np.asarray(D.pairwise_distance(z, v, DistanceMetric.COSINE))[0, 0] == 1.0
    assert np.asarray(D.pairwise_distance(z, z, DistanceMetric.COSINE))[0, 0] == 1.0


def test_identity_distance_zero():
    v = make_vectors(4, 32, seed=6)
    # Euclidean uses the |q|^2+|x|^2-2qx matmul identity; self-distance picks
    # up sqrt(float32-eps * norm) cancellation noise (~1e-3), harmless for
    # ranking. Manhattan is computed directly and must be exact.
    d = np.asarray(D.pairwise_distance(v, v, DistanceMetric.EUCLIDEAN))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=5e-3)
    d = np.asarray(D.pairwise_distance(v, v, DistanceMetric.MANHATTAN))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
    dcos = np.asarray(D.pairwise_distance(v, v, DistanceMetric.COSINE))
    np.testing.assert_allclose(np.diag(dcos), 0.0, atol=1e-5)


vec = st.lists(st.floats(-1.0, 1.0, width=32), min_size=16, max_size=16)


@settings(max_examples=25, deadline=None)
@given(a=vec, b=vec)
def test_prop_symmetry_nonneg(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    for metric in [DistanceMetric.EUCLIDEAN, DistanceMetric.MANHATTAN, DistanceMetric.COSINE]:
        dab = float(D.distance(a, b, metric))
        dba = float(D.distance(b, a, metric))
        assert abs(dab - dba) < 1e-3
        assert dab >= -1e-5
        if metric == DistanceMetric.COSINE:
            assert -1e-5 <= dab <= 2.0 + 1e-5


@settings(max_examples=15, deadline=None)
@given(a=vec, b=vec, c=vec)
def test_prop_triangle_inequality(a, b, c):
    a, b, c = (np.asarray(v, np.float32) for v in (a, b, c))
    for metric in [DistanceMetric.EUCLIDEAN, DistanceMetric.MANHATTAN]:
        dab = float(D.distance(a, b, metric))
        dbc = float(D.distance(b, c, metric))
        dac = float(D.distance(a, c, metric))
        assert dac <= dab + dbc + 1e-3


def test_normalize_unit_norm():
    v = make_vectors(8, 48, seed=7)
    n = np.asarray(D.normalize(v))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-5)
    z = np.zeros((1, 48), np.float32)
    assert np.all(np.asarray(D.normalize(z)) == 0.0)


def test_brute_force_topk():
    x = make_vectors(200, 32, seed=8)
    q = make_vectors(3, 32, seed=9)
    d, ids = D.brute_force_topk(q, x, k=10, metric=DistanceMetric.EUCLIDEAN, batch=64)
    d, ids = np.asarray(d), np.asarray(ids)
    full = np.asarray(D.pairwise_distance(q, x, DistanceMetric.EUCLIDEAN))
    want_ids = np.argsort(full, axis=1)[:, :10]
    assert np.array_equal(np.sort(ids, axis=1), np.sort(want_ids, axis=1))
    assert np.all(np.diff(d, axis=1) >= -1e-6)
