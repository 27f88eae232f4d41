"""Sharded archipelago tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from islands_tpu.core.config import DistanceMetric, LeannConfig
from islands_tpu.ops import distance as D
from islands_tpu.parallel.mesh import make_mesh
from islands_tpu.parallel.sharded import ArchipelagoSearcher, build_sharded

from conftest import make_vectors


def small_config(**kw):
    base = dict(
        m=8, m0=16, ef_construction=48, ef_search=48,
        wave_size=128, intra_wave_k=8, reverse_slack=16,
    )
    base.update(kw)
    return LeannConfig(**base)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_shards,n_dp", [(8, 1), (4, 2)])
def test_sharded_build_and_search_recall(n_shards, n_dp):
    n, dim, k = 800, 32, 10
    x = make_vectors(n, dim, seed=30)
    q = make_vectors(16, dim, seed=31)
    mesh = make_mesh(n_shards=n_shards, n_dp=n_dp)
    idx = build_sharded(x, small_config(), mesh)
    assert idx.num_shards == n_shards

    searcher = ArchipelagoSearcher(idx)
    dists, ids = searcher.search(q, k=k, ef=64)
    dists, ids = np.asarray(dists), np.asarray(ids)

    _, tids = D.brute_force_topk(q, x, k, DistanceMetric.COSINE)
    tids = np.asarray(tids)
    recall = np.mean([
        len(set(ids[i].tolist()) & set(tids[i].tolist())) / k for i in range(len(q))
    ])
    # Each ~100-node shard is searched exhaustively-ish at ef=64, so the
    # merged result should be near-exact.
    assert recall >= 0.9, recall
    # global ids must be valid
    assert np.all((ids >= 0) & (ids < n))
    # merged distances ascending
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_sharded_matches_exact_on_tiny_shards():
    """With ef >= shard size, per-shard search is exhaustive, so the merge
    must equal brute force exactly."""
    n, dim, k = 256, 16, 5
    x = make_vectors(n, dim, seed=32)
    q = make_vectors(8, dim, seed=33)
    mesh = make_mesh(n_shards=8, n_dp=1)
    idx = build_sharded(x, small_config(wave_size=32), mesh)
    _, ids = ArchipelagoSearcher(idx).search(q, k=k, ef=64)
    _, tids = D.brute_force_topk(q, x, k, DistanceMetric.COSINE)
    ids, tids = np.asarray(ids), np.asarray(tids)
    for i in range(len(q)):
        assert set(ids[i].tolist()) == set(tids[i].tolist()), i
