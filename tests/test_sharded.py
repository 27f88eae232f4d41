"""Sharded archipelago tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
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


# The (8, 1) case is NOT slow-marked (round-4 advisor fix): the default tier
# keeps one sharded build+search recall oracle; the dp-replicated variant
# stays in the slow tier.
@pytest.mark.parametrize(
    "n_shards,n_dp",
    [(8, 1), pytest.param(4, 2, marks=pytest.mark.slow)],
)
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


def test_sharded_config_max_iters_default():
    """LeannConfig.max_search_iters acts as the sharded search default
    (design.md §13); per-call max_iters wins over it."""
    n, dim = 256, 16
    x = make_vectors(n, dim, seed=38)
    q = make_vectors(8, dim, seed=39)
    mesh = make_mesh(n_shards=4, n_dp=1)
    idx = build_sharded(x, small_config(max_search_iters=2), mesh)
    searcher = ArchipelagoSearcher(idx)

    def iters_cached():
        # the executable cache is module-global (shared across searchers);
        # scope to this search's (mesh, k, ef) before reading max_iters out
        return {
            key[6] for key in searcher._cache
            if key[0] is idx.mesh and key[3] == 5 and key[4] == 32
        }

    _, ids = searcher.search(q, k=5, ef=32)
    assert iters_cached() == {2}
    ids = np.asarray(ids)
    assert np.all((ids >= -1) & (ids < n))
    searcher.search(q, k=5, ef=32, max_iters=7)
    assert iters_cached() == {2, 7}


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


def clustered(n, dim, seed=0, n_centers=16, sigma=0.8):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32)
    assign = rng.integers(0, n_centers, size=n)
    return (centers[assign] + sigma * rng.normal(size=(n, dim))).astype(np.float32)


def _recall(ids, tids):
    k = tids.shape[1]
    return np.mean([
        len(set(ids[i].tolist()) & set(tids[i].tolist())) / k
        for i in range(len(ids))
    ])


def test_sharded_sketch_gate_recall():
    """Two-level sketch-gated search per shard matches the exact gate."""
    n, dim, k = 1024, 32, 10
    x = clustered(n, dim, seed=40)
    q = clustered(32, dim, seed=41)
    mesh = make_mesh(n_shards=8, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x, cfg, mesh, with_sketch=True)
    assert idx.has_sketch

    s = ArchipelagoSearcher(idx)
    _, tids = D.brute_force_topk(q, x, k, cfg.metric)
    tids = np.asarray(tids)
    _, ids_e = s.search(q, k=k, ef=64, gate="exact")
    _, ids_s = s.search(q, k=k, ef=64, gate="sketch")
    r_e, r_s = _recall(np.asarray(ids_e), tids), _recall(np.asarray(ids_s), tids)
    # the exact arm routes entries through the sketch (per-query nearest
    # routing node) when the index has sketch state
    assert r_e >= 0.85, (r_s, r_e)
    assert r_s >= 0.85, (r_s, r_e)
    assert r_s >= r_e - 0.05, (r_s, r_e)


def test_sharded_recompute_search():
    """Recompute gate: exact scoring goes through a provider scorer with a
    per-shard ctx (sharded LEANN deployment), not stored rows."""
    from islands_tpu.core.search import make_recompute_scorer

    n, dim, k = 512, 16, 5
    x = clustered(n, dim, seed=42)
    q = clustered(16, dim, seed=43)
    mesh = make_mesh(n_shards=8, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x, cfg, mesh, with_sketch=True)

    # "Recompute" provider: per-shard raw embedding table + an embed_fn that
    # looks rows up (stands in for the encoder; same contract).
    def embed_fn(ctx, ids):
        table = ctx
        return table[jnp.clip(ids, 0, table.shape[0] - 1)]

    scorer = make_recompute_scorer(embed_fn, cfg.metric)
    searcher = ArchipelagoSearcher(
        idx, exact_scorer=scorer, exact_ctx=idx.x_prepped
    )
    _, tids = D.brute_force_topk(q, x, k, cfg.metric)
    _, ids = searcher.search(q, k=k, ef=64, gate="sketch")
    r = _recall(np.asarray(ids), np.asarray(tids))
    assert r >= 0.85, r


@pytest.mark.slow
def test_sharded_extend():
    from islands_tpu.parallel.sharded import extend_sharded

    n0, n1, dim, k = 512, 256, 16, 5
    x = clustered(n0 + n1, dim, seed=44)
    q = clustered(16, dim, seed=45)
    mesh = make_mesh(n_shards=8, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x[:n0], cfg, mesh)
    idx2 = extend_sharded(idx, x[n0:])
    assert idx2.num_vectors == n0 + n1
    # global ids unique and dense
    gids = np.asarray(idx2.gids)
    real = gids[gids >= 0]
    assert len(real) == n0 + n1
    assert len(np.unique(real)) == n0 + n1

    s = ArchipelagoSearcher(idx2)
    _, ids = s.search(q, k=k, ef=64, gate="exact")
    # NOTE: extend assigns new ids densely from the previous max, and the
    # original build places ids in id-range order, so global id == corpus row
    # here; recall is measured against the full corpus.
    _, tids = D.brute_force_topk(q, x, k, cfg.metric)
    r = _recall(np.asarray(ids), np.asarray(tids))
    assert r >= 0.85, r
    assert np.any(np.asarray(ids) >= n0)  # appended region reachable


@pytest.mark.slow
def test_sharded_extend_reuses_executables():
    from islands_tpu.core import build as build_mod
    from islands_tpu.parallel.sharded import extend_sharded

    n0, dim = 512, 16
    x = clustered(n0 + 128, dim, seed=46)
    mesh = make_mesh(n_shards=8, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x[:n0], cfg, mesh)
    idx = extend_sharded(idx, x[n0 : n0 + 64])
    # A second same-shape extend (same bucket sizes) adds no compilations of
    # the shard_map'd wave: the searcher-level jit wrappers are cached per
    # (wave, n_struct) inside extend_sharded... the cheap proxy is total time
    # via the jitted wave_step cache (classic path shares it).
    before = build_mod.wave_step._cache_size()
    idx = extend_sharded(idx, x[n0 + 64 :])
    assert build_mod.wave_step._cache_size() == before


@pytest.mark.slow
def test_sharded_save_load(tmp_path):
    from islands_tpu.parallel.sharded import load_sharded, save_sharded

    n, dim, k = 512, 16, 5
    x = clustered(n, dim, seed=47)
    q = clustered(8, dim, seed=48)
    mesh = make_mesh(n_shards=8, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x, cfg, mesh, with_sketch=True)
    p = tmp_path / "arch.shrd"
    nbytes = save_sharded(idx, p)
    assert p.stat().st_size == nbytes
    idx2 = load_sharded(p, mesh)
    assert idx2.num_vectors == idx.num_vectors
    assert idx2.has_sketch
    d1, i1 = ArchipelagoSearcher(idx).search(q, k=k, ef=48)
    d2, i2 = ArchipelagoSearcher(idx2).search(q, k=k, ef=48)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_sharded_mesh_mismatch_raises(tmp_path):
    from islands_tpu.core.storage import StorageError
    from islands_tpu.parallel.sharded import load_sharded, save_sharded

    x = clustered(256, 16, seed=49)
    mesh8 = make_mesh(n_shards=8, n_dp=1)
    idx = build_sharded(x, small_config(), mesh8)
    p = tmp_path / "arch.shrd"
    save_sharded(idx, p)
    mesh4 = make_mesh(n_shards=4, n_dp=2)
    with pytest.raises(StorageError):
        load_sharded(p, mesh4)


@pytest.mark.slow
def test_multislice_mesh_hierarchical_merge():
    """(slice, shards, dp) mesh: per-slice ICI merge then DCN merge of
    top-k only. Results must equal the flat-mesh search."""
    from islands_tpu.parallel.mesh import make_multislice_mesh

    n, dim, k = 512, 16, 5
    x = clustered(n, dim, seed=50)
    q = clustered(16, dim, seed=51)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)

    mesh_ms = make_multislice_mesh(n_slices=2, shards_per_slice=2, n_dp=2)
    assert mesh_ms.axis_names == ("slice", "shards", "dp")
    idx = build_sharded(x, cfg, mesh_ms, with_sketch=True)
    assert idx.num_shards == 4
    s = ArchipelagoSearcher(idx)
    _, tids = D.brute_force_topk(q, x, k, cfg.metric)
    tids = np.asarray(tids)
    for gate in ("exact", "sketch"):
        _, ids = s.search(q, k=k, ef=64, gate=gate)
        r = _recall(np.asarray(ids), tids)
        assert r >= 0.85, (gate, r)

    # extend works across the slice axis too
    from islands_tpu.parallel.sharded import extend_sharded

    idx2 = extend_sharded(idx, clustered(64, dim, seed=52))
    assert idx2.num_vectors == n + 64
    _, ids = ArchipelagoSearcher(idx2).search(q, k=k, ef=64, gate="exact")
    assert np.all(np.asarray(ids) >= 0)


@pytest.mark.slow
def test_sharded_extend_after_load(tmp_path):
    """save/load must round-trip the construction config so extend keeps
    the graph's m0/slack instead of falling back to defaults."""
    from islands_tpu.parallel.sharded import (
        extend_sharded, load_sharded, save_sharded,
    )

    x = clustered(512 + 64, 16, seed=53)
    mesh = make_mesh(n_shards=8, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x[:512], cfg, mesh)
    p = tmp_path / "a.shrd"
    save_sharded(idx, p)
    idx2 = load_sharded(p, mesh)
    assert idx2.config is not None
    assert idx2.config.m0 == cfg.m0
    idx3 = extend_sharded(idx2, x[512:])
    assert idx3.num_vectors == 512 + 64


def test_sharded_promote_width_knob():
    """promote_width plumbs through the sharded sketch gate (same knob as
    StoredSearcher/LeannIndex); wider promotion must not hurt recall."""
    n, dim, k = 1024, 32, 10
    x = clustered(n, dim, seed=40)
    q = clustered(32, dim, seed=41)
    mesh = make_mesh(n_shards=4, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x, cfg, mesh, with_sketch=True)

    s = ArchipelagoSearcher(idx)
    _, tids = D.brute_force_topk(q, x, k, cfg.metric)
    tids = np.asarray(tids)
    _, ids_n = s.search(q, k=k, ef=64, gate="sketch", max_iters=6)
    _, ids_w = s.search(q, k=k, ef=64, gate="sketch", max_iters=6,
                        promote_width=48)
    r_n = _recall(np.asarray(ids_n), tids)
    r_w = _recall(np.asarray(ids_w), tids)
    assert r_w >= r_n - 0.02, (r_n, r_w)
    assert r_w >= 0.8, r_w


def test_sharded_final_rescore_knob():
    """final_rescore plumbs through the sharded sketch gate (design.md
    §21): one exact rescore of the per-shard AQ head before the
    cross-shard merge. At a narrow promote_width it must recover recall
    (>= the no-fr point), and results stay valid/sorted."""
    n, dim, k = 1024, 32, 10
    x = clustered(n, dim, seed=42)
    q = clustered(32, dim, seed=43)
    mesh = make_mesh(n_shards=4, n_dp=1)
    cfg = small_config(metric=DistanceMetric.EUCLIDEAN)
    idx = build_sharded(x, cfg, mesh, with_sketch=True)

    s = ArchipelagoSearcher(idx)
    _, tids = D.brute_force_topk(q, x, k, cfg.metric)
    tids = np.asarray(tids)
    kw = dict(k=k, ef=64, gate="sketch", max_iters=6, promote_width=8)
    d0, ids0 = s.search(q, **kw)
    d1, ids1 = s.search(q, **kw, final_rescore=32)
    r0 = _recall(np.asarray(ids0), tids)
    r1 = _recall(np.asarray(ids1), tids)
    assert r1 >= r0 - 1e-9, (r0, r1)
    d1, ids1 = np.asarray(d1), np.asarray(ids1)
    assert np.all((ids1 >= 0) & (ids1 < n))
    assert np.all(np.diff(d1, axis=1) >= -1e-5)
    # No duplicate ids within a query's result row (the AQ/pool merge is
    # disjoint by construction, design.md §21).
    for i in range(ids1.shape[0]):
        assert len(set(ids1[i].tolist())) == k
