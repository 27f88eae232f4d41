"""Graph-construction tests.

Correctness criteria (SURVEY.md §7): structural invariants of the built graph
plus recall parity vs brute force — wave-batched insertion is not structurally
identical to the reference's sequential build, so recall is the oracle.
"""

import numpy as np
import pytest

from islands_tpu.core.build import build_index, sample_levels, _prefix_entries
from islands_tpu.core.config import DistanceMetric, LeannConfig
from islands_tpu.core.search import StoredSearcher
from islands_tpu.ops import distance as D

from conftest import make_vectors


def small_config(**kw):
    base = dict(
        m=8, m0=16, ef_construction=48, ef_search=48,
        wave_size=128, intra_wave_k=8, reverse_slack=16,
    )
    base.update(kw)
    return LeannConfig(**base)


def graph_invariants(graph, n, m0):
    nbrs = np.asarray(graph.neighbors)
    degs = np.asarray(graph.degrees)
    assert nbrs.shape == (n, m0)
    assert np.all(degs <= m0)
    for i in range(n):
        row = nbrs[i, : degs[i]]
        # valid ids, no sentinel in the live prefix, sentinel after
        assert np.all((row >= 0) & (row < n)), i
        assert np.all(nbrs[i, degs[i]:] == -1), i
        # no self edges, no duplicates
        assert i not in row, i
        assert len(set(row.tolist())) == len(row), i


# Deliberately NOT slow-marked (round-4 advisor fix): the default tier must
# keep at least one end-to-end recall oracle + the connectivity invariant.
@pytest.mark.parametrize("metric", [DistanceMetric.COSINE, DistanceMetric.EUCLIDEAN])
def test_build_invariants_and_recall(metric):
    n, dim = 600, 32
    x = make_vectors(n, dim, seed=20)
    q = make_vectors(16, dim, seed=21)
    cfg = small_config(metric=metric)
    graph = build_index(x, cfg)
    graph_invariants(graph, n, cfg.m0)

    searcher = StoredSearcher(graph, x, metric)
    _, ids = searcher.search(q, k=10, ef=64)
    _, tids = D.brute_force_topk(q, x, 10, metric)
    ids, tids = np.asarray(ids), np.asarray(tids)
    recall = np.mean([
        len(set(ids[i].tolist()) & set(tids[i].tolist())) / 10 for i in range(len(q))
    ])
    # Reference CI floor is 35% @k=1 (hnsw.rs:848-853); we demand far more.
    assert recall >= 0.85, recall


def test_refine_no_duplicate_edges_at_low_degree():
    """Refine re-scatters reverse edges for nodes whose edges already exist;
    rows that stay at degree <= m0 are never repaired, so without the
    refine-mode contains-mask they kept duplicate neighbor ids (advisor
    round-4 finding). Large m0 relative to n keeps most rows under m0 so
    repair can't hide the bug."""
    n = 220
    x = make_vectors(n, 16, seed=41)
    cfg = small_config(m0=32, reverse_slack=24, refine_passes=1)
    graph = build_index(x, cfg)
    graph_invariants(graph, n, cfg.m0)  # includes per-row duplicate check


@pytest.mark.slow
def test_refine_pass_improves_recall():
    """refine_passes (Vamana-style second pass over the complete graph)
    must preserve every invariant and not lose recall — early insertion
    waves candidate only against the inserted prefix, so the re-selection
    should help (measured: +1.6 recall pts at 4k, +3.5 exact-gate pts at
    131k on-chip)."""
    n, dim = 900, 32
    metric = DistanceMetric.EUCLIDEAN
    x = make_vectors(n, dim, seed=24)
    q = make_vectors(32, dim, seed=25)
    _, tids = D.brute_force_topk(q, x, 10, metric)
    tids = np.asarray(tids)

    def recall_of(graph):
        _, ids = StoredSearcher(graph, x, metric).search(q, k=10, ef=32)
        ids = np.asarray(ids)
        return np.mean([
            len(set(ids[i].tolist()) & set(tids[i].tolist())) / 10
            for i in range(len(q))
        ])

    base = build_index(x, small_config(metric=metric))
    refined = build_index(x, small_config(metric=metric, refine_passes=1))
    graph_invariants(refined, n, 16)
    r0, r1 = recall_of(base), recall_of(refined)
    assert r1 >= r0 - 0.02, (r0, r1)
    assert r1 >= 0.85, r1


def test_build_connectivity():
    """Every node reachable from the entry point (spec
    test_pruning_preserves_connectivity, docs/leann-specification.md:852-864)."""
    n = 400
    x = make_vectors(n, 16, seed=22)
    graph = build_index(x, small_config())
    nbrs = np.asarray(graph.neighbors)
    degs = np.asarray(graph.degrees)
    seen = {int(graph.entry_point)}
    stack = [int(graph.entry_point)]
    while stack:
        u = stack.pop()
        for v in nbrs[u, : degs[u]]:
            v = int(v)
            if v not in seen:
                seen.add(v)
                stack.append(v)
    assert len(seen) >= 0.99 * n, len(seen)


def test_build_small_and_edge_sizes():
    for n in [1, 2, 5, 17]:
        x = make_vectors(n, 8, seed=23 + n)
        cfg = small_config(wave_size=8)
        graph = build_index(x, cfg)
        graph_invariants(graph, n, cfg.m0)
        if n > 1:
            assert int(np.asarray(graph.degrees).min()) >= 1


def test_build_empty():
    graph = build_index(np.zeros((0, 8), np.float32), small_config())
    assert graph.num_nodes == 0


def test_levels_and_entry():
    levels = sample_levels(10000, 1.0 / np.log(30.0), 16, seed=1)
    assert levels.min() >= 0 and levels.max() < 16
    # Geometric-ish: P(level >= 1) = 1/30
    frac = float((levels >= 1).mean())
    assert 0.01 < frac < 0.06, frac
    entries = _prefix_entries(levels)
    max_l, best = -1, 0
    for i in range(len(levels)):
        assert entries[i] == best
        if levels[i] > max_l:
            max_l, best = levels[i], i


@pytest.mark.slow
def test_high_degree_pruning_creates_hub_skew():
    """Hub preservation should skew in-degree: with it on, top-2% in-degree
    mass should be at least as concentrated as with it off (paper Section 5
    rationale; reference leann.rs:751-833)."""
    n = 500
    x = make_vectors(n, 24, seed=29)
    g_on = build_index(x, small_config(high_degree_pruning=True))
    g_off = build_index(x, small_config(high_degree_pruning=False))
    for g in (g_on, g_off):
        graph_invariants(g, n, 16)

    def top2_share(g):
        nbrs, degs = np.asarray(g.neighbors), np.asarray(g.degrees)
        indeg = np.zeros(n)
        for i in range(n):
            for v in nbrs[i, : degs[i]]:
                indeg[v] += 1
        top = np.sort(indeg)[::-1][: max(1, n // 50)]
        return top.sum() / max(indeg.sum(), 1)

    assert top2_share(g_on) >= 0.8 * top2_share(g_off)


def test_small_candidate_width_config_builds():
    """ef_construction + intra_wave_k < m0 must clamp, not crash
    (regression: lax.top_k k > array size at trace time)."""
    import jax.numpy as jnp
    import numpy as np

    from islands_tpu.core.build import build_index
    from islands_tpu.core.config import LeannConfig

    x = np.random.default_rng(3).standard_normal((300, 16)).astype(np.float32)
    cfg = LeannConfig(m=8, m0=24, ef_construction=12, intra_wave_k=4,
                      wave_size=64, reverse_slack=8)
    g = build_index(jnp.asarray(x), cfg)
    assert g.num_nodes == 300
    g.validate()


def test_scatter_reverse_edges_row_branch_matches_element_branch(monkeypatch):
    """The overflow-safe row-scatter branch (buckets where n*bw*p4 exceeds
    int32) must produce identical graph + sketch state to the fast
    element-scatter branch (ADVICE r2: flattened word index overflowed at
    >= ~4M-row buckets and silently dropped sketch updates)."""
    import jax.numpy as jnp

    from islands_tpu.core import build as build_mod
    from islands_tpu.core.csr import SENTINEL

    rng = np.random.default_rng(7)
    n, bw, p4, m0, wavew = 64, 12, 4, 8, 16
    neighbors = jnp.full((n, bw), SENTINEL, dtype=jnp.int32)
    degrees = jnp.zeros((n,), dtype=jnp.int32)
    nbr_sketch = jnp.zeros((n, bw * p4), dtype=jnp.int32)
    node_sketch = jnp.asarray(
        rng.integers(-(2**30), 2**30, size=(n, p4)), dtype=jnp.int32
    )
    sel_ids = jnp.asarray(
        rng.integers(0, n, size=(wavew, m0)), dtype=jnp.int32
    )
    sel_dists = jnp.asarray(rng.random((wavew, m0)), dtype=jnp.float32)
    src = jnp.broadcast_to(
        jnp.arange(wavew, dtype=jnp.int32)[:, None], (wavew, m0)
    )
    edge_valid = jnp.asarray(rng.random((wavew, m0)) < 0.9)

    out_elt = build_mod._scatter_reverse_edges(
        neighbors, degrees, sel_ids, sel_dists, src, edge_valid,
        nbr_sketch, node_sketch,
    )
    monkeypatch.setattr(build_mod, "_FLAT_SCATTER_LIMIT", 1)
    out_row = build_mod._scatter_reverse_edges(
        neighbors, degrees, sel_ids, sel_dists, src, edge_valid,
        nbr_sketch, node_sketch,
    )
    for a, b in zip(out_elt, out_row):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bucket_size_quarter_steps():
    """Structural buckets: pow2 to 2^20, quarter steps above (the 1.25M
    config-5 shard must not pad to 2M — the dead nbr_sketch margin decides
    build feasibility at sketch_dims=48, CLAUDE.md facts 16/33)."""
    from islands_tpu.core.build import _bucket_size

    assert _bucket_size(1) == 512
    assert _bucket_size(513) == 1024
    assert _bucket_size(131072) == 131072
    assert _bucket_size(1_000_000) == 1 << 20
    assert _bucket_size(1 << 20) == 1 << 20
    assert _bucket_size(1_250_000) == 1_310_720  # 1.25 * 2^20
    assert _bucket_size(1_400_000) == 1_572_864  # 1.5 * 2^20
    assert _bucket_size(2_000_000) == 1 << 21
    assert _bucket_size(2_200_000) == 2_621_440  # 1.25 * 2^21
