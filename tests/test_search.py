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
