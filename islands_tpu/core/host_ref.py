"""Host-side sequential oracle implementations (numpy).

These mirror the reference's sequential semantics (heap-based best-first
search, src/core/leann.rs:692-749/899-988) and exist purely as test oracles
for the batched device kernels — they are NOT the production path. Keeping
them lets tests assert that the masked fixed-shape device loops return the
same result sets as a faithful sequential traversal.
"""

from __future__ import annotations

import heapq

import numpy as np


def _metric_fn(metric: str):
    m = str(metric).split(".")[-1].lower().replace("_", "")
    if m == "cosine" or m == "distancemetric.cosine":
        def f(a, b):
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if na == 0.0 or nb == 0.0:
                return 1.0
            return 1.0 - float(np.dot(a, b) / (na * nb))
        return f
    if m == "euclidean":
        return lambda a, b: float(np.linalg.norm(a - b))
    if m == "dotproduct":
        return lambda a, b: float(-np.dot(a, b))
    if m == "manhattan":
        return lambda a, b: float(np.sum(np.abs(a - b)))
    raise ValueError(f"unknown metric {metric}")


def best_first_search(
    adjacency: list[list[int]],
    x: np.ndarray,
    query: np.ndarray,
    entry: int,
    ef: int,
    metric: str = "cosine",
) -> list[tuple[int, float]]:
    """Sequential best-first search over an adjacency list; returns the result
    set sorted ascending by distance (semantics of leann.rs:899-988 with
    prune_ratio=0: every unvisited neighbor is scored)."""
    dist = _metric_fn(metric)
    d0 = dist(query, x[entry])
    visited = {entry}
    candidates: list[tuple[float, int]] = [(d0, entry)]  # min-heap
    results: list[tuple[float, int]] = [(-d0, entry)]  # max-heap by -d
    while candidates:
        d, node = heapq.heappop(candidates)
        worst = -results[0][0]
        if len(results) >= ef and d > worst:
            break
        for nbr in adjacency[node]:
            if nbr in visited:
                continue
            visited.add(nbr)
            dn = dist(query, x[nbr])
            worst = -results[0][0]
            if len(results) < ef or dn < worst:
                heapq.heappush(candidates, (dn, nbr))
                heapq.heappush(results, (-dn, nbr))
                if len(results) > ef:
                    heapq.heappop(results)
    out = sorted(((-d, i) for d, i in results))
    return [(i, d) for d, i in out]


def brute_force_topk(
    x: np.ndarray, query: np.ndarray, k: int, metric: str = "cosine"
) -> list[tuple[int, float]]:
    dist = _metric_fn(metric)
    ds = [(dist(query, x[i]), i) for i in range(len(x))]
    ds.sort()
    return [(i, d) for d, i in ds[:k]]


def recall(found_ids, true_ids) -> float:
    """recall@k: |found ∩ true| / |true| (reference tests: hnsw.rs:806-854)."""
    true_set = set(int(i) for i in true_ids)
    if not true_set:
        return 1.0
    return len(true_set & set(int(i) for i in found_ids)) / len(true_set)
