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


def two_level_gated_search(
    adjacency: list[list[int]],
    exact_d,
    approx_d,
    entry: int,
    *,
    ef: int,
    aq_width: int,
    promote_width: int,
    expand_width: int,
    max_iters: int,
    aq_margin: float = 0.0,
    promote_exact: bool = True,
) -> tuple[list[float], list[int], int]:
    """Sequential oracle for the gated device loops (`_search_one_sketch_gated`
    and `_search_one_two_level`, core/search.py) — the two-level semantics of
    spec Algorithm 2 (docs/leann-specification.md:223-271; reference hop loop
    leann.rs:899-988) expressed with plain Python data structures so tests can
    assert pool-set parity of the masked fixed-width device state machine.

    Mirrors the device mechanism exactly, per hop:
      1. expand the best `expand_width` unexpanded pool entries;
      2. approximate-score their unseen neighbors (`approx_d(id)`; dedup
         against CURRENT approximate-queue and pool membership only — an id
         dropped from either can be rediscovered, exactly as on device);
      3. merge into the fixed-width approximate queue (capacity `aq_width`);
      4. promote the best `promote_width` AQ entries — exact-scored
         (`exact_d(id)`) when `promote_exact`, else at their approximate
         distance — and merge into the exact pool (capacity `ef`). The AQ
         always advances by `promote_width` regardless of validity.

    Termination matches the device `cond`: continue while the best unexpanded
    pool distance <= the pool's worst, OR the AQ head <=
    worst + aq_margin * (worst - best) — `aq_margin` is 0.5 for the sketch
    gate (JL noise margin, search.py:497-505) and 0.0 for the PQ loop.
    With `promote_exact=False` the final pool is exact-rescored once.

    `exact_d` / `approx_d` map node id -> float. The caller supplies
    `promote_width` already clamped to expand_width * max_degree (the device
    clamp at search.py:476/722). Returns (dists, ids, n_exact) with inf/-1
    padding, ascending.
    """
    inf = float("inf")
    entry = max(int(entry), 0)
    # pool: ascending [d, id, expanded]; padding (inf, -1, True)
    pool = [[exact_d(entry), entry, False]] + [[inf, -1, True]] * (ef - 1)
    aq: list[tuple[float, int]] = [(inf, -1)] * aq_width
    n_exact = 1

    for _ in range(max_iters):
        worst = pool[-1][0]
        best_unexp = min((e[0] for e in pool if not e[2]), default=inf)
        exact_work = best_unexp < inf and best_unexp <= worst
        margin = aq_margin * (worst - pool[0][0]) if aq_margin else 0.0
        aq_work = aq[0][0] < inf and aq[0][0] <= worst + margin
        if not (exact_work or aq_work):
            break

        # Phase 1: expand (pool is sorted, so first-k unexpanded = top_k)
        sel = [e for e in pool if not e[2] and e[0] < inf][:expand_width]
        for e in sel:
            e[2] = True
        pool_ids = {e[1] for e in pool if e[0] < inf}
        aq_ids = {i for d, i in aq if d < inf}
        seen_this_hop: set[int] = set()
        discoveries: list[tuple[float, int]] = []
        for e in sel:
            for nbr in adjacency[e[1]]:
                if nbr in seen_this_hop or nbr in aq_ids or nbr in pool_ids:
                    continue
                seen_this_hop.add(nbr)
                discoveries.append((approx_d(nbr), nbr))

        # Phase 2: AQ merge + promote (AQ advances by promote_width even when
        # fewer than promote_width finite entries exist — device slice
        # semantics, search.py:545-548)
        merged = sorted([e for e in aq if e[0] < inf] + discoveries)
        prom = merged[:promote_width]
        rest = merged[promote_width:promote_width + aq_width]
        aq = rest + [(inf, -1)] * (aq_width - len(rest))

        new_entries = []
        for d_a, i in prom:
            if d_a == inf:
                continue
            if promote_exact:
                new_entries.append([exact_d(i), i, False])
                n_exact += 1
            else:
                new_entries.append([d_a, i, False])
        pool = sorted(pool + new_entries, key=lambda e: e[0])[:ef]

    if not promote_exact:
        for e in pool:
            if e[0] < inf:
                e[0] = exact_d(e[1])
                n_exact += 1
        pool.sort(key=lambda e: e[0])
    return [e[0] for e in pool], [e[1] for e in pool], n_exact


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
