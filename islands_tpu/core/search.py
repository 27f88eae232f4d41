"""Batched best-first graph search.

TPU-native reformulation of the reference's heap-and-hashset search loop
(src/core/leann.rs:899-988 for the recompute path, src/core/leann.rs:692-749
for the build-time path): data-dependent pops of a BinaryHeap become a
fixed-width sorted candidate pool with per-entry "expanded" flags, the visited
HashSet becomes a dense bitmask, and heap maintenance becomes a sort-merge —
all static shapes inside one `lax.while_loop`, vmapped over the query batch.

Equivalence to the reference's semantics:
- the pool holds the best `ef` entries seen so far (results heap);
- each hop expands the best `expand_width` unexpanded entries (the heap pop —
  expand_width=1 matches the reference exactly; wider beams only add work and
  recall, never lose entries the reference would keep);
- termination when the best unexpanded distance exceeds the worst pooled
  distance (leann.rs:922-928's early break), with a static iteration cap;
- neighbors are marked visited whether or not their distance is computed,
  matching leann.rs:931-944.

Entries evicted from the pool are never expanded; the reference would break
before expanding them anyway (eviction implies distance > worst, and worst is
non-increasing), so the result sets coincide.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from islands_tpu.core.config import DistanceMetric
from islands_tpu.core.csr import SENTINEL, CsrGraph
from islands_tpu.ops import distance as dist_ops

Array = jax.Array
# scorer(q_prepped [d-like], ids [E] int32, valid [E] bool) -> dists [E] f32
Scorer = Callable[[Array, Array, Array], Array]

_INF = jnp.float32(jnp.inf)


def make_stored_scorer(x_prepped: Array, metric: DistanceMetric) -> Scorer:
    """Exact scorer over stored embeddings: gather rows from HBM + one fused
    matvec. `x_prepped` must come from `dist_ops.prep_corpus`."""

    def scorer(q: Array, ids: Array, valid: Array) -> Array:
        rows = x_prepped[jnp.clip(ids, 0, x_prepped.shape[0] - 1)]
        d = dist_ops.rowwise_distance(q, rows, metric)
        return jnp.where(valid, d, _INF)

    return scorer


def make_recompute_scorer(batch_fn, metric: DistanceMetric) -> Scorer:
    """Exact scorer that RECOMPUTES embeddings on the fly via a jittable
    provider function (`EmbeddingProvider.batch_fn()`) — LEANN's core trick
    (reference: provider.compute_embeddings_batch inside the hop,
    leann.rs:946-948). The recompute fuses into the search loop: no host
    round-trip per hop."""

    def scorer(q: Array, ids: Array, valid: Array) -> Array:
        rows = batch_fn(jnp.where(valid, ids, 0).astype(jnp.int32))
        rows = dist_ops.prep_corpus(rows, metric)
        d = dist_ops.rowwise_distance(q, rows, metric)
        return jnp.where(valid, d, _INF)

    return scorer


def make_prune_fn(
    strategy,
    prune_ratio: float,
    ef: int,
    degrees: Array,
    seed: int = 0,
):
    """Candidate-pruning mask applied to unvisited neighbors before exact
    scoring (reference: apply_pruning_strategy, leann.rs:991-1056). Returns
    None when prune_ratio == 0 (score everything, leann.rs:999-1001).

    `prune(ids, keep, pool_count, it) -> keep`:
    - GLOBAL: keep ceil(E*(1 - |R|/ef * prune_ratio)) — prunes harder as the
      result pool fills (leann.rs:1009-1015).
    - LOCAL: keep ceil(E*(1 - prune_ratio)) in candidate order
      (leann.rs:1016-1019).
    - PROPORTIONAL: degree-weighted random accept with expected count
      num_to_keep; falls back to the first candidate if none accepted
      (leann.rs:1020-1055).
    Pruned neighbors remain marked visited, matching the reference's
    visited.insert-at-filter-time (leann.rs:933-937).
    """
    from islands_tpu.core.config import PruningStrategy

    if prune_ratio <= 0.0:
        return None
    n = degrees.shape[0]
    base_key = jax.random.PRNGKey(seed)

    def prune(ids: Array, keep: Array, pool_count: Array, it: Array) -> Array:
        e_valid = jnp.sum(keep.astype(jnp.int32))
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1  # rank among kept
        num_to_keep = jnp.maximum(
            jnp.ceil(e_valid.astype(jnp.float32) * (1.0 - prune_ratio)).astype(jnp.int32),
            1,
        )
        if strategy == PruningStrategy.GLOBAL:
            ratio = pool_count.astype(jnp.float32) / float(ef)
            adj = jnp.ceil(
                e_valid.astype(jnp.float32) * (1.0 - ratio * prune_ratio)
            ).astype(jnp.int32)
            return keep & (pos < jnp.maximum(adj, 1))
        if strategy == PruningStrategy.LOCAL:
            return keep & (pos < num_to_keep)
        # PROPORTIONAL
        deg = jnp.where(keep, degrees[jnp.clip(ids, 0, n - 1)], 0)
        total = jnp.maximum(jnp.sum(deg), 1)
        prob = deg.astype(jnp.float32) / total.astype(jnp.float32)
        u = jax.random.uniform(jax.random.fold_in(base_key, it), keep.shape)
        accept = keep & (u < prob * num_to_keep.astype(jnp.float32))
        acc_pos = jnp.cumsum(accept.astype(jnp.int32)) - 1
        accept = accept & (acc_pos < num_to_keep)
        any_acc = jnp.any(accept)
        first_valid = keep & (pos == 0)
        return jnp.where(any_acc, accept, first_valid)

    return prune


def _dedup_sorted(ids: Array, num_nodes: int) -> tuple[Array, Array]:
    """Sort ids ascending and mask duplicates / sentinels.

    Invalid ids must already be set to `num_nodes` (the dummy slot).
    Returns (sorted_ids, keep_mask)."""
    sorted_ids = jnp.sort(ids)
    prev = jnp.concatenate([jnp.full((1,), -2, dtype=sorted_ids.dtype), sorted_ids[:-1]])
    keep = (sorted_ids < num_nodes) & (sorted_ids != prev)
    return sorted_ids, keep


def _search_one(
    q: Array,
    neighbors: Array,
    entry_point: Array,
    scorer: Scorer,
    ef: int,
    expand_width: int,
    max_iters: int,
    prune_fn=None,
) -> tuple[Array, Array]:
    """Single-query best-first search; vmap over queries for the batch.

    `prune_fn` (optional) masks which unvisited neighbors get scored —
    the recompute-saving strategies of leann.rs:991-1056; pruned neighbors
    still count as visited."""
    n, m = neighbors.shape
    em = expand_width * m

    entry = jnp.maximum(entry_point, 0)
    d_entry = scorer(q, entry[None], jnp.ones((1,), dtype=bool))[0]

    pool_ids = jnp.full((ef,), SENTINEL, dtype=jnp.int32).at[0].set(entry.astype(jnp.int32))
    pool_dists = jnp.full((ef,), _INF).at[0].set(d_entry)
    # Empty slots count as already expanded.
    pool_expanded = jnp.ones((ef,), dtype=bool).at[0].set(False)
    visited = jnp.zeros((n + 1,), dtype=bool).at[entry].set(True)

    def cond(state):
        pool_dists, pool_expanded, *_ , it = state
        unexp = jnp.where(pool_expanded, _INF, pool_dists)
        best_unexp = jnp.min(unexp)
        worst = pool_dists[-1]
        return (best_unexp < _INF) & (best_unexp <= worst) & (it < max_iters)

    def body(state):
        pool_dists, pool_expanded, pool_ids, visited, it = state

        # --- pop: best `expand_width` unexpanded pool entries ---
        unexp = jnp.where(pool_expanded, _INF, pool_dists)
        neg_best, sel_pos = jax.lax.top_k(-unexp, expand_width)
        sel_valid = -neg_best < _INF
        pool_expanded = pool_expanded.at[sel_pos].set(True)
        sel_ids = pool_ids[sel_pos]

        # --- gather neighbor ids [E, M] -> [E*M] ---
        rows = neighbors[jnp.clip(sel_ids, 0, n - 1)]
        nbr_ids = rows.reshape(em)
        nbr_valid = sel_valid[:, None].repeat(m, axis=1).reshape(em) & (nbr_ids != SENTINEL)

        # --- dedup within the hop + visited filter ---
        nbr_ids = jnp.where(nbr_valid, nbr_ids, n)
        sorted_ids, keep = _dedup_sorted(nbr_ids, n)
        keep = keep & ~visited[sorted_ids]
        # Mark visited whether or not scored (reference: leann.rs:933-937).
        visited = visited.at[jnp.where(keep, sorted_ids, n)].set(True)

        if prune_fn is not None:
            pool_count = jnp.sum((pool_dists < _INF).astype(jnp.int32))
            keep = prune_fn(sorted_ids, keep, pool_count, it)

        # --- score ---
        new_dists = scorer(q, sorted_ids, keep)
        new_ids = jnp.where(keep, sorted_ids, SENTINEL).astype(jnp.int32)

        # --- merge into pool: sort (pool ++ new) by distance, keep best ef ---
        all_d = jnp.concatenate([pool_dists, new_dists])
        all_i = jnp.concatenate([pool_ids, new_ids])
        all_e = jnp.concatenate([pool_expanded, ~keep])  # new invalid => expanded
        all_d, all_i, all_e = jax.lax.sort((all_d, all_i, all_e), num_keys=1)
        return (all_d[:ef], all_e[:ef], all_i[:ef], visited, it + 1)

    state = (pool_dists, pool_expanded, pool_ids, visited, jnp.int32(0))
    pool_dists, _, pool_ids, _, _ = jax.lax.while_loop(cond, body, state)
    return pool_dists, pool_ids


def _search_one_two_level(
    q_exact: Array,
    q_tables: Array,
    neighbors: Array,
    entry_point: Array,
    exact_scorer: Scorer,
    approx_scorer: Scorer,
    ef: int,
    aq_width: int,
    promote_width: int,
    expand_width: int,
    max_iters: int,
) -> tuple[Array, Array, Array]:
    """Two-level PQ-gated search (spec Algorithm 2,
    docs/leann-specification.md:223-271) for a single query.

    Neighbors discovered each hop are scored with the cheap approximate
    scorer (PQ-ADC table gather) into a persistent fixed-width Approximate
    Queue; only the best `promote_width` AQ entries per hop are promoted to
    exact scoring (embedding recompute) and merged into the exact pool.

    Returns (pool_dists [ef], pool_ids [ef], n_exact_scored scalar) — the
    last is the recompute-efficiency metric the reference only dead-codes
    (leann.rs:974-981).
    """
    n, m = neighbors.shape
    em = expand_width * m

    entry = jnp.maximum(entry_point, 0)
    d_entry = exact_scorer(q_exact, entry[None], jnp.ones((1,), dtype=bool))[0]

    pool_ids = jnp.full((ef,), SENTINEL, dtype=jnp.int32).at[0].set(entry.astype(jnp.int32))
    pool_dists = jnp.full((ef,), _INF).at[0].set(d_entry)
    pool_expanded = jnp.ones((ef,), dtype=bool).at[0].set(False)
    aq_ids = jnp.full((aq_width,), SENTINEL, dtype=jnp.int32)
    aq_dists = jnp.full((aq_width,), _INF)
    visited = jnp.zeros((n + 1,), dtype=bool).at[entry].set(True)
    n_exact = jnp.int32(1)

    def cond(state):
        pool_dists, pool_expanded, _, aq_dists, *_, it = state
        unexp = jnp.where(pool_expanded, _INF, pool_dists)
        best_unexp = jnp.min(unexp)
        worst = pool_dists[-1]
        # Keep going while there is work in either queue: an unexpanded exact
        # candidate better than the worst pooled, or promotable AQ entries
        # better than the worst pooled (the AQ is this formulation's "C").
        exact_work = (best_unexp < _INF) & (best_unexp <= worst)
        # AQ distances are on the exact metric's scale (see pq.make_gated_scorer),
        # so "could the best approximate candidate improve the pool" is a valid
        # cross-queue comparison.
        aq_work = aq_dists[0] <= worst
        return (exact_work | aq_work) & (it < max_iters)

    def body(state):
        pool_dists, pool_expanded, pool_ids, aq_dists, aq_ids, visited, n_exact, it = state

        # --- Phase 1: expand best unexpanded exact entries, approx-score ---
        unexp = jnp.where(pool_expanded, _INF, pool_dists)
        neg_best, sel_pos = jax.lax.top_k(-unexp, expand_width)
        sel_valid = -neg_best < _INF
        pool_expanded = pool_expanded.at[sel_pos].set(True)
        sel_ids = pool_ids[sel_pos]

        rows = neighbors[jnp.clip(sel_ids, 0, n - 1)]
        nbr_ids = rows.reshape(em)
        nbr_valid = sel_valid[:, None].repeat(m, axis=1).reshape(em) & (nbr_ids != SENTINEL)
        nbr_ids = jnp.where(nbr_valid, nbr_ids, n)
        sorted_ids, keep = _dedup_sorted(nbr_ids, n)
        keep = keep & ~visited[sorted_ids]
        visited = visited.at[jnp.where(keep, sorted_ids, n)].set(True)

        d_approx = approx_scorer(q_tables, sorted_ids, keep)
        new_ids = jnp.where(keep, sorted_ids, SENTINEL).astype(jnp.int32)

        # --- merge into the approximate queue ---
        aq_d = jnp.concatenate([aq_dists, d_approx])
        aq_i = jnp.concatenate([aq_ids, new_ids])
        aq_d, aq_i = jax.lax.sort((aq_d, aq_i), num_keys=1)

        # --- Phase 2: promote best promote_width AQ entries to exact ---
        prom_ids = aq_i[:promote_width]
        prom_valid = aq_d[:promote_width] < _INF
        aq_dists = aq_d[promote_width : promote_width + aq_width]
        aq_ids = aq_i[promote_width : promote_width + aq_width]

        d_exact = exact_scorer(q_exact, jnp.where(prom_valid, prom_ids, 0), prom_valid)
        n_exact = n_exact + jnp.sum(prom_valid.astype(jnp.int32))

        all_d = jnp.concatenate([pool_dists, d_exact])
        all_i = jnp.concatenate([pool_ids, jnp.where(prom_valid, prom_ids, SENTINEL)])
        all_e = jnp.concatenate([pool_expanded, ~prom_valid])
        all_d, all_i, all_e = jax.lax.sort((all_d, all_i, all_e), num_keys=1)
        return (
            all_d[:ef],
            all_e[:ef],
            all_i[:ef],
            aq_dists,
            aq_ids,
            visited,
            n_exact,
            it + 1,
        )

    state = (
        pool_dists, pool_expanded, pool_ids, aq_dists, aq_ids, visited, n_exact,
        jnp.int32(0),
    )
    pool_dists, _, pool_ids, _, _, _, n_exact, _ = jax.lax.while_loop(cond, body, state)
    return pool_dists, pool_ids, n_exact


@functools.partial(
    jax.jit, static_argnames=("scorer", "ef", "k", "expand_width", "max_iters")
)
def beam_search(
    queries_prepped: Array,
    graph: CsrGraph,
    scorer: Scorer,
    ef: int,
    k: int,
    expand_width: int = 4,
    max_iters: int | None = None,
) -> tuple[Array, Array]:
    """Batched graph search: queries [B, d] (already through `prep_query`)
    -> (dists [B, k], ids [B, k]) ascending; unfilled slots are (inf, -1).

    `scorer` must be hashable (use functools.partial or a module-level
    closure factory output bound once per corpus) for jit caching.
    """
    if max_iters is None:
        max_iters = 4 * max(ef // max(expand_width, 1), 1) + 16
    search = functools.partial(
        _search_one,
        neighbors=graph.neighbors,
        entry_point=graph.entry_point,
        scorer=scorer,
        ef=ef,
        expand_width=expand_width,
        max_iters=max_iters,
    )
    pool_dists, pool_ids = jax.vmap(search)(queries_prepped)
    return pool_dists[:, :k], pool_ids[:, :k]


class StoredSearcher:
    """Search handle over a graph + stored embeddings (the reference's
    `Searcher` builder role, src/core/search.rs:106-182, flattened to LEANN's
    single-layer graph with a max-level entry point).

    Holding the prepped corpus and scorer here keeps one jit cache entry per
    (searcher, ef, k, expand_width) instead of recompiling per call.
    """

    def __init__(
        self,
        graph: CsrGraph,
        x: Array,
        metric: DistanceMetric = DistanceMetric.COSINE,
    ):
        self.graph = graph
        self.metric = metric
        self.x_prepped = dist_ops.prep_corpus(x, metric)
        self._scorer = make_stored_scorer(self.x_prepped, metric)

    def search(
        self,
        queries: Array,
        k: int,
        ef: int = 64,
        expand_width: int = 4,
        max_iters: int | None = None,
    ) -> tuple[Array, Array]:
        """queries [B, d] -> (dists [B, k], ids [B, k]). Empty index returns
        empty results (reference: leann.rs:875-877)."""
        if self.graph.num_nodes == 0:
            b = queries.shape[0]
            return jnp.zeros((b, 0), jnp.float32), jnp.zeros((b, 0), jnp.int32)
        ef = max(ef, k)
        qp = dist_ops.prep_query(queries, self.metric)
        return beam_search(
            qp, self.graph, self._scorer, ef=ef, k=k,
            expand_width=expand_width, max_iters=max_iters,
        )


def search_stored(
    queries: Array,
    graph: CsrGraph,
    x: Array,
    k: int,
    ef: int = 64,
    metric: DistanceMetric = DistanceMetric.COSINE,
    expand_width: int = 4,
    max_iters: int | None = None,
) -> tuple[Array, Array]:
    """One-shot exact search over stored embeddings. For repeated queries use
    StoredSearcher (this re-jits per call)."""
    return StoredSearcher(graph, x, metric).search(
        queries, k=k, ef=ef, expand_width=expand_width, max_iters=max_iters
    )
