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

Compilation discipline: scorers are (static function, context pytree) pairs —
`scorer(ctx, q, ids, valid) -> dists` with the corpus/codes/params flowing
through `ctx` as a jit ARGUMENT, never a Python closure. Closing over a device
array would bake it into the executable as a constant, forcing a recompile per
corpus and bloating compile time (measured 75s -> sub-second re-dispatch after
this refactor). Scorer functions are cached per metric so jit's static-arg
hashing sees one stable object per configuration.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from islands_tpu.core.config import DistanceMetric, PruningStrategy
from islands_tpu.core.csr import SENTINEL, CsrGraph
from islands_tpu.ops import distance as dist_ops
from islands_tpu.ops.merge import merge_sorted_with_new, pack_id_expanded

Array = jax.Array
# scorer(ctx, q, ids [E] int32, valid [E] bool) -> dists [E] f32
Scorer = Callable[[Any, Array, Array, Array], Array]

_INF = jnp.float32(jnp.inf)


# ---------------------------------------------------------------------------
# Scorers (static fn + ctx pytree)
# ---------------------------------------------------------------------------


def _stored_scorer(ctx, q: Array, ids: Array, valid: Array, *, metric) -> Array:
    """Exact scorer over stored embeddings: ctx = prepped corpus [N, d]."""
    x = ctx
    rows = x[jnp.clip(ids, 0, x.shape[0] - 1)]
    d = dist_ops.rowwise_distance(q, rows, metric)
    return jnp.where(valid, d, _INF)


_STORED_SCORERS: dict = {}


def make_stored_scorer(metric: DistanceMetric) -> Scorer:
    """Stable (cached) stored-embedding scorer for `metric`. Pass the prepped
    corpus as the search ctx."""
    if metric not in _STORED_SCORERS:
        _STORED_SCORERS[metric] = functools.partial(_stored_scorer, metric=metric)
    return _STORED_SCORERS[metric]


def _recompute_scorer(ctx, q, ids, valid, *, embed_fn, metric) -> Array:
    """Exact scorer that RECOMPUTES embeddings on the fly — LEANN's core trick
    (reference: provider.compute_embeddings_batch inside the hop,
    leann.rs:946-948). ctx = the provider's context pytree; `embed_fn(ctx,
    ids) -> [E, d]` is a static jittable function, so the recompute fuses into
    the search loop with no host round-trip."""
    rows = embed_fn(ctx, jnp.where(valid, ids, 0).astype(jnp.int32))
    rows = dist_ops.prep_corpus(rows, metric)
    d = dist_ops.rowwise_distance(q, rows, metric)
    return jnp.where(valid, d, _INF)


_RECOMPUTE_SCORERS: dict = {}


def make_recompute_scorer(embed_fn, metric: DistanceMetric) -> Scorer:
    """Recompute scorer for (embed_fn, metric); cached so repeat calls hit the
    jit cache. `embed_fn` must itself be stable-hashable (module-level fn or a
    provider-cached partial)."""
    key = (embed_fn, metric)
    if key not in _RECOMPUTE_SCORERS:
        _RECOMPUTE_SCORERS[key] = functools.partial(
            _recompute_scorer, embed_fn=embed_fn, metric=metric
        )
    return _RECOMPUTE_SCORERS[key]


def _run_hops(cond, body, state, max_iters: int, static_iters: bool):
    """Run the hop loop either as a lax.while_loop (early exit when every
    query's queues are exhausted) or as a fixed-trip lax.scan.

    Production rungs run with a binding max_iters cap (CLAUDE.md fact 23:
    the batched while_loop is straggler-bound, so the cap — not
    convergence — decides the trip count). With the cap binding, the
    while_loop's early exit almost never fires, but its batched lowering
    still pays cond evaluation + whole-state select-masking every
    iteration. static_iters=True drops both: the body is a fixed-point
    no-op on converged queries (sel_valid/prom_valid all-False), so
    results match the while form for capped queries; a query the while
    cond would have stopped early keeps hopping and can only merge equal
    or better candidates into its pool (recall >= the while form).
    """
    if static_iters:
        state, _ = jax.lax.scan(lambda s, _: (body(s), None), state, None,
                                length=max_iters)
        return state
    return jax.lax.while_loop(cond, body, state)


# ---------------------------------------------------------------------------
# Pruning strategies (reference: apply_pruning_strategy, leann.rs:991-1056)
# ---------------------------------------------------------------------------


def _prune_mask(
    degrees: Array,
    ids: Array,
    keep: Array,
    pool_count: Array,
    it: Array,
    salt: Array,
    *,
    strategy: PruningStrategy,
    prune_ratio: float,
    ef: int,
    seed: int,
) -> Array:
    e_valid = jnp.sum(keep.astype(jnp.int32))
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1  # rank among kept
    num_to_keep = jnp.maximum(
        jnp.ceil(e_valid.astype(jnp.float32) * (1.0 - prune_ratio)).astype(jnp.int32),
        1,
    )
    if strategy == PruningStrategy.GLOBAL:
        # Prunes harder as the result pool fills (leann.rs:1009-1015).
        ratio = pool_count.astype(jnp.float32) / float(ef)
        adj = jnp.ceil(
            e_valid.astype(jnp.float32) * (1.0 - ratio * prune_ratio)
        ).astype(jnp.int32)
        return keep & (pos < jnp.maximum(adj, 1))
    if strategy == PruningStrategy.LOCAL:
        # First N in candidate order (leann.rs:1016-1019).
        return keep & (pos < num_to_keep)
    # PROPORTIONAL: degree-weighted random accept, expected count num_to_keep,
    # fall back to the first candidate if none accepted (leann.rs:1020-1055).
    n = degrees.shape[0]
    deg = jnp.where(keep, degrees[jnp.clip(ids, 0, n - 1)], 0)
    total = jnp.maximum(jnp.sum(deg), 1)
    prob = deg.astype(jnp.float32) / total.astype(jnp.float32)
    # Fold a per-query salt in so vmapped queries draw independent uniforms
    # (a static key would prune the same slots for every query; round 1 used
    # ids[0], which collides whenever two queries' hops share their first
    # sorted candidate — the salt is derived from the query vector itself).
    u = jax.random.uniform(
        jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), it), salt
        ),
        keep.shape,
    )
    accept = keep & (u < prob * num_to_keep.astype(jnp.float32))
    acc_pos = jnp.cumsum(accept.astype(jnp.int32)) - 1
    accept = accept & (acc_pos < num_to_keep)
    any_acc = jnp.any(accept)
    first_valid = keep & (pos == 0)
    return jnp.where(any_acc, accept, first_valid)


_PRUNE_FNS: dict = {}


def make_prune_fn(
    strategy: PruningStrategy, prune_ratio: float, ef: int, seed: int = 0
):
    """Cached pruning mask fn
    `(degrees, ids, keep, pool_count, it, salt) -> keep`;
    None when prune_ratio == 0 (score everything, leann.rs:999-1001). Pruned
    neighbors remain marked visited (leann.rs:933-937)."""
    if prune_ratio <= 0.0:
        return None
    key = (strategy, prune_ratio, ef, seed)
    if key not in _PRUNE_FNS:
        _PRUNE_FNS[key] = functools.partial(
            _prune_mask, strategy=strategy, prune_ratio=prune_ratio, ef=ef,
            seed=seed,
        )
    return _PRUNE_FNS[key]


# ---------------------------------------------------------------------------
# Core loop
# ---------------------------------------------------------------------------


def _dedup_sorted(ids: Array, num_nodes: int) -> tuple[Array, Array]:
    """Sort ids ascending and mask duplicates / sentinels.

    Invalid ids must already be set to `num_nodes` (the dummy slot).
    Returns (sorted_ids, keep_mask)."""
    sorted_ids = jnp.sort(ids)
    prev = jnp.concatenate([jnp.full((1,), -2, dtype=sorted_ids.dtype), sorted_ids[:-1]])
    keep = (sorted_ids < num_nodes) & (sorted_ids != prev)
    return sorted_ids, keep


def _not_in_set(ids: Array, member_ids: Array) -> Array:
    """Mask of ids NOT present in member_ids (SENTINEL entries never match).

    This replaces the reference's visited HashSet (leann.rs:931-937). A dense
    visited bitmask needs one scattered write per discovered neighbor, and
    TPU scatters execute element-serialized (~60 ms/hop at batch 4096 — the
    measured bottleneck of the whole engine). Correctness without it: pool
    eviction is monotone (the worst pooled distance only decreases), so a
    node dropped from the pool can never re-qualify; membership against the
    CURRENT pool alone prevents duplicates, and re-scored rejects cost
    nothing extra because the fixed-shape hop scores all E slots regardless.

    Implementation is a dense [E, P] equality matrix on the VPU — measured
    +0.04s per 40 hops at batch 4096 vs +60ms/hop for the scatter, and
    `jnp.searchsorted` (binary-search lowering) is far slower than either.
    """
    eq = ids[:, None] == member_ids[None, :]
    return ~jnp.any(eq, axis=1)


def _search_one(
    q: Array,
    ctx,
    neighbors: Array,
    entry_point: Array,
    degrees: Array | None = None,
    *,
    scorer: Scorer,
    ef: int,
    expand_width: int,
    max_iters: int,
    prune_fn=None,
) -> tuple[Array, Array]:
    """Single-query best-first search; vmap over queries for the batch.

    `prune_fn` (optional) masks which unvisited neighbors get scored —
    the recompute-saving strategies of leann.rs:991-1056."""
    n, m = neighbors.shape
    em = expand_width * m
    if degrees is None:
        degrees = jnp.zeros((n,), dtype=jnp.int32)

    entry = jnp.maximum(entry_point, 0)
    d_entry = scorer(ctx, q, entry[None], jnp.ones((1,), dtype=bool))[0]
    # Per-query PRNG salt for the proportional pruning strategy (vmapped
    # queries must draw independent accept masks).
    salt = jax.lax.bitcast_convert_type(q[0], jnp.int32)

    # Pool entries carry (id, expanded) packed into one int32 code so the
    # hop merge moves 2 sort operands, not 3 (ops/merge.pack_id_expanded);
    # empty slots pack to -1 (SENTINEL id + expanded).
    pool_code = jnp.full((ef,), -1, dtype=jnp.int32).at[0].set(
        pack_id_expanded(entry.astype(jnp.int32), jnp.zeros((), bool))
    )
    pool_dists = jnp.full((ef,), _INF).at[0].set(d_entry)

    def cond(state):
        pool_dists, pool_code, it = state
        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        best_unexp = jnp.min(unexp)
        worst = pool_dists[-1]
        return (best_unexp < _INF) & (best_unexp <= worst) & (it < max_iters)

    def body(state):
        pool_dists, pool_code, it = state

        # --- pop: best `expand_width` unexpanded pool entries ---
        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        neg_best, sel_pos = jax.lax.top_k(-unexp, expand_width)
        sel_valid = -neg_best < _INF
        pool_code = pool_code.at[sel_pos].set(
            pool_code[sel_pos] | 1, unique_indices=True
        )
        sel_ids = pool_code[sel_pos] >> 1

        # --- gather neighbor ids [E, M] -> [E*M] ---
        rows = neighbors[jnp.clip(sel_ids, 0, n - 1)]
        nbr_ids = rows.reshape(em)
        nbr_valid = sel_valid[:, None].repeat(m, axis=1).reshape(em) & (nbr_ids != SENTINEL)

        # --- dedup within the hop + against the pool (scatter-free visited;
        # see _not_in_set) ---
        nbr_ids = jnp.where(nbr_valid, nbr_ids, n)
        sorted_ids, keep = _dedup_sorted(nbr_ids, n)
        keep = keep & _not_in_set(sorted_ids, pool_code >> 1)

        if prune_fn is not None:
            pool_count = jnp.sum((pool_dists < _INF).astype(jnp.int32))
            keep = prune_fn(degrees, sorted_ids, keep, pool_count, it, salt)

        # --- score ---
        new_dists = scorer(ctx, q, sorted_ids, keep)
        new_code = pack_id_expanded(
            jnp.where(keep, sorted_ids, SENTINEL).astype(jnp.int32), ~keep
        )

        # --- merge into pool: bitonic merge of the sorted pool with the
        # hop's discoveries (ops/merge.merge_sorted_with_new — replaces the
        # full lax.sort network over ef+em, round-2 profiling's largest
        # per-hop cost), keep best ef ---
        all_d, all_code = merge_sorted_with_new(
            pool_dists, pool_code, new_dists, new_code
        )
        return (all_d[:ef], all_code[:ef], it + 1)

    state = (pool_dists, pool_code, jnp.int32(0))
    pool_dists, pool_code, _ = jax.lax.while_loop(cond, body, state)
    return pool_dists, pool_code >> 1


def _search_one_sketch(
    qs: Array,
    neighbors: Array,
    nbr_sketch: Array,
    node_sketch: Array,
    entry_point: Array,
    *,
    metric: DistanceMetric,
    ef: int,
    expand_width: int,
    max_iters: int,
) -> tuple[Array, Array]:
    """Best-first search driven entirely by inline neighbor sketches.

    The hop gathers `expand_width` contiguous [BW, P/4] sketch blocks (one per
    expanded node) instead of `expand_width * BW` scattered embedding rows —
    the count-bound-gather fix (see ops/proj.py). Pool distances are
    approximate; callers exact-rescore the final pool (build: once per wave;
    query: once per batch). Loop structure otherwise matches `_search_one`
    (reference semantics: leann.rs:899-988).
    """
    from islands_tpu.ops import proj as proj_ops

    n, m = neighbors.shape
    em = expand_width * m

    entry = jnp.maximum(entry_point, 0)
    entry_raw = proj_ops.unpack_raw(node_sketch[entry])
    d_entry = proj_ops.sketch_distance(qs, entry_raw, metric)

    # (id, expanded) packed codes; see _search_one.
    pool_code = jnp.full((ef,), -1, dtype=jnp.int32).at[0].set(
        pack_id_expanded(entry.astype(jnp.int32), jnp.zeros((), bool))
    )
    pool_dists = jnp.full((ef,), _INF).at[0].set(d_entry)

    def cond(state):
        pool_dists, pool_code, it = state
        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        best_unexp = jnp.min(unexp)
        worst = pool_dists[-1]
        return (best_unexp < _INF) & (best_unexp <= worst) & (it < max_iters)

    def body(state):
        pool_dists, pool_code, it = state

        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        neg_best, sel_pos = jax.lax.top_k(-unexp, expand_width)
        sel_valid = -neg_best < _INF
        pool_code = pool_code.at[sel_pos].set(
            pool_code[sel_pos] | 1, unique_indices=True
        )
        sel_ids = pool_code[sel_pos] >> 1

        safe = jnp.clip(sel_ids, 0, n - 1)
        rows = neighbors[safe]                       # [E, M] ids
        blocks = nbr_sketch[safe]                    # [E, M*P/4] inline sketches
        nbr_ids = rows.reshape(em)
        nbr_valid = sel_valid[:, None].repeat(m, axis=1).reshape(em) & (nbr_ids != SENTINEL)

        raw = proj_ops.unpack_raw(blocks.reshape(em, -1))
        d = proj_ops.sketch_distance(qs, raw, metric)
        d = jnp.where(nbr_valid, d, _INF)
        nbr_ids = jnp.where(nbr_valid, nbr_ids, n)

        # Dedup by id carrying the (identical-per-id) sketch distances, then
        # scatter-free visited check against the pool (see _not_in_set).
        sorted_ids, d = jax.lax.sort((nbr_ids, d), num_keys=1)
        prev = jnp.concatenate(
            [jnp.full((1,), -2, dtype=sorted_ids.dtype), sorted_ids[:-1]]
        )
        keep = (sorted_ids < n) & (sorted_ids != prev)
        keep = keep & _not_in_set(sorted_ids, pool_code >> 1)

        new_dists = jnp.where(keep, d, _INF)
        new_code = pack_id_expanded(
            jnp.where(keep, sorted_ids, SENTINEL).astype(jnp.int32), ~keep
        )

        # Bitonic merge of sorted pool + hop discoveries (ops/merge).
        all_d, all_code = merge_sorted_with_new(
            pool_dists, pool_code, new_dists, new_code
        )
        return (all_d[:ef], all_code[:ef], it + 1)

    state = (pool_dists, pool_code, jnp.int32(0))
    pool_dists, pool_code, _ = jax.lax.while_loop(cond, body, state)
    return pool_dists, pool_code >> 1


@functools.partial(
    jax.jit,
    static_argnames=("metric", "ef", "expand_width", "max_iters"),
)
def batched_sketch_search(
    qs: Array,
    neighbors: Array,
    nbr_sketch: Array,
    node_sketch: Array,
    entry_point: Array,
    *,
    metric: DistanceMetric,
    ef: int,
    expand_width: int = 4,
    max_iters: int = 100,
) -> tuple[Array, Array]:
    """qs [B, P] scaled query sketches -> (approx dists [B, ef], ids [B, ef]).
    `entry_point` scalar (shared) or [B] (per-query, e.g. from route_entries)."""
    search = functools.partial(
        _search_one_sketch,
        neighbors=neighbors,
        nbr_sketch=nbr_sketch,
        node_sketch=node_sketch,
        metric=metric,
        ef=ef,
        expand_width=expand_width,
        max_iters=max_iters,
    )
    if jnp.ndim(entry_point) == 0:
        return jax.vmap(lambda q: search(q, entry_point=entry_point))(qs)
    return jax.vmap(lambda q, e: search(q, entry_point=e))(qs, entry_point)


def _search_one_sketch_gated(
    q: Array,
    qs: Array,
    exact_ctx,
    scale: Array,
    neighbors: Array,
    nbr_sketch: Array,
    node_sketch: Array,
    entry_point: Array,
    *,
    exact_scorer: Scorer,
    metric: DistanceMetric,
    dim: int,
    ef: int,
    aq_width: int,
    promote_width: int,
    expand_width: int,
    max_iters: int,
    static_iters: bool = False,
    final_rescore: int = 0,
    hop_merge: str = "inline",
) -> tuple[Array, Array, Array]:
    """Two-level sketch-gated search for a single query (spec Algorithm 2,
    docs/leann-specification.md:223-271, with the inline-neighbor sketch as
    the approximate level instead of PQ-ADC).

    Each hop expands the best exact-pool entries, fetches their inline
    sketch blocks (expand_width contiguous reads), and merges
    calibrated-scale sketch distances into a persistent Approximate Queue;
    only the best `promote_width` AQ entries per hop get exact scoring
    (stored-row gather or embedding recompute via `exact_ctx`). The pool —
    and therefore navigation and termination — is driven by EXACT distances,
    so sketch noise only costs extra promotions, never wrong results in the
    pool. Per-hop triage (top promote_width of ~expand*M neighbors) needs
    far less sketch fidelity than global ranking, which is why this is the
    query-time configuration while the pure-sketch pool (_search_one_sketch)
    is reserved for construction, where the wave pipeline exact-rescores and
    re-prunes everything downstream anyway.

    Returns (pool_dists [ef], pool_ids [ef], n_exact_scored).
    """
    from islands_tpu.ops import proj as proj_ops

    n, m = neighbors.shape
    em = expand_width * m
    # A hop discovers at most em candidates; a wider promote window would
    # shrink the AQ slice below aq_width and break the while_loop carry.
    promote_width = min(promote_width, em)

    entry = jnp.maximum(entry_point, 0)
    d_entry = exact_scorer(exact_ctx, q, entry[None], jnp.ones((1,), dtype=bool))[0]

    # (id, expanded) packed codes; see _search_one. AQ entries have no
    # expanded flag, so the AQ aux operand is the bare id.
    pool_code = jnp.full((ef,), -1, dtype=jnp.int32).at[0].set(
        pack_id_expanded(entry.astype(jnp.int32), jnp.zeros((), bool))
    )
    pool_dists = jnp.full((ef,), _INF).at[0].set(d_entry)
    aq_ids = jnp.full((aq_width,), SENTINEL, dtype=jnp.int32)
    aq_dists = jnp.full((aq_width,), _INF)
    n_exact = jnp.int32(1)

    def cond(state):
        pool_dists, pool_code, aq_dists, *_, it = state
        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        best_unexp = jnp.min(unexp)
        worst = pool_dists[-1]
        exact_work = (best_unexp < _INF) & (best_unexp <= worst)
        # AQ distances are calibrated to the exact metric's scale
        # (proj.sketch_distance_calibrated) but carry JL + quantization
        # noise; terminating the moment the AQ head exceeds the worst pooled
        # distance would drop true neighbors whose sketches overestimate.
        # Keep going while the head is within half the pool's spread — a
        # scale-free noise margin (measured +recall at 1M, a few extra hops).
        margin = 0.5 * (worst - pool_dists[0])
        aq_work = (aq_dists[0] < _INF) & (aq_dists[0] <= worst + margin)
        return (exact_work | aq_work) & (it < max_iters)

    def body(state):
        pool_dists, pool_code, aq_dists, aq_ids, n_exact, it = state

        # --- Phase 1: expand, fetch inline sketch blocks, approx-score ---
        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        neg_best, sel_pos = jax.lax.top_k(-unexp, expand_width)
        sel_valid = -neg_best < _INF
        pool_code = pool_code.at[sel_pos].set(
            pool_code[sel_pos] | 1, unique_indices=True
        )
        sel_ids = pool_code[sel_pos] >> 1

        safe = jnp.clip(sel_ids, 0, n - 1)
        rows = neighbors[safe]
        blocks = nbr_sketch[safe]                    # [E, M*P/4]
        nbr_ids = rows.reshape(em)
        nbr_valid = sel_valid[:, None].repeat(m, axis=1).reshape(em) & (nbr_ids != SENTINEL)

        raw = proj_ops.unpack_raw(blocks.reshape(em, -1))
        d_approx = proj_ops.sketch_distance_calibrated(qs, raw, metric, scale, dim)
        d_approx = jnp.where(nbr_valid, d_approx, _INF)
        nbr_ids = jnp.where(nbr_valid, nbr_ids, n)

        if hop_merge == "fused":
            # Fused dedup + AQ merge + promote split (ops/pallas_kernels.
            # hop_merge_op_for): membership dedup vs AQ/pool stays out here
            # (order-free equality matrices); the id-sort dedup, descending
            # pre-sort, bitonic AQ merge and promote split all run in one
            # VMEM-resident Pallas program per query block when batched.
            from islands_tpu.ops.pallas_kernels import hop_merge_op_for

            keep = (nbr_ids < n) & _not_in_set(nbr_ids, aq_ids)
            keep = keep & _not_in_set(nbr_ids, pool_code >> 1)
            nd = jnp.where(keep, d_approx, _INF)
            ni = jnp.where(keep, nbr_ids, n).astype(jnp.int32)
            prom_d, prom_ids, aq_dists, aq_ids = hop_merge_op_for(
                promote_width)(nd, ni, aq_dists, aq_ids)
            prom_valid = prom_d < _INF
        else:
            sorted_ids, d_approx = jax.lax.sort(
                (nbr_ids, d_approx), num_keys=1)
            prev = jnp.concatenate(
                [jnp.full((1,), -2, dtype=sorted_ids.dtype), sorted_ids[:-1]]
            )
            keep = (sorted_ids < n) & (sorted_ids != prev)
            keep = keep & _not_in_set(sorted_ids, aq_ids)
            keep = keep & _not_in_set(sorted_ids, pool_code >> 1)

            new_ids = jnp.where(keep, sorted_ids, SENTINEL).astype(jnp.int32)
            new_d = jnp.where(keep, d_approx, _INF)

            # --- bitonic-merge into the approximate queue (ops/merge) ---
            aq_d, aq_i = merge_sorted_with_new(
                aq_dists, aq_ids, new_d, new_ids)

            # --- Phase 2: promote best promote_width AQ entries to exact --
            prom_ids = aq_i[:promote_width]
            prom_valid = aq_d[:promote_width] < _INF
            aq_dists = aq_d[promote_width : promote_width + aq_width]
            aq_ids = aq_i[promote_width : promote_width + aq_width]

        d_exact = exact_scorer(
            exact_ctx, q, jnp.where(prom_valid, prom_ids, 0), prom_valid
        )
        n_exact = n_exact + jnp.sum(prom_valid.astype(jnp.int32))

        prom_code = pack_id_expanded(
            jnp.where(prom_valid, prom_ids, SENTINEL), ~prom_valid
        )
        all_d, all_code = merge_sorted_with_new(
            pool_dists, pool_code, d_exact, prom_code
        )
        return (all_d[:ef], all_code[:ef], aq_dists, aq_ids, n_exact, it + 1)

    state = (pool_dists, pool_code, aq_dists, aq_ids, n_exact, jnp.int32(0))
    pool_dists, pool_code, aq_dists, aq_ids, n_exact, _ = _run_hops(
        cond, body, state, max_iters, static_iters)
    if final_rescore > 0:
        # One end-of-loop exact rescore of the AQ head: true neighbors a
        # narrow promote_width left stranded in the approximate queue merge
        # into the pool once, for one extra exact batch per QUERY instead
        # of per hop (the ablation's exact-gather term, design.md §20, is
        # per-hop×promote_width; this is the recall-recovery half of the
        # narrow-promote trade). Unlike end_rerank (fact 34 — pure-ADC
        # NAVIGATION loses the walk), hops here stay exact-driven.
        fr = min(final_rescore, aq_width)
        fr_ids = aq_ids[:fr]
        fr_valid = aq_dists[:fr] < _INF
        d_fr = exact_scorer(exact_ctx, q, jnp.where(fr_valid, fr_ids, 0),
                            fr_valid)
        n_exact = n_exact + jnp.sum(fr_valid.astype(jnp.int32))
        fr_code = pack_id_expanded(
            jnp.where(fr_valid, fr_ids, SENTINEL), ~fr_valid)
        all_d, all_code = merge_sorted_with_new(
            pool_dists, pool_code, d_fr, fr_code)
        pool_dists, pool_code = all_d[:ef], all_code[:ef]
    return pool_dists, pool_code >> 1, n_exact


@functools.partial(
    jax.jit,
    static_argnames=(
        "exact_scorer", "metric", "dim", "ef", "k", "aq_width",
        "promote_width", "expand_width", "max_iters", "static_iters",
        "final_rescore", "hop_merge",
    ),
)
def batched_sketch_gated_query(
    qp: Array,
    qs: Array,
    exact_ctx,
    scale: Array,
    neighbors: Array,
    nbr_sketch: Array,
    node_sketch: Array,
    routing_ids: Array,
    *,
    exact_scorer: Scorer,
    metric: DistanceMetric,
    dim: int,
    ef: int,
    k: int,
    aq_width: int,
    promote_width: int,
    expand_width: int = 4,
    max_iters: int = 100,
    static_iters: bool = False,
    final_rescore: int = 0,
    hop_merge: str = "inline",
) -> tuple[Array, Array, Array]:
    """Batched two-level sketch-gated query with per-query routing entries.

    Returns (dists [B, k], ids [B, k], n_exact [B]) — exact distances,
    ascending. With a recompute `exact_scorer`, mean(n_exact)/N is the
    recompute fraction (the metric the reference dead-codes,
    leann.rs:974-981).
    """
    entries = route_entries(qs, routing_ids, node_sketch, metric)
    search = functools.partial(
        _search_one_sketch_gated,
        neighbors=neighbors,
        nbr_sketch=nbr_sketch,
        node_sketch=node_sketch,
        exact_scorer=exact_scorer,
        metric=metric,
        dim=dim,
        ef=ef,
        aq_width=aq_width,
        promote_width=promote_width,
        expand_width=expand_width,
        max_iters=max_iters,
        static_iters=static_iters,
        final_rescore=final_rescore,
        hop_merge=hop_merge,
    )
    dists, ids, n_exact = jax.vmap(
        lambda q1, s1, e1: search(q1, s1, exact_ctx, scale, entry_point=e1)
    )(qp, qs, entries)
    return dists[:, :k], ids[:, :k], n_exact


def route_entries(
    qs: Array,
    routing_ids: Array,
    node_sketch: Array,
    metric: DistanceMetric,
) -> Array:
    """Per-query entry points: the routing node whose sketch is nearest.

    Dense [B, R] sketch scoring (one small matmul) replaces the reference's
    greedy multi-layer descent (hnsw.rs:458-480); on clustered corpora it
    drops the search straight into the right region, cutting hops/wave
    (round-1 profiling: clustered data doubled hop counts from a single
    global entry).
    """
    from islands_tpu.ops import proj as proj_ops

    raw = proj_ops.unpack_raw(node_sketch[routing_ids])  # [R, P]
    if proj_ops.uses_dot(metric):
        d = -jnp.dot(qs, raw.T, preferred_element_type=jnp.float32)
    else:
        d = (
            jnp.sum(qs * qs, axis=1)[:, None]
            + jnp.sum(raw * raw, axis=1)[None, :]
            - 2.0 * jnp.dot(qs, raw.T, preferred_element_type=jnp.float32)
        )
    return routing_ids[jnp.argmin(d, axis=1)].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("embed_fn", "metric"))
def route_entries_embed(
    q: Array,
    embed_ctx,
    routing_ids: Array,
    *,
    embed_fn,
    metric: DistanceMetric,
) -> Array:
    """Per-query entry points by EXACT distance to a routing subsample —
    fact 26's dense-routing lever for the two-level PQ path, which has no
    sketches to route on (design.md §16).

    One [R]-row fetch through the provider (a block gather for stored
    embeddings; a recompute batch otherwise — size routing_size to the
    provider's cost) then a single [B, R] MXU matmul. Raw (unprepped)
    queries; pairwise_distance preps internally.
    """
    rows = embed_fn(embed_ctx, routing_ids.astype(jnp.int32))
    d = dist_ops.pairwise_distance(q, rows, metric)
    return routing_ids[jnp.argmin(d, axis=1)].astype(jnp.int32)


def _search_one_two_level(
    q: Array,
    tables: Array,
    exact_ctx,
    nbr_codes: Array,
    neighbors: Array,
    entry_point: Array,
    *,
    exact_scorer: Scorer,
    approx_scorer,
    ef: int,
    aq_width: int,
    promote_width: int,
    expand_width: int,
    max_iters: int,
    promote_exact: bool = True,
    static_iters: bool = False,
    final_rescore: int = 0,
    hop_merge: str = "inline",
) -> tuple[Array, Array, Array]:
    """Two-level PQ-gated search (spec Algorithm 2,
    docs/leann-specification.md:223-271) for a single query.

    With `promote_exact=False` the hop loop runs pure-ADC — promotion
    moves the best AQ entries into the pool at their approximate
    distances, no per-hop exact scoring — and the final ef-wide pool is
    exact-rescored ONCE after the loop (the sketch gate's structure,
    design.md §16: one rescore of ef candidates instead of
    promote_width*hops, the 768-d bandwidth lever).

    Neighbors discovered each hop are scored with the cheap approximate
    scorer — PQ-ADC over `nbr_codes`, the INLINE neighbor-code blocks
    ([N, m0*S] u8, pq.build_inline_codes): each hop gathers one block per
    expanded node (expand_width block gathers) instead of one code row per
    candidate (expand_width*m0 count-bound gathers — the round-3 config-4
    wall; same layout fix as the sketch gate, docs/design.md §10) — into a
    persistent fixed-width Approximate Queue; only the best `promote_width`
    AQ entries per hop are promoted to exact scoring (embedding recompute
    via `exact_ctx`) and merged into the exact pool.

    `approx_scorer(tables, block_codes [E, S], valid [E]) -> dists [E]`
    (pq.gated_block_scorer_for — one-hot-matmul ADC, no serialized gathers).

    Returns (pool_dists [ef], pool_ids [ef], n_exact_scored scalar) — the
    last is the recompute-efficiency metric the reference only dead-codes
    (leann.rs:974-981).
    """
    n, m = neighbors.shape
    em = expand_width * m
    # A hop discovers at most em candidates; a wider promote window would
    # shrink the AQ slice below aq_width and break the while_loop carry.
    promote_width = min(promote_width, em)

    entry = jnp.maximum(entry_point, 0)
    d_entry = exact_scorer(exact_ctx, q, entry[None], jnp.ones((1,), dtype=bool))[0]

    # (id, expanded) packed codes; see _search_one. AQ aux is the bare id.
    pool_code = jnp.full((ef,), -1, dtype=jnp.int32).at[0].set(
        pack_id_expanded(entry.astype(jnp.int32), jnp.zeros((), bool))
    )
    pool_dists = jnp.full((ef,), _INF).at[0].set(d_entry)
    aq_ids = jnp.full((aq_width,), SENTINEL, dtype=jnp.int32)
    aq_dists = jnp.full((aq_width,), _INF)
    n_exact = jnp.int32(1)

    def cond(state):
        pool_dists, pool_code, aq_dists, *_, it = state
        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        best_unexp = jnp.min(unexp)
        worst = pool_dists[-1]
        exact_work = (best_unexp < _INF) & (best_unexp <= worst)
        # AQ distances are on the exact metric's scale (see
        # pq.gated_block_scorer_for), so "could the best approximate candidate
        # improve the pool" is a valid cross-queue comparison. The finite
        # guard stops the loop when both queues are exhausted (inf <= inf
        # would otherwise spin to max_iters).
        aq_work = (aq_dists[0] < _INF) & (aq_dists[0] <= worst)
        return (exact_work | aq_work) & (it < max_iters)

    def body(state):
        pool_dists, pool_code, aq_dists, aq_ids, n_exact, it = state

        # --- Phase 1: expand best unexpanded exact entries, approx-score ---
        unexp = jnp.where((pool_code & 1) == 1, _INF, pool_dists)
        neg_best, sel_pos = jax.lax.top_k(-unexp, expand_width)
        sel_valid = -neg_best < _INF
        pool_code = pool_code.at[sel_pos].set(
            pool_code[sel_pos] | 1, unique_indices=True
        )
        sel_ids = pool_code[sel_pos] >> 1

        safe = jnp.clip(sel_ids, 0, n - 1)
        rows = neighbors[safe]
        blocks = nbr_codes[safe]                     # [E, m0*S] u8
        nbr_ids = rows.reshape(em)
        nbr_valid = sel_valid[:, None].repeat(m, axis=1).reshape(em) & (nbr_ids != SENTINEL)

        d_approx = approx_scorer(tables, blocks.reshape(em, -1), nbr_valid)
        nbr_ids = jnp.where(nbr_valid, nbr_ids, n)

        if hop_merge == "fused":
            # Fused dedup + AQ merge + promote split (ops/pallas_kernels.
            # hop_merge_op_for; see the sketch-gated loop above).
            from islands_tpu.ops.pallas_kernels import hop_merge_op_for

            keep = (nbr_ids < n) & _not_in_set(nbr_ids, aq_ids)
            keep = keep & _not_in_set(nbr_ids, pool_code >> 1)
            nd = jnp.where(keep, d_approx, _INF)
            ni = jnp.where(keep, nbr_ids, n).astype(jnp.int32)
            prom_d, prom_ids, aq_dists, aq_ids = hop_merge_op_for(
                promote_width)(nd, ni, aq_dists, aq_ids)
            prom_valid = prom_d < _INF
        else:
            # Sort by id (carrying the ADC distance), mask duplicates, then
            # the scatter-free visited checks: not in the approximate queue
            # and not in the exact pool (see _not_in_set).
            sorted_ids, d_approx = jax.lax.sort(
                (nbr_ids, d_approx), num_keys=1)
            prev = jnp.concatenate(
                [jnp.full((1,), -2, dtype=sorted_ids.dtype), sorted_ids[:-1]]
            )
            keep = (sorted_ids < n) & (sorted_ids != prev)
            keep = keep & _not_in_set(sorted_ids, aq_ids)
            keep = keep & _not_in_set(sorted_ids, pool_code >> 1)

            new_ids = jnp.where(keep, sorted_ids, SENTINEL).astype(jnp.int32)
            new_d = jnp.where(keep, d_approx, _INF)

            # --- bitonic-merge into the approximate queue (ops/merge) ---
            aq_d, aq_i = merge_sorted_with_new(
                aq_dists, aq_ids, new_d, new_ids)

            # --- Phase 2: promote best promote_width AQ entries to exact --
            prom_ids = aq_i[:promote_width]
            prom_valid = aq_d[:promote_width] < _INF
            prom_d = aq_d[:promote_width]
            aq_dists = aq_d[promote_width : promote_width + aq_width]
            aq_ids = aq_i[promote_width : promote_width + aq_width]

        if promote_exact:
            d_exact = exact_scorer(
                exact_ctx, q, jnp.where(prom_valid, prom_ids, 0), prom_valid
            )
            n_exact = n_exact + jnp.sum(prom_valid.astype(jnp.int32))
        else:
            # Pure-ADC hop: the AQ head enters the pool at its approximate
            # distance; exact scoring happens once, after the loop.
            d_exact = jnp.where(prom_valid, prom_d, _INF)

        prom_code = pack_id_expanded(
            jnp.where(prom_valid, prom_ids, SENTINEL), ~prom_valid
        )
        all_d, all_code = merge_sorted_with_new(
            pool_dists, pool_code, d_exact, prom_code
        )
        return (all_d[:ef], all_code[:ef], aq_dists, aq_ids, n_exact, it + 1)

    state = (pool_dists, pool_code, aq_dists, aq_ids, n_exact, jnp.int32(0))
    pool_dists, pool_code, aq_dists, aq_ids, n_exact, _ = _run_hops(
        cond, body, state, max_iters, static_iters)
    if final_rescore > 0 and promote_exact:
        # One end-of-loop exact rescore of the AQ head (same lever as the
        # sketch gate's final_rescore): at 768-d each PER-HOP promotion
        # costs a 3 kB exact-row fetch (fact 36 — wide promote loses 17%
        # QPS at config-4), so recovering narrow-promote's stranded true
        # neighbors once per QUERY is the cheap direction. Hops stay
        # exact-driven, unlike end_rerank's pure-ADC walk (fact 34).
        fr = min(final_rescore, aq_width)
        fr_ids = aq_ids[:fr]
        fr_valid = aq_dists[:fr] < _INF
        d_fr = exact_scorer(exact_ctx, q, jnp.where(fr_valid, fr_ids, 0),
                            fr_valid)
        n_exact = n_exact + jnp.sum(fr_valid.astype(jnp.int32))
        fr_code = pack_id_expanded(
            jnp.where(fr_valid, fr_ids, SENTINEL), ~fr_valid)
        all_d, all_code = merge_sorted_with_new(
            pool_dists, pool_code, d_fr, fr_code)
        pool_dists, pool_code = all_d[:ef], all_code[:ef]
    pool_ids = pool_code >> 1
    if not promote_exact:
        # One exact rescore of the pooled ef candidates (ef exact
        # scores/query total, vs promote_width*hops in promote_exact mode).
        valid = pool_dists < _INF
        d_re = exact_scorer(exact_ctx, q, jnp.where(valid, pool_ids, 0), valid)
        d_re = jnp.where(valid, d_re, _INF)
        pool_dists, pool_ids = jax.lax.sort((d_re, pool_ids), num_keys=1)
        n_exact = n_exact + jnp.sum(valid.astype(jnp.int32))
    return pool_dists, pool_ids, n_exact


# ---------------------------------------------------------------------------
# Batched jitted entry points (process-wide jit cache: all operands are
# arguments, scorers/sizes are hashable statics)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("scorer", "ef", "expand_width", "max_iters", "prune_fn"),
)
def batched_search(
    qp: Array,
    ctx,
    neighbors: Array,
    entry_point: Array,
    degrees: Array | None = None,
    *,
    scorer: Scorer,
    ef: int,
    expand_width: int = 4,
    max_iters: int = 100,
    prune_fn=None,
) -> tuple[Array, Array]:
    """qp [B, d] (prepped) -> (dists [B, ef], ids [B, ef]) ascending.
    `entry_point` may be a scalar (shared) or a [B] array (per-query)."""
    search = functools.partial(
        _search_one,
        neighbors=neighbors,
        degrees=degrees,
        scorer=scorer,
        ef=ef,
        expand_width=expand_width,
        max_iters=max_iters,
        prune_fn=prune_fn,
    )
    if jnp.ndim(entry_point) == 0:
        return jax.vmap(lambda q: search(q, ctx, entry_point=entry_point))(qp)
    return jax.vmap(lambda q, e: search(q, ctx, entry_point=e))(qp, entry_point)


@functools.partial(
    jax.jit,
    static_argnames=(
        "exact_scorer", "approx_scorer", "prep_fn", "ef", "aq_width",
        "promote_width", "expand_width", "max_iters", "promote_exact",
        "static_iters", "final_rescore", "hop_merge",
    ),
)
def batched_two_level_search(
    qp: Array,
    exact_ctx,
    nbr_codes: Array,
    prep_ctx,
    neighbors: Array,
    entry_point: Array,
    *,
    exact_scorer: Scorer,
    approx_scorer,
    prep_fn,
    ef: int,
    aq_width: int,
    promote_width: int,
    expand_width: int = 4,
    max_iters: int = 100,
    promote_exact: bool = True,
    static_iters: bool = False,
    final_rescore: int = 0,
    hop_merge: str = "inline",
) -> tuple[Array, Array, Array]:
    """Two-level batched search over inline neighbor-code blocks
    (`nbr_codes` [N, m0*S] u8, pq.build_inline_codes; `approx_scorer` from
    pq.gated_block_scorer_for). `prep_fn(prep_ctx, qp) -> tables [B, ...]`
    builds the per-query ADC tables inside the same jit. With
    `promote_exact=False` the hop loop is pure-ADC and the ef pool is
    exact-rescored once at the end (see _search_one_two_level).
    `entry_point` may be a scalar (shared) or a [B] array (per-query
    routed entries, route_entries_embed)."""
    tables = prep_fn(prep_ctx, qp)
    search = functools.partial(
        _search_one_two_level,
        neighbors=neighbors,
        exact_scorer=exact_scorer,
        approx_scorer=approx_scorer,
        ef=ef,
        aq_width=aq_width,
        promote_width=promote_width,
        expand_width=expand_width,
        max_iters=max_iters,
        promote_exact=promote_exact,
        static_iters=static_iters,
        final_rescore=final_rescore,
        hop_merge=hop_merge,
    )
    if jnp.ndim(entry_point) == 0:
        return jax.vmap(
            lambda q, t: search(q, t, exact_ctx, nbr_codes,
                                entry_point=entry_point)
        )(qp, tables)
    return jax.vmap(
        lambda q, t, e: search(q, t, exact_ctx, nbr_codes, entry_point=e)
    )(qp, tables, entry_point)


def default_max_iters(ef: int, expand_width: int) -> int:
    return 4 * max(ef // max(expand_width, 1), 1) + 16


# ---------------------------------------------------------------------------
# High-level searchers
# ---------------------------------------------------------------------------


class StoredSearcher:
    """Search handle over a graph + stored embeddings (the reference's
    `Searcher` builder role, src/core/search.rs:106-182, flattened to LEANN's
    single-layer graph with a max-level entry point).

    With a `sketch` (ops/proj.SketchIndex — returned by
    build_index_with_sketch or derived via build_sketch_index), queries
    default to the sketch-gated path: per-query routing entries, hops over
    inline neighbor-sketch blocks, one exact rescore of the pooled ef
    candidates. Pass gate="exact" for the round-1 per-hop exact loop.
    """

    def __init__(
        self,
        graph: CsrGraph,
        x: Array,
        metric: DistanceMetric = DistanceMetric.COSINE,
        sketch=None,
        routing_size: int = 1024,
        seed: int = 0,
    ):
        import numpy as _np

        self.graph = graph
        self.metric = metric
        self.x_prepped = dist_ops.prep_corpus(x, metric)
        self._scorer = make_stored_scorer(metric)
        self.sketch = sketch
        n = graph.num_nodes
        if sketch is not None and n > 0:
            rng = _np.random.default_rng(seed)
            self._routing = jnp.asarray(
                rng.integers(0, n, size=min(routing_size, n)), dtype=jnp.int32
            )
        else:
            self._routing = None

    def search(
        self,
        queries: Array,
        k: int,
        ef: int = 64,
        expand_width: int = 4,
        max_iters: int | None = None,
        gate: str = "auto",
        promote_width: int | None = None,
        static_loop: bool = False,
        final_rescore: int = 0,
        aq_width: int | None = None,
        hop_merge: str = "inline",
    ) -> tuple[Array, Array]:
        """queries [B, d] -> (dists [B, k], ids [B, k]). Empty index returns
        empty results (reference: leann.rs:875-877). `promote_width` (sketch
        gate only) caps how many approximate-queue heads get exact scoring
        per hop — the exact-gather budget knob. `static_loop` runs the
        sketch-gated hop loop as a fixed-trip scan (see _run_hops; wins when
        the max_iters cap binds, fact 23). `final_rescore` exact-rescores
        that many approximate-queue heads once after the loop — the
        recall-recovery half of a narrow-promote operating point.
        `aq_width` (sketch gate) overrides the approximate-queue width
        (default max(ef, 64)); wider retains more found-but-evicted
        candidates for final_rescore to recover, at a small merge cost."""
        if self.graph.num_nodes == 0:
            b = queries.shape[0]
            return jnp.zeros((b, 0), jnp.float32), jnp.zeros((b, 0), jnp.int32)
        ef = max(ef, k)
        qp = dist_ops.prep_query(queries, self.metric)
        if gate == "auto":
            gate = "sketch" if self.sketch is not None else "exact"
        if gate == "sketch":
            if self.sketch is None:
                raise ValueError("no SketchIndex attached (gate='sketch')")
            from islands_tpu.ops import proj as proj_ops

            qs = proj_ops.sketch_query(qp, self.sketch.w, self.sketch.scale)
            promote = promote_width or max(8, min(2 * expand_width * 4, ef))
            if max_iters is None:  # gate-appropriate default, caller wins
                max_iters = 8 * max(ef // promote, 1) + 32
            d, ids, _ = batched_sketch_gated_query(
                qp, qs, self.x_prepped, self.sketch.scale,
                self.graph.neighbors, self.sketch.nbr_sketch,
                self.sketch.node_sketch, self._routing,
                exact_scorer=self._scorer, metric=self.metric,
                dim=int(qp.shape[1]), ef=ef, k=k,
                aq_width=aq_width or max(ef, 64),
                promote_width=promote, expand_width=expand_width,
                max_iters=max_iters, static_iters=static_loop,
                final_rescore=final_rescore, hop_merge=hop_merge,
            )
            return d, ids
        if max_iters is None:
            max_iters = default_max_iters(ef, expand_width)
        entry = self.graph.entry_point
        if self.sketch is not None:
            # Routing entries help the exact gate too: start each query at
            # its nearest routing node by sketch distance (one small matmul)
            # instead of the single global entry.
            from islands_tpu.ops import proj as proj_ops

            qs = proj_ops.sketch_query(qp, self.sketch.w, self.sketch.scale)
            entry = route_entries(
                qs, self._routing, self.sketch.node_sketch, self.metric
            )
        dists, ids = batched_search(
            qp, self.x_prepped, self.graph.neighbors, entry,
            scorer=self._scorer, ef=ef, expand_width=expand_width,
            max_iters=max_iters,
        )
        return dists[:, :k], ids[:, :k]


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
    """One-shot exact search over stored embeddings."""
    return StoredSearcher(graph, x, metric).search(
        queries, k=k, ef=ef, expand_width=expand_width, max_iters=max_iters
    )
