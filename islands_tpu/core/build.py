"""Wave-batched graph construction.

TPU-native reformulation of the reference's one-node-at-a-time incremental
build (src/core/leann.rs:560-631): vectors are inserted in fixed-size waves.
Each wave
  1. batched-beam-searches the pre-wave graph for efConstruction candidates
     per new node (reference: search_layer_with_adjacency, leann.rs:692-749),
  2. merges brute-force intra-wave nearest neighbors (restoring the links
     sequential insertion would have created within the wave),
  3. applies high-degree-preserving pruning to m0 (Algorithm 3; reference:
     prune_with_degree_preservation_temp, leann.rs:761-833 — hub threshold =
     top `hub_percentile` of candidate degrees, max(m0/4, 1) reserved hub
     slots, remainder filled nearest-first),
  4. writes forward edges, scatter-appends reverse edges into per-node slack
     slots (reference: bidirectional edges at leann.rs:592-607),
  5. repairs nodes whose degree exceeded m0 by re-pruning to the m0 nearest
     (reference: prune_neighbors_temp, leann.rs:634-658).

Wave insertion changes insertion order vs the sequential reference, so graphs
are not structurally identical — recall parity (tests/test_build.py) is the
correctness criterion, per SURVEY.md §7 "hard parts".

Temporary embeddings live in HBM only during the build and are dropped after
(the LEANN storage contract: only the graph is kept, leann.rs:556-631).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from islands_tpu.core.config import DistanceMetric, LeannConfig
from islands_tpu.core.csr import SENTINEL, CsrGraph
from islands_tpu.core.search import _search_one, make_stored_scorer
from islands_tpu.ops import distance as dist_ops

Array = jax.Array
_INF = jnp.float32(jnp.inf)
_IMAX = jnp.int32(2**31 - 1)


def sample_levels(n: int, ml: float, max_layers: int, seed: int) -> np.ndarray:
    """Geometric level assignment: floor(-ln(U) * ml), capped
    (reference: leann.rs:549-554). Precomputable — levels are data-independent,
    so the whole schedule (including per-wave entry points) is known up front.
    """
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    levels = np.floor(-np.log(np.maximum(u, 1e-12)) * ml).astype(np.int32)
    return np.minimum(levels, max_layers - 1)


def _prefix_entries(levels: np.ndarray) -> np.ndarray:
    """entry[i] = entry point of the graph containing nodes [0, i): the first
    node achieving the running max level (strict-> update rule at
    leann.rs:610-613)."""
    n = len(levels)
    entries = np.zeros(n + 1, dtype=np.int32)
    best, best_id = -1, 0
    for i in range(n):
        entries[i] = best_id
        if levels[i] > best:
            best, best_id = int(levels[i]), i
    entries[n] = best_id
    entries[0] = 0
    return entries


def _rank_of(keys: Array) -> Array:
    """rank[i] = position of element i in ascending sort of keys."""
    order = jnp.argsort(keys)
    return jnp.argsort(order)


def _diversity_mask(
    cand_dists: Array, cand_emb: Array, valid: Array, metric: DistanceMetric
) -> Array:
    """RNG-heuristic selection mask over candidates SORTED by distance asc:
    keep candidate i iff dist(i, query) <= dist(i, j) for every already-kept
    j (the HNSW select-heuristic). Sequential scan over C candidates; each
    step is one batched matvec under vmap, so the whole wave's scans run as
    one fused program."""
    c = cand_dists.shape[0]
    min_d = jnp.full((c,), _INF)

    def step(carry, i):
        sel, min_d = carry
        keep = valid[i] & (cand_dists[i] <= min_d[i])
        d_to_i = dist_ops.rowwise_distance(cand_emb[i], cand_emb, metric)
        min_d = jnp.where(keep, jnp.minimum(min_d, d_to_i), min_d)
        return (sel.at[i].set(keep), min_d), None

    (sel, _), _ = jax.lax.scan(
        step, (jnp.zeros((c,), bool), min_d), jnp.arange(c)
    )
    return sel


def _select_neighbors(
    cand_ids: Array,
    cand_dists: Array,
    cand_emb: Array,
    degrees: Array,
    m0: int,
    hub_percentile: float,
    high_degree_pruning: bool,
    diversify: bool,
    metric: DistanceMetric,
) -> tuple[Array, Array]:
    """Single-row neighbor selection (vmapped over the wave).

    Vectorization of leann.rs:761-833 (Algorithm 3) + the RNG diversity
    heuristic: candidates get a composite priority — reserved hubs (by degree
    desc), then diversity-passing regulars (by distance asc), then remaining
    regulars (by distance asc), then leftover hubs — and the m0 smallest
    priorities win. When fewer than m0 candidates are valid this keeps them
    all, matching the reference's early return at leann.rs:767-769.
    """
    c = cand_ids.shape[0]
    n = degrees.shape[0]
    valid = (cand_ids >= 0) & (cand_dists < _INF)
    hub_slots = max(m0 // 4, 1)

    deg = jnp.where(valid, degrees[jnp.clip(cand_ids, 0, n - 1)], -1)
    if high_degree_pruning:
        n_valid = jnp.sum(valid.astype(jnp.int32))
        hub_count = jnp.ceil(n_valid.astype(jnp.float32) * hub_percentile).astype(jnp.int32)
        sorted_deg = -jnp.sort(-deg)  # descending
        thr_idx = jnp.clip(hub_count - 1, 0, c - 1)
        threshold = jnp.where(
            (hub_count > 0) & (hub_count < n_valid), sorted_deg[thr_idx], _IMAX
        )
        is_hub = valid & (deg >= threshold) & (threshold < _IMAX)
    else:
        is_hub = jnp.zeros_like(valid)

    if diversify:
        # Sort by distance for the sequential heuristic, then scatter the
        # mask back to original candidate positions.
        order = jnp.argsort(jnp.where(valid, cand_dists, _INF))
        sel_sorted = _diversity_mask(
            cand_dists[order], cand_emb[order], valid[order], metric
        )
        inv = jnp.argsort(order)
        diverse = sel_sorted[inv]
    else:
        diverse = valid

    # Hubs ranked by degree descending; regulars by distance ascending with
    # diversity-passing candidates strictly first.
    hub_rank = _rank_of(jnp.where(is_hub, -deg, _IMAX))
    div_rank = _rank_of(jnp.where(valid & ~is_hub & diverse, cand_dists, _INF))
    rest_rank = _rank_of(jnp.where(valid & ~is_hub & ~diverse, cand_dists, _INF))

    big = jnp.int32(8 * c)
    priority = jnp.where(
        is_hub & (hub_rank < hub_slots),
        hub_rank,
        jnp.where(
            valid & ~is_hub & diverse,
            hub_slots + div_rank,
            jnp.where(
                valid & ~is_hub,
                hub_slots + c + rest_rank,
                jnp.where(is_hub, hub_slots + 2 * c + hub_rank, big),
            ),
        ),
    )
    # Candidate width can be below m0 (small ef_construction/intra_wave_k):
    # clamp the selection and pad the output to m0 (reference keeps all
    # candidates when count <= max_conn, leann.rs:767-769).
    kk = min(m0, c)
    _, sel_pos = jax.lax.top_k(-priority, kk)
    sel_ok = priority[sel_pos] < big
    sel_ids = jnp.where(sel_ok, cand_ids[sel_pos], SENTINEL)
    sel_dists = jnp.where(sel_ok, cand_dists[sel_pos], _INF)
    if kk < m0:
        sel_ids = jnp.pad(sel_ids, (0, m0 - kk), constant_values=SENTINEL)
        sel_dists = jnp.pad(sel_dists, (0, m0 - kk), constant_values=jnp.inf)
    return sel_ids, sel_dists


def _repair_rows(
    neighbors: Array,
    degrees: Array,
    node_ids: Array,
    x_prepped: Array,
    m0: int,
    metric: DistanceMetric,
    diversify: bool = False,
) -> tuple[Array, Array]:
    """Re-prune the neighbor lists of `node_ids` (padded with N for no-ops):
    dedup, score against the node's own embedding, keep the m0 nearest —
    diversity-passing candidates first when `diversify` (reference:
    prune_neighbors_temp, leann.rs:634-658 keeps nearest only)."""
    n, bw = neighbors.shape
    safe = jnp.clip(node_ids, 0, n - 1)
    rows = neighbors[safe]  # [R, BW]

    # Dedup within each row: sort ids, mask repeats and sentinels.
    sorted_rows = jnp.sort(jnp.where(rows == SENTINEL, n, rows), axis=1)
    prev = jnp.pad(sorted_rows[:, :-1], ((0, 0), (1, 0)), constant_values=-2)
    keep = (sorted_rows < n) & (sorted_rows != prev)

    q = x_prepped[safe]
    nbr_emb = x_prepped[jnp.clip(sorted_rows, 0, x_prepped.shape[0] - 1)]
    d = dist_ops.rows_distance(q, nbr_emb, metric)
    d = jnp.where(keep, d, _INF)

    order = jnp.argsort(d, axis=1)
    d_sorted = jnp.take_along_axis(d, order, axis=1)
    ids_sorted = jnp.take_along_axis(sorted_rows, order, axis=1)
    kth_valid = d_sorted < _INF

    if diversify:
        emb_sorted = jnp.take_along_axis(nbr_emb, order[:, :, None], axis=1)
        diverse = jax.vmap(
            functools.partial(_diversity_mask, metric=metric)
        )(d_sorted, emb_sorted, kth_valid)
        # Diversity-passing first (already distance-ordered), rest after.
        prio = jnp.where(
            diverse & kth_valid, jnp.arange(bw)[None, :],
            jnp.where(kth_valid, bw + jnp.arange(bw)[None, :], 4 * bw),
        )
        reorder = jnp.argsort(prio, axis=1)
        d_sorted = jnp.take_along_axis(d_sorted, reorder, axis=1)
        ids_sorted = jnp.take_along_axis(ids_sorted, reorder, axis=1)
        kth_valid = d_sorted < _INF

    new_rows = jnp.where(kth_valid, ids_sorted, SENTINEL).astype(jnp.int32)
    new_rows = new_rows.at[:, m0:].set(SENTINEL)
    new_deg = jnp.sum(kth_valid[:, :m0].astype(jnp.int32), axis=1)

    neighbors = neighbors.at[node_ids].set(new_rows, mode="drop")
    degrees = degrees.at[node_ids].set(new_deg, mode="drop")
    return neighbors, degrees


def _scatter_reverse_edges(
    neighbors: Array,
    degrees: Array,
    sel_ids: Array,
    sel_dists: Array,
    src_ids: Array,
    edge_valid: Array,
) -> tuple[Array, Array]:
    """Append src -> slot in each selected neighbor's list.

    Fixed-shape equivalent of the reference's per-edge `adjacency[nid].push`
    (leann.rs:593-607): edges are sorted by (dst, dist) so when a node's slack
    fills up within a wave the *nearest* incoming sources win slots; dropped
    ones would have been pruned by the repair pass anyway.
    """
    n, bw = neighbors.shape
    dst = jnp.where(edge_valid, sel_ids, n).reshape(-1)
    dist = jnp.where(edge_valid, sel_dists, _INF).reshape(-1)
    src = src_ids.reshape(-1)

    dst_s, dist_s, src_s = jax.lax.sort((dst, dist, src), num_keys=2)
    e = dst_s.shape[0]
    idx = jnp.arange(e, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), dst_s[1:] != dst_s[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    pos = idx - seg_start

    base = degrees[jnp.clip(dst_s, 0, n - 1)]
    slot = base + pos
    ok = (dst_s < n) & (slot < bw)
    dst_w = jnp.where(ok, dst_s, n)  # out-of-bounds -> dropped
    neighbors = neighbors.at[dst_w, jnp.clip(slot, 0, bw - 1)].set(src_s, mode="drop")
    degrees = degrees.at[dst_w].add(ok.astype(jnp.int32), mode="drop")
    return neighbors, degrees


def wave_body(
    neighbors: Array,
    degrees: Array,
    s: Array,
    entry: Array,
    x_prepped: Array,
    count: Array | None = None,
    pq_ctx: tuple | None = None,
    *,
    config: LeannConfig,
    n: int,
    wave: int,
    buffer_width: int,
    max_iters: int,
):
    """One construction wave: insert nodes [s, s+wave) into the graph.

    Pure function of its array arguments so it can run under jit (single
    chip) or shard_map (per-shard archipelago build). `x_prepped` must be
    padded to at least n + wave rows (see build_index). `count` is the
    logical number of vectors (defaults to the structural size n); shards
    whose corpora are padded pass count < n so padding rows never insert.
    `pq_ctx` = (centroids, codes) enables PQ-gated candidate search
    (config.pq_build).
    """
    if count is None:
        count = jnp.int32(n)
    m0 = config.m0
    efc = config.ef_construction
    metric = config.metric
    intra_k = min(config.intra_wave_k, wave - 1) if wave > 1 else 0
    scorer = make_stored_scorer(metric)
    d = x_prepped.shape[1]

    select = jax.vmap(
        functools.partial(
            _select_neighbors,
            m0=m0,
            hub_percentile=config.hub_percentile,
            high_degree_pruning=config.high_degree_pruning,
            diversify=config.diversify,
            metric=metric,
        ),
        in_axes=(0, 0, 0, None),
    )

    wave_ids = s + jnp.arange(wave, dtype=jnp.int32)
    wave_ok = wave_ids < count
    q = jax.lax.dynamic_slice(x_prepped, (s, 0), (wave, d))

    # 1. candidates from the existing graph
    if pq_ctx is not None:
        # PQ-gated search: hops gather 16-byte codes, exact scoring only for
        # the promoted few per hop (the large-n gather-latency fix).
        from islands_tpu.core.pq import gated_prep_for, gated_scorer_for
        from islands_tpu.core.search import _search_one_two_level

        centroids, codes = pq_ctx
        prep = gated_prep_for(metric)
        approx = gated_scorer_for(metric)
        promote = min(config.pq_build_promote, config.expand_width * buffer_width)
        search2 = functools.partial(
            _search_one_two_level,
            neighbors=neighbors,
            entry_point=entry,
            exact_scorer=scorer,
            approx_scorer=approx,
            ef=efc,
            aq_width=efc,
            promote_width=promote,
            expand_width=config.expand_width,
            max_iters=max_iters,
        )
        tables = prep(centroids, q)
        g_dists, g_ids, _ = jax.vmap(
            lambda qi, ti: search2(qi, ti, x_prepped, codes)
        )(q, tables)
    else:
        search = functools.partial(
            _search_one,
            neighbors=neighbors,
            entry_point=entry,
            scorer=scorer,
            ef=efc,
            expand_width=config.expand_width,
            max_iters=max_iters,
        )
        g_dists, g_ids = jax.vmap(lambda qi: search(qi, x_prepped))(q)

    # 2. intra-wave brute-force candidates
    if intra_k > 0:
        dq = dist_ops.pairwise_distance(q, q, metric)
        eye = jnp.eye(wave, dtype=bool)
        own_invalid = ~wave_ok[None, :] | eye
        dq = jnp.where(own_invalid, _INF, dq)
        neg, pos = jax.lax.top_k(-dq, intra_k)
        intra_dists = -neg
        intra_ids = jnp.where(intra_dists < _INF, s + pos.astype(jnp.int32), SENTINEL)
        cand_ids = jnp.concatenate([g_ids, intra_ids], axis=1)
        cand_dists = jnp.concatenate([g_dists, intra_dists], axis=1)
    else:
        cand_ids, cand_dists = g_ids, g_dists

    # 3. high-degree-preserving pruning to m0 (+ RNG diversity heuristic,
    # which needs the candidate embeddings for candidate-candidate distances)
    cand_emb = x_prepped[jnp.clip(cand_ids, 0, x_prepped.shape[0] - 1)]
    sel_ids, sel_dists = select(cand_ids, cand_dists, cand_emb, degrees)
    sel_ids = jnp.where(wave_ok[:, None], sel_ids, SENTINEL)
    sel_dists = jnp.where(wave_ok[:, None], sel_dists, _INF)

    # 4a. forward edges
    fwd = jnp.full((wave, buffer_width), SENTINEL, dtype=jnp.int32)
    fwd = fwd.at[:, :m0].set(sel_ids)
    wave_w = jnp.where(wave_ok, wave_ids, n)
    neighbors = neighbors.at[wave_w].set(fwd, mode="drop")
    degrees = degrees.at[wave_w].set(
        jnp.sum((sel_ids != SENTINEL).astype(jnp.int32), axis=1), mode="drop"
    )

    # 4b. reverse edges
    src = jnp.broadcast_to(wave_ids[:, None], (wave, m0))
    edge_valid = (sel_ids != SENTINEL) & wave_ok[:, None]
    neighbors, degrees = _scatter_reverse_edges(
        neighbors, degrees, sel_ids, sel_dists, src, edge_valid
    )

    # 5. repair: all wave nodes (dedup mutual intra-wave edges + prune),
    # then up to `wave` previously-inserted nodes now over m0. Nodes
    # missed by the cap stay over-degree in the slack and are picked up
    # next wave or by the final sweep.
    neighbors, degrees = _repair_rows(
        neighbors, degrees, wave_w, x_prepped, m0, metric, config.diversify
    )
    over = jnp.where(degrees > m0, size=wave, fill_value=n)[0].astype(jnp.int32)
    neighbors, degrees = _repair_rows(
        neighbors, degrees, over, x_prepped, m0, metric, config.diversify
    )
    return neighbors, degrees


@functools.partial(
    jax.jit,
    static_argnames=("config", "n", "wave", "buffer_width", "max_iters"),
)
def wave_step(
    neighbors: Array,
    degrees: Array,
    s: Array,
    entry: Array,
    x_prepped: Array,
    count: Array | None = None,
    pq_ctx: tuple | None = None,
    *,
    config: LeannConfig,
    n: int,
    wave: int,
    buffer_width: int,
    max_iters: int,
):
    """Jitted per-wave insertion step. The corpus is an ARGUMENT (never a
    closure) so one compilation per (n, wave, d) shape serves every build in
    the process — closing over the array would bake it in as a constant and
    recompile per corpus (SURVEY.md §7; measured 75s/compile before). `n` is
    the padded structural size; `count` the logical corpus size (build_index
    pads corpora to power-of-two buckets so executables — and the persistent
    compilation cache — are shared across corpus sizes)."""
    return wave_body(
        neighbors, degrees, s, entry, x_prepped, count, pq_ctx,
        config=config, n=n, wave=wave, buffer_width=buffer_width,
        max_iters=max_iters,
    )


def _bucket_size(n: int) -> int:
    """Next power of two >= n (floor 512): the structural padding bucket."""
    b = 512
    while b < n:
        b *= 2
    return b


def build_index(
    x: Array,
    config: LeannConfig | None = None,
    levels: np.ndarray | None = None,
) -> CsrGraph:
    """Build a LEANN proximity graph from embeddings [N, d].

    Returns a CsrGraph with max_degree == config.m0. The embeddings are used
    only during construction (LEANN's storage contract).
    """
    config = config or LeannConfig()
    config.validate()
    n = int(x.shape[0])
    if n == 0:
        return CsrGraph.empty(0, config.m0)

    if levels is None:
        levels = sample_levels(n, config.ml, config.max_layers, config.seed)
    levels = np.asarray(levels, dtype=np.int32)
    entries = _prefix_entries(levels)

    x_prepped = dist_ops.prep_corpus(x, config.metric)
    m0 = config.m0
    buffer_width = m0 + config.reverse_slack
    # Structural padding: arrays sized to a power-of-two bucket so the wave
    # executables are shared across corpus sizes (and across processes via
    # the persistent compilation cache). Rows >= n never insert (count mask).
    n_pad = _bucket_size(n)

    neighbors = jnp.full((n_pad, buffer_width), SENTINEL, dtype=jnp.int32)
    degrees = jnp.zeros((n_pad,), dtype=jnp.int32)

    # --- wave 0: brute-force kNN init over a seed set ---
    # Seed up to one full wave so subsequent waves run at max width from the
    # start (small early waves are latency-bound: ~same wall time as a full
    # wave for a fraction of the vectors). The [w0, w0] distance matrix is
    # at most 4096^2 = 64 MB.
    w0 = min(n, max(2 * m0, min(config.wave_size, 4096)))
    k0 = min(m0, w0 - 1)
    if k0 > 0:
        d0 = dist_ops.pairwise_distance(x_prepped[:w0], x_prepped[:w0], config.metric)
        d0 = jnp.where(jnp.eye(w0, dtype=bool), _INF, d0)
        _, nbr0 = jax.lax.top_k(-d0, k0)
        neighbors = neighbors.at[:w0, :k0].set(nbr0.astype(jnp.int32))
        degrees = degrees.at[:w0].set(k0)

    # --- subsequent waves: doubling schedule ---
    # Wave width is the largest power of two <= the inserted prefix (the seed
    # covers a full wave, so from there waves run at max width immediately;
    # intra-wave kNN restores the links same-wave nodes need from each
    # other), rounded to powers of two so only O(log) distinct shapes
    # compile. Pad the corpus by one wave so the last partial wave's
    # dynamic_slice never clamps (clamping would misalign queries with their
    # wave ids).
    if w0 < n:
        max_iters = 4 * max(config.ef_construction // config.expand_width, 1) + 16
        max_wave = min(config.wave_size, n_pad)
        x_padded = jnp.pad(x_prepped, ((0, n_pad + max_wave - n), (0, 0)))
        count = jnp.int32(n)

        pq_ctx = None
        if config.pq_build and n >= 4 * 256:
            # Train on a prefix sample, encode the whole (padded) corpus once;
            # codes for not-yet-inserted rows are harmless (never neighbors).
            from islands_tpu.core.config import PQConfig
            from islands_tpu.core.pq import ProductQuantizer

            pq = ProductQuantizer(PQConfig(
                num_subquantizers=config.pq_build_subquantizers,
                training_iterations=15, seed=config.seed,
            ))
            pq.train(x_prepped)
            codes = pq.encode(jnp.pad(x_prepped, ((0, n_pad - n), (0, 0))))
            pq_ctx = (pq.codebook.centroids, codes)

        s = w0
        while s < n:
            wave = min(max_wave, 1 << max(8, s.bit_length() - 1))
            entry = jnp.int32(entries[s])
            neighbors, degrees = wave_step(
                neighbors, degrees, jnp.int32(s), entry, x_padded, count, pq_ctx,
                config=config, n=n_pad, wave=wave, buffer_width=buffer_width,
                max_iters=max_iters,
            )
            s += wave
    else:
        x_padded = jnp.pad(x_prepped, ((0, n_pad - n), (0, 0)))

    # --- final sweep: repair any node still over m0, crop slack + padding ---
    neighbors, degrees = _final_sweep(
        neighbors, degrees, x_padded[:n_pad], m0, config.metric, config.diversify
    )
    neighbors = neighbors[:n, :m0]
    degrees = degrees[:n]

    max_level = int(levels.max())
    entry = int(np.argmax(levels == max_level))
    return CsrGraph(
        neighbors=neighbors,
        degrees=degrees,
        levels=jnp.asarray(levels),
        entry_point=jnp.int32(entry),
        max_level=jnp.int32(max_level),
    )


@functools.partial(jax.jit, static_argnames=("m0", "metric", "diversify"))
def _final_sweep(neighbors, degrees, x_prepped, m0, metric, diversify=False):
    n = neighbors.shape[0]
    chunk = min(4096, n)
    num_chunks = -(-n // chunk)

    def body(i, state):
        nbrs, degs = state
        ids = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        ids = jnp.where(ids < n, ids, n)
        # Only rows over m0 need work, but repairing a clean row is a no-op
        # (it re-sorts to the same nearest-m0 set); repair the whole chunk.
        needs = degs[jnp.clip(ids, 0, n - 1)] > m0
        ids = jnp.where(needs & (ids < n), ids, n)
        return _repair_rows(nbrs, degs, ids, x_prepped, m0, metric, diversify)

    return jax.lax.fori_loop(0, num_chunks, body, (neighbors, degrees))
