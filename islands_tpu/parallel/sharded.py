"""Sharded "archipelago" index: corpus partitioned across a device mesh.

New capability with no reference equivalent (the reference scales by running
multiple k8s pods over a shared filesystem, README.md:135-170; SURVEY.md §2.7)
— here sharding is native jax.sharding:

- build: each shard constructs its own proximity graph from its slice of the
  corpus; waves run on all shards simultaneously under shard_map (pure data
  parallelism over ICI — construction needs no cross-shard traffic).
- search: every shard beam-searches its local graph for all queries, then the
  per-shard top-k are all-gathered and merged to a global top-k (the on-device
  equivalent of the reference's MultiIndexSearcher merge, search.rs:185-254).
  Three gates: "exact" (stored embeddings), "sketch" (two-level gated hop over
  inline neighbor sketches, exact rescoring of promotions), and recompute
  (caller-supplied exact scorer + per-shard provider ctx — LEANN's
  graph-only deployment, sharded).
- extend: balanced incremental append (new vectors spread across shards,
  power-of-two-bucketed executables — the per-repo re-index path).
- an optional "dp" mesh axis shards the query batch for throughput.

Node identity: each shard carries a `gids [n_local]` local->global id table
(not an offset), so shards can grow independently and global ids stay stable
across extends.
"""

from __future__ import annotations

import dataclasses
import functools
import io
import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from islands_tpu.core.build import (
    _bucket_size,
    _final_sweep,
    _prefix_entries,
    sample_levels,
    wave_body,
)
from islands_tpu.core.config import DistanceMetric, LeannConfig
from islands_tpu.core.csr import SENTINEL
from islands_tpu.core.search import (
    _search_one,
    _search_one_sketch_gated,
    make_stored_scorer,
    route_entries,
)
from islands_tpu.ops import distance as dist_ops
from islands_tpu.ops import proj as proj_ops

Array = jax.Array
_INF = jnp.float32(jnp.inf)


@dataclasses.dataclass
class ShardedIndex:
    """Per-shard stacked graph + corpus arrays, leading axis = shards."""

    neighbors: Array  # [S, n_local, m0] int32
    degrees: Array  # [S, n_local] int32
    entries: Array  # [S] int32 local entry points
    x_prepped: Array  # [S, n_local, d] stored (prepped) embeddings
    counts: Array  # [S] int32 logical vectors per shard
    gids: Array  # [S, n_local] int32 local -> global id (SENTINEL padding)
    mesh: Mesh
    metric: DistanceMetric
    config: LeannConfig | None = None
    # optional sketch state (sharded two-level gate)
    sketch_w: Array | None = None  # [d, P] shared projection
    sketch_scale: Array | None = None  # scalar
    node_sketch: Array | None = None  # [S, n_local, P/4]
    nbr_sketch: Array | None = None  # [S, n_local, m0*P/4]
    routing: Array | None = None  # [S, R] local routing ids

    @property
    def num_shards(self) -> int:
        return self.neighbors.shape[0]

    @property
    def n_local(self) -> int:
        return self.neighbors.shape[1]

    @property
    def num_vectors(self) -> int:
        return int(jnp.sum(self.counts))

    @property
    def has_sketch(self) -> bool:
        return self.nbr_sketch is not None


def _shard_axes(mesh: Mesh) -> tuple:
    """Mesh axes the shard dimension spans: ('slice', 'shards') for
    multi-slice meshes (make_multislice_mesh), else ('shards',)."""
    return (
        ("slice", "shards") if "slice" in mesh.axis_names else ("shards",)
    )


def _shard_count(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in _shard_axes(mesh)]))


def _shard_spec(mesh: Mesh, *rest: None) -> NamedSharding:
    return NamedSharding(mesh, P(_shard_axes(mesh), *rest))


def _spec_like_for(mesh: Mesh):
    axes = _shard_axes(mesh)

    def f(x):
        return P(axes, *([None] * (np.ndim(x) - 1)))

    return f


def _sharded_sketch(index: ShardedIndex, proj_dims: int, seed: int):
    """Derive per-shard sketch arrays (one shard_map gather pass)."""
    d = index.x_prepped.shape[-1]
    w = proj_ops.make_projection(d, proj_dims, seed)
    mesh = index.mesh

    # Global scale fitted over REAL rows only (the padded tail is zeros;
    # fitting over it dilutes the rms and inflates the scale so real
    # projections clip). Use the first NON-EMPTY shard — shard 0 can be empty
    # after uneven extends, and fitting on its padding would yield the
    # rms-guard fallback scale of 1.0.
    counts_h = np.asarray(index.counts)
    nonempty = np.flatnonzero(counts_h > 0)
    si = int(nonempty[0]) if nonempty.size else 0
    c = max(int(counts_h[si]), 1)
    proj0 = jnp.dot(
        index.x_prepped[si, :c], w, preferred_element_type=jnp.float32
    )
    scale = proj_ops.fit_scale(proj0)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None, None), P(), P()),
        out_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None, None)),
        check_vma=False,
    )
    def derive(xl, nbrs, w, scale):
        xl, nbrs = xl[0], nbrs[0]
        proj = jnp.dot(xl, w, preferred_element_type=jnp.float32)
        node = proj_ops.quantize_pack(proj, scale)
        n_l = xl.shape[0]
        nbr = node[jnp.clip(nbrs, 0, n_l - 1)]
        nbr = jnp.where((nbrs != SENTINEL)[:, :, None], nbr, 0)
        return node[None], nbr.reshape(n_l, -1)[None]

    node_sketch, nbr_sketch = jax.jit(derive)(
        index.x_prepped, index.neighbors, w, scale
    )
    rng = np.random.default_rng(seed ^ 0xA5)
    counts = np.asarray(index.counts)
    r_size = (
        index.config.routing_size if index.config is not None else 256
    )
    routing = np.stack([
        rng.integers(0, max(int(c), 1), size=r_size).astype(np.int32)
        for c in counts
    ])
    index.sketch_w = w
    index.sketch_scale = scale
    index.node_sketch = node_sketch
    index.nbr_sketch = nbr_sketch
    index.routing = jax.device_put(routing, _shard_spec(mesh, None))
    return index


def build_sharded(
    x: np.ndarray,
    config: LeannConfig | None = None,
    mesh: Mesh | None = None,
    with_sketch: bool | None = None,
) -> ShardedIndex:
    """Partition `x` [N, d] by id range over the mesh's 'shards' axis and
    build every shard's graph simultaneously (one shard_map'd wave step per
    wave — all shards advance in lockstep; no cross-shard communication).

    `with_sketch` (default: config.sketch_build) derives per-shard inline
    neighbor sketches after the build for the gated search path."""
    config = config or LeannConfig()
    config.validate()
    if mesh is None:
        from islands_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    s_count = _shard_count(mesh)
    n = int(x.shape[0])
    d = int(x.shape[1])
    n_local = max(-(-n // s_count), config.m0 + 2)

    # Host-side shard prep: slice, pad, prep, per-shard level schedules.
    xs = np.zeros((s_count, n_local, d), dtype=np.float32)
    counts = np.zeros((s_count,), dtype=np.int32)
    gids = np.full((s_count, n_local), SENTINEL, dtype=np.int32)
    levels = np.zeros((s_count, n_local), dtype=np.int32)
    entries_all = np.zeros((s_count, n_local + 1), dtype=np.int32)
    for si in range(s_count):
        lo, hi = si * n_local, min((si + 1) * n_local, n)
        c = max(hi - lo, 0)
        counts[si] = c
        if c > 0:
            xs[si, :c] = np.asarray(x[lo:hi], dtype=np.float32)
            gids[si, :c] = np.arange(lo, hi, dtype=np.int32)
        lv = sample_levels(n_local, config.ml, config.max_layers, config.seed + si)
        levels[si] = lv
        # Mask padding rows out of the entry-point schedule (they have no
        # edges and zero vectors; an entry there would start searches in
        # garbage).
        lv_masked = lv.copy()
        lv_masked[c:] = -1
        entries_all[si] = _prefix_entries(lv_masked)

    xp = np.asarray(
        jax.vmap(lambda a: dist_ops.prep_corpus(a, config.metric))(jnp.asarray(xs))
    )

    m0 = config.m0
    bw = m0 + config.reverse_slack
    max_wave = min(config.wave_size, n_local)
    x_padded = np.pad(xp, ((0, 0), (0, max_wave), (0, 0)))

    shard3 = _shard_spec(mesh, None, None)
    shard2 = _shard_spec(mesh, None)
    shard1 = _shard_spec(mesh)
    x_dev = jax.device_put(x_padded, shard3)
    counts_dev = jax.device_put(counts, shard1)
    neighbors = jax.device_put(
        np.full((s_count, n_local, bw), SENTINEL, dtype=np.int32), shard3
    )
    degrees = jax.device_put(np.zeros((s_count, n_local), dtype=np.int32), shard2)

    # --- wave 0: per-shard brute-force kNN init ---
    w0 = min(n_local, max(2 * m0, min(config.wave_size, 4096)))
    k0 = min(m0, w0 - 1)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None), P(_shard_axes(mesh), None, None), P(_shard_axes(mesh))),
        out_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None)),
        check_vma=False,
    )
    def init_step(nbrs, degs, xl, count):
        nbrs, degs, xl, count = nbrs[0], degs[0], xl[0], count[0]
        if k0 > 0:
            xw = xl[:w0]
            d0 = dist_ops.pairwise_distance(xw, xw, config.metric)
            ids0 = jnp.arange(w0)
            bad = (
                jnp.eye(w0, dtype=bool)
                | (ids0[None, :] >= count)
                | (ids0[:, None] >= count)
            )
            d0 = jnp.where(bad, _INF, d0)
            negd, nbr0 = jax.lax.top_k(-d0, k0)
            ok0 = -negd < _INF
            nbr0 = jnp.where(ok0, nbr0, SENTINEL).astype(jnp.int32)
            nbrs = nbrs.at[:w0, :k0].set(nbr0)
            degs = degs.at[:w0].set(jnp.sum(ok0.astype(jnp.int32), axis=1))
        return nbrs[None], degs[None]

    neighbors, degrees = jax.jit(init_step)(neighbors, degrees, x_dev, counts_dev)

    # --- waves (same doubling schedule as the single-chip build) ---
    if w0 < n_local:
        neighbors, degrees = _run_waves(
            mesh, config, neighbors, degrees, x_dev, counts_dev,
            entries_all, w0, n_local, n_local, bw, max_wave,
        )

    # --- final sweep + crop per shard ---
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None), P(_shard_axes(mesh), None, None)),
        out_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None)),
        check_vma=False,
    )
    def sweep(nbrs, degs, xl):
        nb, dg, _ = _final_sweep(
            nbrs[0], degs[0], None, xl[0], m0, config.metric, config.diversify
        )
        return nb[None], dg[None]

    neighbors, degrees = jax.jit(sweep)(neighbors, degrees, x_dev)
    neighbors = neighbors[:, :, :m0]

    # Entry points: max-level node among the REAL rows of each shard (padding
    # rows have no edges and garbage vectors; entering there would pollute
    # results).
    entries = np.zeros((s_count,), dtype=np.int32)
    for si in range(s_count):
        c = max(int(counts[si]), 1)
        entries[si] = int(np.argmax(levels[si, :c]))
    index = ShardedIndex(
        neighbors=neighbors,
        degrees=degrees,
        entries=jax.device_put(entries, shard1),
        x_prepped=jax.device_put(xp, shard3),
        counts=counts_dev,
        gids=jax.device_put(gids, shard2),
        mesh=mesh,
        metric=config.metric,
        config=config,
    )
    if with_sketch is None:
        with_sketch = config.sketch_build and d >= proj_ops.PACK
    if with_sketch and d >= proj_ops.PACK:
        pdims = min(config.sketch_dims, d)
        pdims = max(pdims - pdims % proj_ops.PACK, proj_ops.PACK)
        _sharded_sketch(index, pdims, config.seed)
    return index


def _run_waves(
    mesh, config, neighbors, degrees, x_dev, counts_dev, entries_all,
    s_start, s_end, n_struct, bw, max_wave, start_per_shard=None,
):
    """Run lockstep construction waves on all shards, inserting cursor range
    [s_start, s_end) against structural size `n_struct`.

    Build path: `start_per_shard` is None — every shard's cursor equals the
    loop cursor and wave widths follow the doubling schedule, with per-wave
    entry points from `entries_all [S, >=s_end+1]`.
    Extend path: `start_per_shard [S]` offsets each shard's cursor (shards
    append at their own tails) and waves run at the constant bucketed
    `max_wave` so repeated extends reuse executables."""
    max_iters = 4 * max(config.ef_construction // config.expand_width, 1) + 16
    step_cache: dict[int, object] = {}
    shard1 = _shard_spec(mesh)
    s = s_start
    while s < s_end:
        if start_per_shard is None:
            wave = min(max_wave, 1 << max(8, s.bit_length() - 1))
        else:
            wave = max_wave
        if wave not in step_cache:
            body = functools.partial(
                wave_body,
                config=config,
                n=n_struct,
                wave=wave,
                buffer_width=bw,
                max_iters=max_iters,
            )

            def local_wave(nbrs, degs, entry, xl, count, start, _body=body):
                nb, dg, _ = _body(
                    nbrs[0], degs[0], None, start[0], entry[0], xl[0], count[0]
                )
                return nb[None], dg[None]

            step_cache[wave] = jax.jit(
                shard_map(
                    local_wave,
                    mesh=mesh,
                    in_specs=(
                        P(_shard_axes(mesh), None, None),
                        P(_shard_axes(mesh), None),
                        P(_shard_axes(mesh)),
                        P(_shard_axes(mesh), None, None),
                        P(_shard_axes(mesh)),
                        P(_shard_axes(mesh)),
                    ),
                    out_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None)),
                    check_vma=False,
                )
            )
        entry_wave = jax.device_put(entries_all[:, s].copy(), shard1)
        if start_per_shard is None:
            starts = np.full(entries_all.shape[0], s, dtype=np.int32)
        else:
            starts = (start_per_shard + s - s_start).astype(np.int32)
        neighbors, degrees = step_cache[wave](
            neighbors, degrees, entry_wave, x_dev, counts_dev,
            jax.device_put(starts, shard1),
        )
        s += wave
    return neighbors, degrees


def extend_sharded(
    index: ShardedIndex, new_x: np.ndarray
) -> ShardedIndex:
    """Balanced incremental append: new vectors are distributed across shards
    (emptiest-first), inserted by lockstep construction waves against each
    shard's existing graph, and assigned fresh global ids continuing from the
    current maximum. Structural sizes are power-of-two-bucketed so repeated
    extends reuse cached executables (the per-repo re-index hot path)."""
    config = index.config or LeannConfig(metric=index.metric)
    if config.m0 != int(index.neighbors.shape[2]):
        raise ValueError(
            f"config.m0={config.m0} does not match the index's max degree "
            f"{int(index.neighbors.shape[2])} (index loaded without its "
            "construction config?)"
        )
    s_count = index.num_shards
    n_new = int(new_x.shape[0])
    if n_new == 0:
        return index
    d = index.x_prepped.shape[-1]
    counts = np.asarray(index.counts).copy()
    old_n_local = index.n_local
    next_gid = int(np.max(np.asarray(index.gids))) + 1 if index.num_vectors else 0

    # Emptiest-first distribution.
    per_shard_new = np.zeros(s_count, dtype=np.int64)
    order = np.argsort(counts)
    base, rem = divmod(n_new, s_count)
    per_shard_new[:] = base
    per_shard_new[order[:rem]] += 1

    new_count_max = int(np.max(counts + per_shard_new))
    n_struct = max(_bucket_size(new_count_max), old_n_local)
    m0 = config.m0
    bw = m0 + config.reverse_slack
    max_wave = min(config.wave_size, _bucket_size(max(int(per_shard_new.max()), 1)))

    # Host-side re-pack: widen arrays to n_struct, append new rows at each
    # shard's tail, prep, assign global ids.
    xs = np.zeros((s_count, n_struct, d), dtype=np.float32)
    xs[:, :old_n_local] = np.asarray(index.x_prepped)
    gids = np.full((s_count, n_struct), SENTINEL, dtype=np.int32)
    gids[:, :old_n_local] = np.asarray(index.gids)
    new_counts = counts.copy()
    pos = 0
    xprep_new = np.asarray(
        dist_ops.prep_corpus(jnp.asarray(new_x, jnp.float32), index.metric)
    )
    for si in np.argsort(counts):
        take = int(per_shard_new[si])
        if take == 0:
            continue
        c = int(counts[si])
        xs[si, c : c + take] = xprep_new[pos : pos + take]
        gids[si, c : c + take] = np.arange(next_gid + pos, next_gid + pos + take)
        new_counts[si] = c + take
        pos += take

    nbrs_np = np.full((s_count, n_struct, bw), SENTINEL, dtype=np.int32)
    nbrs_np[:, :old_n_local, :m0] = np.asarray(index.neighbors)
    degs_np = np.zeros((s_count, n_struct), dtype=np.int32)
    degs_np[:, :old_n_local] = np.asarray(index.degrees)

    mesh = index.mesh
    shard3 = _shard_spec(mesh, None, None)
    shard2 = _shard_spec(mesh, None)
    shard1 = _shard_spec(mesh)
    x_dev = jax.device_put(
        np.pad(xs, ((0, 0), (0, max_wave), (0, 0))), shard3
    )
    counts_dev = jax.device_put(new_counts.astype(np.int32), shard1)
    neighbors = jax.device_put(nbrs_np, shard3)
    degrees = jax.device_put(degs_np, shard2)

    # Lockstep waves: shard si inserts its own range starting at counts[si];
    # entry points are each shard's existing entry for every wave.
    new_max = int(per_shard_new.max())
    entries_host = np.asarray(index.entries)
    entries_all = np.tile(entries_host[:, None], (1, new_max + 1))
    neighbors, degrees = _run_waves(
        mesh, config, neighbors, degrees, x_dev, counts_dev, entries_all,
        0, new_max, n_struct, bw, max_wave,
        start_per_shard=counts.astype(np.int32),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None), P(_shard_axes(mesh), None, None)),
        out_specs=(P(_shard_axes(mesh), None, None), P(_shard_axes(mesh), None)),
        check_vma=False,
    )
    def sweep(nbrs, degs, xl):
        nb, dg, _ = _final_sweep(
            nbrs[0], degs[0], None, xl[0], m0, config.metric, config.diversify
        )
        return nb[None], dg[None]

    neighbors, degrees = jax.jit(sweep)(neighbors, degrees, x_dev)

    out = ShardedIndex(
        neighbors=neighbors[:, :, :m0],
        degrees=degrees,
        entries=index.entries,
        x_prepped=jax.device_put(xs, shard3),
        counts=counts_dev,
        gids=jax.device_put(gids, shard2),
        mesh=mesh,
        metric=index.metric,
        config=config,
    )
    if index.has_sketch:
        _sharded_sketch(out, index.sketch_w.shape[1], config.seed)
    return out


#: process-wide executable cache: searchers over the same mesh/metric/params
#: share compilations regardless of which ShardedIndex instance they serve.
_ARCHIPELAGO_CACHE: dict[tuple, object] = {}


class ArchipelagoSearcher:
    """Mesh-wide search: per-shard beam search + all-gather top-k merge.

    Gates:
    - "exact": per-hop exact scoring over stored embeddings (round-1 path)
    - "sketch": two-level gated hop (inline neighbor sketches, exact
      rescoring of promotions) — requires the index's sketch state
    - recompute: pass `exact_scorer`+`exact_ctx` (per-shard provider ctx,
      leading axis = shards) to score by recomputation instead of stored
      rows; combine with gate="sketch" for the two-level LEANN deployment.
    """

    def __init__(self, index: ShardedIndex, exact_scorer=None, exact_ctx=None,
                 ctx_specs=None):
        self.index = index
        self.exact_scorer = exact_scorer or make_stored_scorer(index.metric)
        self.exact_ctx = exact_ctx if exact_ctx is not None else index.x_prepped
        # Per-leaf partition specs for exact_ctx: default = leading 'shards'
        # axis on every leaf. Recompute providers pass specs marking shared
        # leaves (e.g. encoder params) as replicated P().
        self.ctx_specs = (
            ctx_specs
            if ctx_specs is not None
            else jax.tree.map(_spec_like_for(index.mesh), self.exact_ctx)
        )
        self._cache = _ARCHIPELAGO_CACHE

    def _make(self, k: int, ef: int, expand_width: int, max_iters: int,
              gate: str, promote_width: int | None = None,
              static_loop: bool = False, final_rescore: int = 0,
              hop_merge: str = "inline"):
        idx = self.index
        mesh = idx.mesh
        metric = idx.metric
        scorer = self.exact_scorer
        dim = int(idx.x_prepped.shape[-1])
        ctx_specs = self.ctx_specs
        # ICI merge first ('shards'), then DCN ('slice') with only top-k.
        merge_axes = (
            ("shards", "slice") if "slice" in mesh.axis_names else ("shards",)
        )

        def _is_sharded(spec):
            if not len(spec):
                return False
            head = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
            return "shards" in head

        def slice_ctx(ctx):
            # Drop the leading shard axis of sharded leaves; replicated
            # leaves (spec without 'shards') pass through whole.
            return jax.tree.map(
                lambda a, spec: a[0] if _is_sharded(spec) else a,
                ctx, ctx_specs,
            )

        if gate == "sketch":
            promote = promote_width or max(8, min(2 * expand_width * 4, ef))

            def local_fn(q, nbrs, entry, ctx, gids, count,
                         node_sk, nbr_sk, routing, w, scale):
                nbrs, entry, gids, count = nbrs[0], entry[0], gids[0], count[0]
                node_sk, nbr_sk, routing = node_sk[0], nbr_sk[0], routing[0]
                ctx = slice_ctx(ctx)
                qs = proj_ops.sketch_query(q, w, scale)
                ents = route_entries(qs, routing, node_sk, metric)
                search = functools.partial(
                    _search_one_sketch_gated,
                    neighbors=nbrs,
                    nbr_sketch=nbr_sk,
                    node_sketch=node_sk,
                    exact_scorer=scorer,
                    metric=metric,
                    dim=dim,
                    ef=ef,
                    aq_width=max(ef, 64),
                    promote_width=promote,
                    expand_width=expand_width,
                    max_iters=max_iters,
                    static_iters=static_loop,
                    final_rescore=final_rescore,
                    hop_merge=hop_merge,
                )
                d_loc, i_loc, _ = jax.vmap(
                    lambda q1, s1, e1: search(q1, s1, ctx, scale, entry_point=e1)
                )(q, qs, ents)
                return _merge_topk(d_loc, i_loc, gids, count, k, merge_axes)

            in_specs = (
                P("dp", None),
                P(_shard_axes(mesh), None, None),
                P(_shard_axes(mesh)),
                ctx_specs,
                P(_shard_axes(mesh), None),
                P(_shard_axes(mesh)),
                P(_shard_axes(mesh), None, None),
                P(_shard_axes(mesh), None, None),
                P(_shard_axes(mesh), None),
                P(),
                P(),
            )
        elif idx.has_sketch:
            # Exact gate with per-query routed entries (the single-chip
            # StoredSearcher does the same): the sketch is used ONLY to pick
            # each query's nearest routing node — even sketches too noisy
            # for hop triage (e.g. dims=16 at 2M density) route entries
            # well, and a shorter approach phase is what lets capped
            # iteration counts keep recall (design.md §13, fact 26).
            def local_fn(q, nbrs, entry, ctx, gids, count,
                         node_sk, routing, w, scale):
                nbrs, gids, count = nbrs[0], gids[0], count[0]
                node_sk, routing = node_sk[0], routing[0]
                ctx = slice_ctx(ctx)
                qs = proj_ops.sketch_query(q, w, scale)
                ents = route_entries(qs, routing, node_sk, metric)
                search = functools.partial(
                    _search_one,
                    neighbors=nbrs,
                    scorer=scorer,
                    ef=ef,
                    expand_width=expand_width,
                    max_iters=max_iters,
                )
                d_loc, i_loc = jax.vmap(
                    lambda qi, e1: search(qi, ctx, entry_point=e1)
                )(q, ents)
                return _merge_topk(d_loc, i_loc, gids, count, k, merge_axes)

            in_specs = (
                P("dp", None),
                P(_shard_axes(mesh), None, None),
                P(_shard_axes(mesh)),
                ctx_specs,
                P(_shard_axes(mesh), None),
                P(_shard_axes(mesh)),
                P(_shard_axes(mesh), None, None),
                P(_shard_axes(mesh), None),
                P(),
                P(),
            )
        else:

            def local_fn(q, nbrs, entry, ctx, gids, count):
                nbrs, entry, gids, count = nbrs[0], entry[0], gids[0], count[0]
                ctx = slice_ctx(ctx)
                search = functools.partial(
                    _search_one,
                    neighbors=nbrs,
                    entry_point=entry,
                    scorer=scorer,
                    ef=ef,
                    expand_width=expand_width,
                    max_iters=max_iters,
                )
                d_loc, i_loc = jax.vmap(lambda qi: search(qi, ctx))(q)
                return _merge_topk(d_loc, i_loc, gids, count, k, merge_axes)

            in_specs = (
                P("dp", None),
                P(_shard_axes(mesh), None, None),
                P(_shard_axes(mesh)),
                ctx_specs,
                P(_shard_axes(mesh), None),
                P(_shard_axes(mesh)),
            )

        # check_vma=False: the search carry mixes axes (graph varies over
        # 'shards', queries over 'dp'), which the varying-manual-axes checker
        # can't express for the while_loop carry; out_specs are still honored.
        return jax.jit(
            shard_map(
                local_fn,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(P("dp", None), P("dp", None)),
                check_vma=False,
            )
        )

    def search(
        self,
        queries: Array,
        k: int = 10,
        ef: int = 64,
        expand_width: int = 4,
        max_iters: int | None = None,
        gate: str = "auto",
        promote_width: int | None = None,
        static_loop: bool = False,
        final_rescore: int = 0,
        hop_merge: str = "inline",
    ) -> tuple[Array, Array]:
        """queries [B, d] -> (dists [B, k], ids [B, k]) with global ids.
        B must be divisible by the mesh 'dp' axis size. `promote_width`
        (sketch gate) caps per-hop exact scoring per shard — same knob as
        StoredSearcher/LeannIndex (design.md #13). `static_loop` runs the
        sketch-gated hop loop as a fixed-trip scan (search._run_hops).
        `final_rescore` (sketch gate) exact-rescores that many AQ heads
        once per shard after the loop, before the cross-shard merge —
        same knob as StoredSearcher (design.md §21)."""
        idx = self.index
        ef = max(ef, k)
        if gate == "auto":
            gate = "sketch" if idx.has_sketch else "exact"
        if gate == "sketch" and not idx.has_sketch:
            raise ValueError("index has no sketch state (gate='sketch')")
        if max_iters is None and idx.config is not None:
            # Config-level operating-point default (design.md §13);
            # per-call argument wins.
            max_iters = idx.config.max_search_iters
        if max_iters is None:
            if gate == "sketch":
                promote = promote_width or max(8, min(2 * expand_width * 4, ef))
                max_iters = 8 * max(ef // promote, 1) + 32
            else:
                max_iters = 4 * max(ef // max(expand_width, 1), 1) + 16
        # dim is baked into the sketch gate as a static calibration constant
        # (_make closes over it) — it must be part of the cache key or a
        # second index with a different dim would silently reuse the wrong
        # calibration.
        # has_sketch is part of the key: the exact gate compiles a routed
        # variant (extra sketch operands) when sketch state exists, and the
        # cache is shared across searcher instances.
        key = (idx.mesh, idx.metric, self.exact_scorer, k, ef, expand_width,
               max_iters, gate, int(idx.x_prepped.shape[-1]), idx.has_sketch,
               promote_width, static_loop, final_rescore, hop_merge)
        if key not in self._cache:
            self._cache[key] = self._make(k, ef, expand_width, max_iters,
                                          gate, promote_width, static_loop,
                                          final_rescore, hop_merge)
        qp = dist_ops.prep_query(jnp.asarray(queries), idx.metric)
        if gate == "sketch":
            return self._cache[key](
                qp, idx.neighbors, idx.entries, self.exact_ctx, idx.gids,
                idx.counts, idx.node_sketch, idx.nbr_sketch, idx.routing,
                idx.sketch_w, idx.sketch_scale,
            )
        if idx.has_sketch:  # exact gate with sketch-routed entries
            return self._cache[key](
                qp, idx.neighbors, idx.entries, self.exact_ctx, idx.gids,
                idx.counts, idx.node_sketch, idx.routing,
                idx.sketch_w, idx.sketch_scale,
            )
        return self._cache[key](
            qp, idx.neighbors, idx.entries, self.exact_ctx, idx.gids, idx.counts
        )


def _merge_topk(d_loc, i_loc, gids, count, k, axes=("shards",)):
    """Mask padding, map to global ids, then hierarchically merge: all-gather
    per-shard top-k over each shard axis in turn and re-top-k
    (MultiIndexSearcher merge, search.rs:185-254, on device). For multi-slice
    meshes `axes` is ("shards", "slice"): the 'shards' merge rides ICI and
    only k results per query ever cross the DCN 'slice' axis."""
    d_loc, i_loc = d_loc[:, :k], i_loc[:, :k]
    valid = (i_loc >= 0) & (i_loc < count)
    d = jnp.where(valid, d_loc, _INF)
    n_l = gids.shape[0]
    i = jnp.where(valid, gids[jnp.clip(i_loc, 0, n_l - 1)], SENTINEL)
    for ax in axes:
        dg = jax.lax.all_gather(d, ax)  # [A, b, k]
        ig = jax.lax.all_gather(i, ax)
        a_cnt = dg.shape[0]
        dflat = dg.transpose(1, 0, 2).reshape(-1, a_cnt * k)
        iflat = ig.transpose(1, 0, 2).reshape(-1, a_cnt * k)
        neg, pos = jax.lax.top_k(-dflat, k)
        d = -neg
        i = jnp.take_along_axis(iflat, pos, axis=1)
    return d, i


# ---------------------------------------------------------------------------
# Persistence (tagged-chunk container, matching core/storage.py framing)
# ---------------------------------------------------------------------------


def save_sharded(index: ShardedIndex, path) -> int:
    """Serialize a ShardedIndex (graphs + corpus + gids + sketch state).
    The mesh is NOT stored — pass one at load time (topology is a runtime
    property, not index data)."""
    from pathlib import Path

    from islands_tpu.core.storage import IndexWriter

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    buf = io.BytesIO()
    w = IndexWriter(buf)
    header = {
        "version": 1,
        "num_shards": index.num_shards,
        "n_local": index.n_local,
        "m0": int(index.neighbors.shape[2]),
        "dim": int(index.x_prepped.shape[-1]),
        "metric": getattr(index.metric, "value", str(index.metric)),
        "has_sketch": bool(index.has_sketch),
    }
    if index.config is not None:
        import dataclasses as _dc

        cfg = _dc.asdict(index.config)
        cfg["metric"] = getattr(index.config.metric, "value", str(index.config.metric))
        cfg["pruning_strategy"] = getattr(
            index.config.pruning_strategy, "value",
            str(index.config.pruning_strategy),
        )
        header["config"] = cfg
    w.write_chunk(b"SHRD", json.dumps(header).encode())

    def arr_chunk(tag, a, dt):
        w.write_chunk(tag, np.ascontiguousarray(np.asarray(a), dtype=dt).tobytes())

    arr_chunk(b"NBRS", index.neighbors, "<i4")
    arr_chunk(b"DEGS", index.degrees, "<i4")
    arr_chunk(b"ENTR", index.entries, "<i4")
    arr_chunk(b"CNTS", index.counts, "<i4")
    arr_chunk(b"GIDS", index.gids, "<i4")
    arr_chunk(b"EMBS", index.x_prepped, "<f4")
    if index.has_sketch:
        arr_chunk(b"SKW_", index.sketch_w, "<f4")
        w.write_chunk(b"SKSC", struct.pack("<f", float(index.sketch_scale)))
        arr_chunk(b"SKND", index.node_sketch, "<i4")
        arr_chunk(b"SKNB", index.nbr_sketch, "<i4")
        arr_chunk(b"SKRT", index.routing, "<i4")
    data = buf.getvalue()
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)
    return len(data)


def load_sharded(path, mesh: Mesh | None = None) -> ShardedIndex:
    """Load a ShardedIndex onto `mesh` (shard count must match)."""
    from pathlib import Path

    from islands_tpu.core.storage import IndexReader, StorageError

    if mesh is None:
        from islands_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    data = Path(path).read_bytes()
    chunks = IndexReader(io.BytesIO(data)).read_all()
    if b"SHRD" not in chunks:
        raise StorageError("missing SHRD header chunk")
    h = json.loads(chunks[b"SHRD"])
    s, n_l, m0, d = h["num_shards"], h["n_local"], h["m0"], h["dim"]
    if _shard_count(mesh) != s:
        raise StorageError(
            f"index has {s} shards, mesh has {_shard_count(mesh)}"
        )

    def arr(tag, dt, shape):
        return np.frombuffer(chunks[tag], dtype=dt).reshape(shape).copy()

    shard3 = _shard_spec(mesh, None, None)
    shard2 = _shard_spec(mesh, None)
    shard1 = _shard_spec(mesh)
    config = None
    if h.get("config"):
        import dataclasses as _dc

        from islands_tpu.core.config import PruningStrategy

        cfg_dict = dict(h["config"])
        cfg_dict["metric"] = DistanceMetric(cfg_dict.get("metric", "cosine"))
        cfg_dict["pruning_strategy"] = PruningStrategy(
            cfg_dict.get("pruning_strategy", "global")
        )
        known = {f.name for f in _dc.fields(LeannConfig)}
        config = LeannConfig(
            **{k: v for k, v in cfg_dict.items() if k in known}
        )
    index = ShardedIndex(
        neighbors=jax.device_put(arr(b"NBRS", "<i4", (s, n_l, m0)), shard3),
        degrees=jax.device_put(arr(b"DEGS", "<i4", (s, n_l)), shard2),
        entries=jax.device_put(arr(b"ENTR", "<i4", (s,)), shard1),
        x_prepped=jax.device_put(arr(b"EMBS", "<f4", (s, n_l, d)), shard3),
        counts=jax.device_put(arr(b"CNTS", "<i4", (s,)), shard1),
        gids=jax.device_put(arr(b"GIDS", "<i4", (s, n_l)), shard2),
        mesh=mesh,
        metric=DistanceMetric(h["metric"]),
        config=config,
    )
    if h.get("has_sketch"):
        wmat = arr(b"SKW_", "<f4", (d, -1))
        p = wmat.shape[1]
        index.sketch_w = jnp.asarray(wmat)
        (sc,) = struct.unpack("<f", chunks[b"SKSC"])
        index.sketch_scale = jnp.float32(sc)
        index.node_sketch = jax.device_put(
            arr(b"SKND", "<i4", (s, n_l, p // proj_ops.PACK)), shard3
        )
        index.nbr_sketch = jax.device_put(
            arr(b"SKNB", "<i4", (s, n_l, m0 * (p // proj_ops.PACK))), shard3
        )
        index.routing = jax.device_put(arr(b"SKRT", "<i4", (s, -1)), shard2)
    return index
