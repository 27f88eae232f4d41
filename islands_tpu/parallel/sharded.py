"""Sharded "archipelago" index: corpus partitioned by id range across a mesh.

New capability with no reference equivalent (the reference scales by running
multiple k8s pods over a shared filesystem, README.md:135-170; SURVEY.md §2.7)
— here sharding is native jax.sharding:

- build: each shard constructs its own proximity graph from its id-range slice
  of the corpus; waves run on all shards simultaneously under shard_map (pure
  data parallelism over ICI — construction needs no cross-shard traffic).
- search: every shard beam-searches its local graph for all queries, then the
  per-shard top-k are all-gathered and merged to a global top-k (the on-device
  equivalent of the reference's MultiIndexSearcher merge, search.rs:185-254).
- an optional "dp" mesh axis shards the query batch for throughput.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from islands_tpu.core.build import _prefix_entries, sample_levels, wave_body, _final_sweep
from islands_tpu.core.config import DistanceMetric, LeannConfig
from islands_tpu.core.csr import SENTINEL
from islands_tpu.core.search import _search_one, make_stored_scorer
from islands_tpu.ops import distance as dist_ops

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
    offsets: Array  # [S] int32 global id offset per shard
    mesh: Mesh
    metric: DistanceMetric

    @property
    def num_shards(self) -> int:
        return self.neighbors.shape[0]

    @property
    def n_local(self) -> int:
        return self.neighbors.shape[1]


def _shard_spec(mesh: Mesh, *rest: None) -> NamedSharding:
    return NamedSharding(mesh, P("shards", *rest))


def build_sharded(
    x: np.ndarray,
    config: LeannConfig | None = None,
    mesh: Mesh | None = None,
) -> ShardedIndex:
    """Partition `x` [N, d] by id range over the mesh's 'shards' axis and
    build every shard's graph simultaneously (one shard_map'd wave step per
    wave — all shards advance in lockstep; no cross-shard communication)."""
    config = config or LeannConfig()
    config.validate()
    if mesh is None:
        from islands_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    s_count = mesh.shape["shards"]
    n = int(x.shape[0])
    d = int(x.shape[1])
    n_local = max(-(-n // s_count), config.m0 + 2)

    # Host-side shard prep: slice, pad, prep, per-shard level schedules.
    xs = np.zeros((s_count, n_local, d), dtype=np.float32)
    counts = np.zeros((s_count,), dtype=np.int32)
    levels = np.zeros((s_count, n_local), dtype=np.int32)
    entries_all = np.zeros((s_count, n_local + 1), dtype=np.int32)
    for si in range(s_count):
        lo, hi = si * n_local, min((si + 1) * n_local, n)
        c = max(hi - lo, 0)
        counts[si] = c
        if c > 0:
            xs[si, :c] = np.asarray(x[lo:hi], dtype=np.float32)
        lv = sample_levels(n_local, config.ml, config.max_layers, config.seed + si)
        levels[si] = lv
        entries_all[si] = _prefix_entries(lv)

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
        in_specs=(P("shards", None, None), P("shards", None), P("shards", None, None), P("shards")),
        out_specs=(P("shards", None, None), P("shards", None)),
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
        max_iters = 4 * max(config.ef_construction // config.expand_width, 1) + 16
        step_cache: dict[int, object] = {}
        s = w0
        while s < n_local:
            wave = min(max_wave, 1 << max(8, s.bit_length() - 1))
            if wave not in step_cache:
                body = functools.partial(
                    wave_body,
                    config=config,
                    n=n_local,
                    wave=wave,
                    buffer_width=bw,
                    max_iters=max_iters,
                )

                def local_wave(nbrs, degs, entry, xl, count, start, _body=body):
                    nb, dg, _ = _body(
                        nbrs[0], degs[0], None, start, entry[0], xl[0], count[0]
                    )
                    return nb[None], dg[None]

                step_cache[wave] = jax.jit(
                    shard_map(
                        local_wave,
                        mesh=mesh,
                        in_specs=(
                            P("shards", None, None),
                            P("shards", None),
                            P("shards"),
                            P("shards", None, None),
                            P("shards"),
                            P(),
                        ),
                        out_specs=(P("shards", None, None), P("shards", None)),
                        check_vma=False,
                    )
                )
            entry_wave = jax.device_put(entries_all[:, s].copy(), shard1)
            neighbors, degrees = step_cache[wave](
                neighbors, degrees, entry_wave, x_dev, counts_dev, jnp.int32(s)
            )
            s += wave

    # --- final sweep + crop per shard ---
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("shards", None, None), P("shards", None), P("shards", None, None)),
        out_specs=(P("shards", None, None), P("shards", None)),
        check_vma=False,
    )
    def sweep(nbrs, degs, xl):
        nb, dg, _ = _final_sweep(
            nbrs[0], degs[0], None, xl[0], m0, config.metric, config.diversify
        )
        return nb[None], dg[None]

    neighbors, degrees = jax.jit(sweep)(neighbors, degrees, x_dev)
    neighbors = neighbors[:, :, :m0]

    # Entry points: final prefix entry per shard (host-known).
    entries = np.array([entries_all[si, n_local] for si in range(s_count)], dtype=np.int32)
    offsets = (np.arange(s_count, dtype=np.int32) * n_local).astype(np.int32)
    return ShardedIndex(
        neighbors=neighbors,
        degrees=degrees,
        entries=jax.device_put(entries, shard1),
        x_prepped=jax.device_put(xp, shard3),
        counts=counts_dev,
        offsets=jax.device_put(offsets, shard1),
        mesh=mesh,
        metric=config.metric,
    )


#: process-wide executable cache: searchers over the same mesh/metric/params
#: share compilations regardless of which ShardedIndex instance they serve.
_ARCHIPELAGO_CACHE: dict[tuple, object] = {}


class ArchipelagoSearcher:
    """Mesh-wide search: per-shard beam search + all-gather top-k merge."""

    def __init__(self, index: ShardedIndex):
        self.index = index
        self._cache = _ARCHIPELAGO_CACHE

    def _make(self, k: int, ef: int, expand_width: int, max_iters: int):
        idx = self.index
        mesh = idx.mesh
        metric = idx.metric

        def local_fn(q, nbrs, entry, xl, offset):
            nbrs, entry, xl, offset = nbrs[0], entry[0], xl[0], offset[0]
            scorer = make_stored_scorer(metric)
            search = functools.partial(
                _search_one,
                neighbors=nbrs,
                entry_point=entry,
                scorer=scorer,
                ef=ef,
                expand_width=expand_width,
                max_iters=max_iters,
            )
            d_loc, i_loc = jax.vmap(lambda qi: search(qi, xl))(q)
            d_loc, i_loc = d_loc[:, :k], i_loc[:, :k]
            i_glob = jnp.where(i_loc >= 0, i_loc + offset, SENTINEL)
            # Merge across shards: all-gather per-shard top-k, re-top-k.
            dg = jax.lax.all_gather(d_loc, "shards")  # [S, b, k]
            ig = jax.lax.all_gather(i_glob, "shards")
            s_cnt = dg.shape[0]
            dflat = dg.transpose(1, 0, 2).reshape(-1, s_cnt * k)
            iflat = ig.transpose(1, 0, 2).reshape(-1, s_cnt * k)
            neg, pos = jax.lax.top_k(-dflat, k)
            return -neg, jnp.take_along_axis(iflat, pos, axis=1)

        # check_vma=False: the search carry mixes axes (graph varies over
        # 'shards', queries over 'dp'), which the varying-manual-axes checker
        # can't express for the while_loop carry; out_specs are still honored.
        return jax.jit(
            shard_map(
                local_fn,
                mesh=mesh,
                in_specs=(
                    P("dp", None),
                    P("shards", None, None),
                    P("shards"),
                    P("shards", None, None),
                    P("shards"),
                ),
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
    ) -> tuple[Array, Array]:
        """queries [B, d] -> (dists [B, k], ids [B, k]) with global ids.
        B must be divisible by the mesh 'dp' axis size."""
        ef = max(ef, k)
        if max_iters is None:
            max_iters = 4 * max(ef // max(expand_width, 1), 1) + 16
        key = (self.index.mesh, self.index.metric, k, ef, expand_width, max_iters)
        if key not in self._cache:
            self._cache[key] = self._make(k, ef, expand_width, max_iters)
        qp = dist_ops.prep_query(jnp.asarray(queries), self.index.metric)
        return self._cache[key](
            qp,
            self.index.neighbors,
            self.index.entries,
            self.index.x_prepped,
            self.index.offsets,
        )
