"""Multi-layer HNSW index with stored embeddings.

Reference: `HnswGraph` (src/core/hnsw.rs) — the reference's production search
path (its indexer searches HnswGraph, not LeannIndex; SURVEY.md §2.1). Classic
HNSW: geometric layer assignment, greedy descent through upper layers, ef-beam
at layer 0, full vectors stored per node.

TPU-native reformulation: each layer is an independent padded neighbor matrix
over the (compacted) subset of nodes reaching that layer. Construction reuses
the wave-batched pipeline (core/build.py) per layer; upper layers hold
n/m^l nodes so their builds are cheap. Search is a batched greedy descent
(one `lax.while_loop` per layer moving a [B] cursor) followed by the batched
layer-0 beam (core/search.py) with per-query entry points — replacing the
reference's per-node HashMap walk (hnsw.rs:214-504).

`extend` gives batched incremental insertion (the reference inserts one node
at a time in its indexer hot loop, service.rs:610-676; here appends run as
construction waves against the existing layer-0 graph).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from islands_tpu.core import build as build_mod
from islands_tpu.core.config import DistanceMetric, HnswConfig
from islands_tpu.core.csr import SENTINEL, CsrGraph
from islands_tpu.ops import distance as dist_ops

Array = jax.Array
_INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("metric", "max_hops"))
def _greedy_descend(
    q: Array,
    neighbors: Array,
    x_local: Array,
    cur: Array,
    metric: DistanceMetric,
    max_hops: int = 64,
) -> Array:
    """Batched greedy walk: move each query's cursor to its best neighbor
    until no improvement (reference: layer>0 search with ef=1,
    hnsw.rs:470-483). q [B, d] prepped, cur [B] local ids -> [B] local ids."""
    n, m = neighbors.shape

    def score(ids: Array, valid: Array) -> Array:
        rows = x_local[jnp.clip(ids, 0, n - 1)]
        d = jax.vmap(
            lambda qi, ri: dist_ops.rowwise_distance(qi, ri, metric)
        )(q, rows)
        return jnp.where(valid, d, _INF)

    cur_d = score(cur[:, None], jnp.ones_like(cur[:, None], dtype=bool))[:, 0]

    def cond(state):
        _, _, improved, it = state
        return improved & (it < max_hops)

    def body(state):
        cur, cur_d, _, it = state
        rows = neighbors[jnp.clip(cur, 0, n - 1)]  # [B, m]
        d = score(rows, rows != SENTINEL)  # [B, m]
        best = jnp.min(d, axis=1)
        best_j = jnp.argmin(d, axis=1)
        best_id = jnp.take_along_axis(rows, best_j[:, None], axis=1)[:, 0]
        better = best < cur_d
        new_cur = jnp.where(better, best_id, cur)
        new_d = jnp.where(better, best, cur_d)
        return new_cur, new_d, jnp.any(better), it + 1

    cur, _, _, _ = jax.lax.while_loop(cond, body, (cur, cur_d, jnp.bool_(True), jnp.int32(0)))
    return cur


class HnswLayer:
    """One layer: compacted node subset with local-id neighbor matrix.

    Device copies of ids/g2l and the gathered layer embeddings are cached at
    build time so search-time greedy descent is pure compute (no per-query
    host->device uploads or re-gathers)."""

    def __init__(self, ids: np.ndarray, neighbors: Array, g2l: np.ndarray,
                 x_local: Array):
        self.ids = ids  # [n_l] local -> global (host)
        self.neighbors = neighbors  # [n_l, m_l] local ids
        self.g2l = g2l  # [N] global -> local (SENTINEL if absent; host)
        self.ids_dev = jnp.asarray(ids)
        self.g2l_dev = jnp.asarray(g2l)
        self.x_local = x_local  # [n_l, d] prepped layer embeddings


class HnswIndex:
    """Multi-layer HNSW over stored embeddings (reference HnswGraph,
    hnsw.rs:128-514)."""

    def __init__(self, config: HnswConfig | None = None):
        self.config = config or HnswConfig()
        self.config.validate()
        self.x: Array | None = None  # prepped corpus [N, d]
        self.levels: np.ndarray | None = None
        self.layers: list[HnswLayer] = []  # index 1.. = upper layers
        self.layer0: CsrGraph | None = None
        self.entry_point: int = SENTINEL
        self.max_level: int = 0
        self.dimension: int | None = None
        self._jit_cache: dict = {}

    # -- introspection ------------------------------------------------------

    @property
    def num_nodes(self) -> int:
        return 0 if self.x is None else self.x.shape[0]

    @property
    def is_empty(self) -> bool:
        return self.num_nodes == 0

    def get_vector(self, node_id: int) -> np.ndarray:
        """Stored (prepped) vector for a node (reference: HnswNode.vector)."""
        return np.asarray(self.x[node_id])

    # -- build --------------------------------------------------------------

    def build(self, x, levels: np.ndarray | None = None) -> "HnswIndex":
        """Build all layers from embeddings [N, d]."""
        x = jnp.asarray(x, dtype=jnp.float32)
        n = int(x.shape[0])
        self.dimension = int(x.shape[1]) if x.ndim == 2 else None
        self.x = dist_ops.prep_corpus(x, self.config.metric)
        if n == 0:
            self.levels = np.zeros(0, dtype=np.int32)
            self.layer0 = CsrGraph.empty(0, self.config.m0)
            self.entry_point = SENTINEL
            return self
        if levels is None:
            levels = build_mod.sample_levels(
                n, self.config.ml, self.config.max_layers, self.config.seed
            )
        self.levels = np.asarray(levels, dtype=np.int32)
        self.max_level = int(self.levels.max())
        self.entry_point = int(np.argmax(self.levels == self.max_level))

        # Layer 0: flat wave build over the full corpus (levels all zero so
        # the sub-build doesn't recurse into its own hierarchy).
        cfg0 = self.config.to_leann(0)
        self.layer0 = build_mod.build_index(
            self.x, cfg0, levels=np.zeros(n, dtype=np.int32)
        )
        # Upper layers: compacted subsets.
        self.layers = []
        for lvl in range(1, self.max_level + 1):
            ids = np.where(self.levels >= lvl)[0].astype(np.int32)
            self.layers.append(self._build_layer(ids, lvl))
        self._jit_cache.clear()
        return self

    def _build_layer(self, ids: np.ndarray, lvl: int) -> HnswLayer:
        n = self.num_nodes
        g2l = np.full(n, SENTINEL, dtype=np.int32)
        g2l[ids] = np.arange(len(ids), dtype=np.int32)
        x_l = self.x[jnp.asarray(ids)]
        cfg = self.config.to_leann(lvl)
        if len(ids) <= 1:
            nbrs = jnp.full((max(len(ids), 1), cfg.m0), SENTINEL, dtype=jnp.int32)
            return HnswLayer(ids, nbrs[: len(ids)], g2l, x_l)
        g = build_mod.build_index(x_l, cfg, levels=np.zeros(len(ids), dtype=np.int32))
        return HnswLayer(ids, g.neighbors, g2l, x_l)

    def extend(self, new_x) -> "HnswIndex":
        """Batched incremental insert: append vectors and run construction
        waves against the existing layer-0 graph; upper layers (tiny) are
        rebuilt. Replaces the reference's per-vector `insert`
        (hnsw.rs:214-251) with the TPU-shaped batch equivalent."""
        new_x = jnp.asarray(new_x, dtype=jnp.float32)
        if self.is_empty:
            return self.build(new_x)
        n_old = self.num_nodes
        n_new = int(new_x.shape[0])
        if n_new == 0:
            return self
        cfg0 = self.config.to_leann(0)
        x_all = jnp.concatenate([self.x, dist_ops.prep_corpus(new_x, self.config.metric)])
        new_levels = build_mod.sample_levels(
            n_new, self.config.ml, self.config.max_layers, self.config.seed + n_old
        )
        self.levels = np.concatenate([self.levels, new_levels])

        # Bucketed wave-append against the existing layer-0 graph: repeated
        # extends within a structural bucket reuse cached executables.
        neighbors, degrees = build_mod.extend_graph(
            self.layer0.neighbors, self.layer0.degrees, x_all, n_old, cfg0,
            self.entry_point,
        )
        m0 = cfg0.m0
        self.x = x_all
        # Recompute entry metadata from the merged levels BEFORE constructing
        # the graph so layer0's entry_point/max_level match its levels.
        self.max_level = int(self.levels.max())
        self.entry_point = int(np.argmax(self.levels == self.max_level))
        self.layer0 = CsrGraph(
            neighbors=neighbors,
            degrees=degrees,
            levels=jnp.asarray(self.levels),
            entry_point=jnp.int32(self.entry_point),
            max_level=jnp.int32(self.max_level),
        )
        # Upper layers: rebuild from scratch (n/m^l nodes — cheap).
        self.layers = [
            self._build_layer(
                np.where(self.levels >= lvl)[0].astype(np.int32), lvl
            )
            for lvl in range(1, self.max_level + 1)
        ]
        self._jit_cache.clear()
        return self

    # -- search -------------------------------------------------------------

    def search(
        self,
        queries,
        k: int = 10,
        ef: int = 100,
        expand_width: int = 4,
        max_iters: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched hierarchical search: greedy descent through upper layers,
        ef-beam at layer 0 (reference: hnsw.rs:458-504). queries [B, d] or [d]
        -> (dists, ids) ascending."""
        q = jnp.asarray(queries, dtype=jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        if self.is_empty:
            b = q.shape[0]
            out = np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
            return (out[0][0], out[1][0]) if single else out
        ef = max(ef, k)
        qp = dist_ops.prep_query(q, self.config.metric)
        b = qp.shape[0]

        # Greedy descent: global cursor through upper layers.
        cur_global = jnp.full((b,), self.entry_point, dtype=jnp.int32)
        for layer in reversed(self.layers):  # top layer last in list
            cur_local = layer.g2l_dev[cur_global]
            # Entry is guaranteed present in every upper layer on the path
            # (entry_point has max level). Safe-guard anyway.
            cur_local = jnp.maximum(cur_local, 0)
            cur_local = _greedy_descend(
                qp, layer.neighbors, layer.x_local, cur_local, self.config.metric
            )
            cur_global = layer.ids_dev[cur_local]

        # Layer-0 beam with per-query entry points.
        from islands_tpu.core.search import batched_search, default_max_iters, make_stored_scorer

        if max_iters is None:
            max_iters = default_max_iters(ef, expand_width)
        dists, ids = batched_search(
            qp, self.x, self.layer0.neighbors, cur_global,
            scorer=make_stored_scorer(self.config.metric),
            ef=ef, expand_width=expand_width, max_iters=max_iters,
        )
        dists, ids = np.asarray(dists[:, :k]), np.asarray(ids[:, :k])
        return (dists[0], ids[0]) if single else (dists, ids)
