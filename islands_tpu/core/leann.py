"""LEANN index: graph-only storage + recompute search + two-level PQ gating.

The facade mirroring the reference's `LeannIndex` (src/core/leann.rs:463-1066):
build a proximity graph from an embedding provider, drop the embeddings, and
answer queries by recomputing embeddings on the fly during best-first search.
Adds the two-level PQ-gated search the reference only specifies
(docs/leann-specification.md:223-271; its Rust core never wires PQ into
search, see SURVEY.md §2.1 "critical wiring fact").

TPU-native shape: construction is the wave-batched device pipeline
(core/build.py), search the fixed-width batched beam (core/search.py), and
the provider a jittable id->embedding function fused into the loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from islands_tpu.core import build as build_mod
from islands_tpu.core.config import LeannConfig, PQConfig
from islands_tpu.core.csr import CsrGraph
from islands_tpu.core.embedding import (
    EmbeddingProvider,
    InMemoryEmbeddingProvider,
    materialize_embeddings,
)
from islands_tpu.core.pq import (
    ProductQuantizer,
    gated_block_scorer_for,
    gated_prep_for,
)
from islands_tpu.core.search import (
    batched_search,
    batched_two_level_search,
    default_max_iters,
    make_prune_fn,
    make_recompute_scorer,
)
from islands_tpu.ops import distance as dist_ops

Array = jax.Array


class IndexNotBuilt(RuntimeError):
    """Search before build (reference: CoreError::IndexNotBuilt)."""


class DimensionMismatch(ValueError):
    """Query/provider dimension mismatch (reference: CoreError::DimensionMismatch)."""


class LeannIndex:
    """Graph-only ANN index with on-the-fly embedding recomputation.

    Storage contract (leann.rs:54-57): after `build`, only the CSR graph (and
    optional PQ codes) persist — O(n*M) int32 edges, no [n, d] float matrix.
    """

    def __init__(self, config: LeannConfig | None = None):
        self.config = config or LeannConfig()
        self.config.validate()
        self.graph: CsrGraph | None = None
        self.dimension: int | None = None
        self.pq: ProductQuantizer | None = None
        self.pq_codes: Array | None = None
        self.sketch = None  # ops/proj.SketchIndex from construction
        self.last_recompute_fraction: float | None = None
        self._routing: Array | None = None
        # Inline neighbor-code blocks [N, m0*S] u8 for the two-level hop
        # (pq.build_inline_codes) — derived from (graph, pq_codes), never
        # persisted; cache keyed on both shapes so build/extend invalidate.
        self._nbr_codes: Array | None = None
        self._nbr_codes_key = None

    # -- introspection (reference: leann.rs:836-856) -----------------------

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes if self.graph is not None else 0

    @property
    def is_empty(self) -> bool:
        return self.num_nodes == 0

    def storage_bytes(self) -> int:
        """Graph (+ PQ) bytes — the 'index bytes/vector' metric
        (reference: leann.rs:295-301 + pq codes)."""
        total = self.graph.storage_bytes() if self.graph is not None else 0
        if self.pq is not None and self.pq_codes is not None:
            total += self.pq.storage_bytes(self.num_nodes)
        if self.sketch is not None:
            # Only the per-node sketch table is storage; the inline neighbor
            # blocks are derived from it + the graph at load time.
            total += 4 * self.sketch.node_sketch.size + 4 * self.sketch.w.size + 4
        return total

    # -- build (reference: leann.rs:560-631) -------------------------------

    def build(
        self,
        provider: EmbeddingProvider,
        num_vectors: int | None = None,
        with_pq: PQConfig | None = None,
    ) -> "LeannIndex":
        """Build the graph from `provider`'s first `num_vectors` embeddings.

        Embeddings are materialized only for the duration of construction
        (and PQ training when `with_pq` is given), then dropped.
        """
        n = num_vectors if num_vectors is not None else provider.num_items
        self.dimension = provider.dimension
        if n == 0:
            self.graph = CsrGraph.empty(0, self.config.m0)
            return self
        x = materialize_embeddings(provider, n)
        self.graph, self.sketch = build_mod.build_index_with_sketch(x, self.config)
        self._init_routing()
        if with_pq is not None:
            self._train_pq(x, with_pq)
        del x
        return self

    def build_from_embeddings(
        self, x, with_pq: PQConfig | None = None
    ) -> "LeannIndex":
        """Convenience: build from an [n, d] array (wraps it in an in-memory
        provider for the temp-embedding pass)."""
        x = jnp.asarray(x, dtype=jnp.float32)
        self.dimension = int(x.shape[1]) if x.ndim == 2 else None
        self.graph, self.sketch = build_mod.build_index_with_sketch(x, self.config)
        self._init_routing()
        if with_pq is not None:
            self._train_pq(x, with_pq)
        return self

    def extend(
        self, provider: EmbeddingProvider, num_total: int | None = None
    ) -> "LeannIndex":
        """Append items [num_nodes, num_total) from `provider` to the graph
        (incremental per-repo re-index; reference inserts one vector at a
        time, service.rs:610-676). The provider must cover ALL items —
        existing embeddings are recomputed for the duration of the append
        (LEANN's temp-embedding contract) and dropped after. Bucketed wave
        executables make repeated extends compile-free within a structural
        bucket (build.extend_graph)."""
        n_total = num_total if num_total is not None else provider.num_items
        graph = self._require_graph()
        n_old = graph.num_nodes
        if n_total <= n_old:
            return self
        if n_old == 0:
            return self.build(provider, n_total)
        x_all = dist_ops.prep_corpus(
            materialize_embeddings(provider, n_total), self.config.metric
        )
        neighbors, degrees = build_mod.extend_graph(
            graph.neighbors, graph.degrees, x_all, n_old, self.config,
            int(graph.entry_point),
        )
        old_levels = np.asarray(graph.levels)
        new_levels = build_mod.sample_levels(
            n_total - n_old, self.config.ml, self.config.max_layers,
            self.config.seed + n_old,
        )
        levels = np.concatenate([old_levels, new_levels])
        max_level = int(levels.max())
        entry = int(np.argmax(levels == max_level))
        self.graph = CsrGraph(
            neighbors=neighbors,
            degrees=degrees,
            levels=jnp.asarray(levels),
            entry_point=jnp.int32(entry),
            max_level=jnp.int32(max_level),
        )
        if self.sketch is not None:
            from islands_tpu.ops import proj as proj_ops

            self.sketch = proj_ops.build_sketch_index(
                x_all, self.graph.neighbors,
                proj_dims=self.sketch.proj_dims, seed=self.config.seed,
            )
        self._init_routing()
        if self.pq is not None:
            self.pq_codes = self.pq.encode(x_all)
        del x_all
        return self

    def _inline_codes(self) -> Array:
        """Derived inline neighbor-code blocks for the two-level hop,
        recomputed whenever the graph or the codes change (build, extend,
        load). One [N*m0] row gather — cheap relative to any search."""
        from islands_tpu.core.pq import build_inline_codes

        # Key on the source arrays themselves (identity comparison): a
        # rebuild at the same n swaps both arrays but keeps their shapes,
        # and holding the refs keeps ids from being recycled.
        key = (self.graph.neighbors, self.pq_codes)
        if self._nbr_codes is None or self._nbr_codes_key is None or not (
            self._nbr_codes_key[0] is key[0] and self._nbr_codes_key[1] is key[1]
        ):
            self._nbr_codes = build_inline_codes(
                self.graph.neighbors, self.pq_codes
            )
            self._nbr_codes_key = key
        return self._nbr_codes

    def _routing_sample(self, routing_size: int):
        """Seeded routing-id sample for the two-level path (cached per
        size); independent of the sketch routing set (_init_routing)."""
        n = self.num_nodes
        size = min(routing_size, n)
        cached = getattr(self, "_tl_routing", None)
        if cached is None:
            cached = self._tl_routing = {}
        if size not in cached:
            rng = np.random.default_rng(self.config.seed)
            cached[size] = jnp.asarray(
                rng.integers(0, n, size=size), dtype=jnp.int32
            )
        return cached[size]

    def _init_routing(self) -> None:
        n = self.graph.num_nodes if self.graph is not None else 0
        if self.sketch is not None and n > 0:
            rng = np.random.default_rng(self.config.seed)
            self._routing = jnp.asarray(
                rng.integers(0, n, size=min(self.config.routing_size, n)),
                dtype=jnp.int32,
            )

    def _train_pq(self, x: Array, pq_config: PQConfig) -> None:
        """Train PQ + encode all vectors. For COSINE, trains on normalized
        vectors so ADC inner-product tables approximate cosine distance."""
        xt = dist_ops.prep_corpus(x, self.config.metric)
        self.pq = ProductQuantizer(pq_config)
        self.pq.train(xt)
        self.pq_codes = self.pq.encode(xt)

    # -- search: pure recompute (reference: leann.rs:858-988) --------------

    def search(
        self,
        queries,
        k: int,
        provider: EmbeddingProvider,
        ef: int | None = None,
        expand_width: int | None = None,
        max_iters: int | None = None,
        gate: str = "auto",
        promote_width: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched recompute search: queries [B, d] (or [d]) ->
        (dists [B, k], ids [B, k]) ascending; unfilled slots (inf, -1).
        `promote_width` (sketch gate) caps recomputed candidates per hop —
        the direct encoder-budget knob in recompute deployments.

        Algorithm 1 + the configured pruning strategy (prune_ratio > 0
        reduces how many neighbor embeddings are recomputed per hop).

        `gate`: "auto" uses the construction SketchIndex when present —
        hops rank candidates by inline sketches and only the promoted
        candidates (`promote_width` per hop, tracked in
        `last_recompute_fraction`) are recomputed, vs every unpruned
        neighbor per hop in the reference loop (leann.rs:946-948). "none"
        forces the reference-style per-hop recompute loop; "sketch" requires
        the sketch.
        """
        graph = self._require_graph()
        q = jnp.asarray(queries, dtype=jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        self._check_dim(q.shape[1])
        if self.is_empty:
            out = (np.zeros((q.shape[0], 0), np.float32), np.zeros((q.shape[0], 0), np.int32))
            return (out[0][0], out[1][0]) if single else out
        ef = max(ef if ef is not None else self.config.ef_search, k)
        expand_width = expand_width or self.config.expand_width
        # Config-level operating-point defaults (design.md §13); per-call
        # arguments win.
        if promote_width is None:
            promote_width = self.config.promote_width
        if max_iters is None:
            max_iters = self.config.max_search_iters

        scorer = make_recompute_scorer(provider.embed_fn, self.config.metric)
        if gate == "auto":
            gate = (
                "sketch"
                if (self.sketch is not None and self.config.sketch_query)
                else "none"
            )
        if gate == "sketch":
            if self.sketch is None:
                raise IndexNotBuilt("no SketchIndex (built with sketch_build=False)")
            from islands_tpu.core.search import batched_sketch_gated_query
            from islands_tpu.ops import proj as proj_ops

            qp = dist_ops.prep_query(q, self.config.metric)
            qs = proj_ops.sketch_query(qp, self.sketch.w, self.sketch.scale)
            promote = promote_width or max(8, min(2 * expand_width * 4, ef))
            if max_iters is None:  # gate-appropriate default, caller wins
                max_iters = 8 * max(ef // promote, 1) + 32
            dists, ids, n_exact = batched_sketch_gated_query(
                qp, qs, provider.embed_ctx, self.sketch.scale,
                graph.neighbors, self.sketch.nbr_sketch,
                self.sketch.node_sketch, self._routing,
                exact_scorer=scorer, metric=self.config.metric,
                dim=int(qp.shape[1]), ef=ef, k=k, aq_width=max(ef, 64),
                promote_width=promote, expand_width=expand_width,
                max_iters=max_iters,
            )
            self.last_recompute_fraction = float(jnp.mean(n_exact)) / max(
                self.num_nodes, 1
            )
            dists, ids = np.asarray(dists), np.asarray(ids)
            return (dists[0], ids[0]) if single else (dists, ids)
        if max_iters is None:
            max_iters = default_max_iters(ef, expand_width)
        prune = make_prune_fn(
            self.config.pruning_strategy, self.config.prune_ratio, ef,
            seed=self.config.seed,
        )
        qp = dist_ops.prep_query(q, self.config.metric)
        dists, ids = batched_search(
            qp, provider.embed_ctx, graph.neighbors, graph.entry_point,
            graph.degrees,
            scorer=scorer, ef=ef, expand_width=expand_width,
            max_iters=max_iters, prune_fn=prune,
        )
        dists, ids = np.asarray(dists[:, :k]), np.asarray(ids[:, :k])
        return (dists[0], ids[0]) if single else (dists, ids)

    # -- search: two-level PQ-gated (spec Algorithm 2) ---------------------

    def search_two_level(
        self,
        queries,
        k: int,
        provider: EmbeddingProvider,
        ef: int | None = None,
        rerank_ratio: float = 0.1,
        expand_width: int | None = None,
        aq_width: int | None = None,
        promote_width: int | None = None,
        max_iters: int | None = None,
        end_rerank: bool = False,
        routing_size: int | None = None,
        static_loop: bool | None = None,
        adc_impl: str = "grouped",
        final_rescore: int = 0,
        hop_merge: str = "inline",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Two-level search: PQ-ADC approximate queue gates which candidates
        get exact (recomputed) scoring (docs/leann-specification.md:223-271).
        Requires `build(..., with_pq=...)`. Sets `last_recompute_fraction` to
        exact-scored / num_nodes (the metric the reference dead-codes at
        leann.rs:974-981).

        `end_rerank=True` runs the hop loop pure-ADC and exact-rescores the
        ef-wide pool ONCE at the end — ef exact scores/query instead of
        promote_width*hops (the 768-d bandwidth lever, design.md §16).

        `routing_size=R` starts each query at the nearest of R sampled
        nodes by exact distance (one R-row provider fetch + one [B, R]
        matmul per batch, search.route_entries_embed) instead of the
        global entry — fact 26's approach-phase lever, letting low
        max_iters caps keep recall. Size R to the provider: a block
        gather for stored embeddings, a recompute batch otherwise.

        `static_loop` runs the hop loop as a fixed-trip scan instead of a
        while_loop (search._run_hops). Measured a wash on-chip at config-4
        (BENCH_C4_ATTACK.json: while 7,337 vs scan 7,172 QPS grouped;
        5,435 vs 5,502 einsum — design.md §19), so the default stays the
        while form; the knob remains for A/B and for hosts where cond
        evaluation is costlier.
        `adc_impl` selects the approximate scorer lowering
        (pq.gated_block_scorer_for: "grouped" Pallas kernel / "einsum").
        `final_rescore=F` exact-rescores the F best approximate-queue
        entries ONCE after the hop loop (promote_exact paths only) — the
        recall-recovery half of a narrow promote_width at 768-d, where
        each per-hop promotion costs a 3 kB row recompute/fetch."""
        graph = self._require_graph()
        if self.pq is None or self.pq_codes is None:
            raise IndexNotBuilt("two-level search requires PQ (build with with_pq=)")
        q = jnp.asarray(queries, dtype=jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        self._check_dim(q.shape[1])
        ef = max(ef if ef is not None else self.config.ef_search, k)
        expand_width = expand_width or self.config.expand_width
        em = expand_width * graph.max_degree
        if aq_width is None:
            aq_width = max(ef, 64)
        if promote_width is None:
            promote_width = self.config.promote_width
        if max_iters is None:
            max_iters = self.config.max_search_iters
        if promote_width is None:
            promote_width = max(1, round(rerank_ratio * aq_width))
        promote_width = min(promote_width, em)
        if static_loop is None:
            static_loop = False
        if max_iters is None:
            max_iters = 8 * max(ef // max(promote_width, 1), 1) + 32

        exact = make_recompute_scorer(provider.embed_fn, self.config.metric)
        qp = dist_ops.prep_query(q, self.config.metric)
        entries = graph.entry_point
        if routing_size is not None and routing_size > 0:
            from islands_tpu.core.search import route_entries_embed

            entries = route_entries_embed(
                q, provider.embed_ctx, self._routing_sample(routing_size),
                embed_fn=provider.embed_fn, metric=self.config.metric,
            )
        dists, ids, n_exact = batched_two_level_search(
            qp, provider.embed_ctx, self._inline_codes(),
            self.pq.codebook.centroids,
            graph.neighbors, entries,
            exact_scorer=exact,
            approx_scorer=gated_block_scorer_for(self.config.metric, adc_impl),
            prep_fn=gated_prep_for(self.config.metric),
            ef=ef, aq_width=aq_width, promote_width=promote_width,
            expand_width=expand_width, max_iters=max_iters,
            promote_exact=not end_rerank,
            static_iters=bool(static_loop),
            final_rescore=final_rescore,
            hop_merge=hop_merge,
        )
        self.last_recompute_fraction = float(jnp.mean(n_exact)) / max(self.num_nodes, 1)
        dists, ids = np.asarray(dists[:, :k]), np.asarray(ids[:, :k])
        return (dists[0], ids[0]) if single else (dists, ids)

    # -- search: exhaustive PQ scan + exact rerank -------------------------

    def search_pq_scan(
        self,
        queries,
        k: int,
        provider: EmbeddingProvider,
        rerank: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Graph-free search: ADC-scan ALL PQ codes (Pallas one-hot-matmul
        kernel on TPU, ops/pallas_kernels.adc_scan), take the `rerank` best
        approximate candidates, exact-score them through `provider`, return
        top-k. O(n*S) table lookups as MXU matmuls — the fast path for
        small/medium corpora where a full scan beats graph traversal, and a
        recall-floor diagnostic for the graph paths. Requires
        build(..., with_pq=...)."""
        graph = self._require_graph()
        del graph
        if self.pq is None or self.pq_codes is None:
            raise IndexNotBuilt("PQ scan requires PQ (build with with_pq=)")
        from islands_tpu.core.pq import pq_scan

        q = jnp.asarray(queries, dtype=jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        self._check_dim(q.shape[1])
        rerank = rerank or max(4 * k, 32)
        # At least k candidates must be reranked, and no more exist than
        # num_nodes; with a tiny corpus the result is padded below.
        rerank = min(max(rerank, k), self.num_nodes)
        k_eff = min(k, rerank)

        d_approx = pq_scan(self.pq, q, self.pq_codes, metric=self.config.metric)
        _, cand = jax.lax.top_k(-d_approx, rerank)  # [B, rerank]

        scorer = make_recompute_scorer(provider.embed_fn, self.config.metric)
        qp = dist_ops.prep_query(q, self.config.metric)
        d_exact = jax.vmap(
            lambda q1, ids1: scorer(
                provider.embed_ctx, q1, ids1, jnp.ones_like(ids1, dtype=bool)
            )
        )(qp, cand)
        neg, pos = jax.lax.top_k(-d_exact, k_eff)
        ids = jnp.take_along_axis(cand, pos, axis=1)
        self.last_recompute_fraction = rerank / max(self.num_nodes, 1)
        dists, ids = np.asarray(-neg), np.asarray(ids)
        if k_eff < k:  # corpus smaller than k: pad (inf, -1) like the pools
            pad = ((0, 0), (0, k - k_eff))
            dists = np.pad(dists, pad, constant_values=np.inf)
            ids = np.pad(ids, pad, constant_values=-1)
        return (dists[0], ids[0]) if single else (dists, ids)

    # -- helpers -----------------------------------------------------------

    def _require_graph(self) -> CsrGraph:
        if self.graph is None:
            raise IndexNotBuilt("index is not built")
        return self.graph

    def _check_dim(self, d: int) -> None:
        if self.dimension is not None and d != self.dimension:
            raise DimensionMismatch(f"expected dimension {self.dimension}, got {d}")
