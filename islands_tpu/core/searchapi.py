"""High-level search API: results, builder, multi-index merge.

Reference: src/core/search.rs — `SearchConfig` (:8-52, in config.py),
`SearchResult` with distance->similarity mapping (:55-103), the `Searcher`
builder (:106-182), and `MultiIndexSearcher` merging named graphs (:185-254).

TPU-native difference: all entry points are batched ([B, d] queries in, [B]
result lists out); the multi-index merge is a host-side sort over per-index
device results (the on-device mesh-wide variant lives in parallel/sharded.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import numpy as np

from islands_tpu.core.config import SearchConfig, distance_to_similarity


@dataclasses.dataclass
class SearchResult:
    """One hit (reference SearchResult: search.rs:55-103)."""

    id: int
    distance: float
    vector: np.ndarray | None = None
    metadata: dict[str, Any] | None = None
    index_name: str | None = None

    @property
    def similarity(self) -> float:
        """similarity = 1 / (1 + distance) (reference: search.rs:88-103)."""
        return distance_to_similarity(self.distance)


class Searcher:
    """Configurable searcher over one index (reference Searcher builder,
    search.rs:106-182). Works over any index exposing
    `search(queries, k, ef) -> (dists, ids)` (HnswIndex, StoredSearcher-
    wrapped LeannIndex, ...)."""

    def __init__(self, index, config: SearchConfig | None = None):
        self.index = index
        self.config = config or SearchConfig()
        self.config.validate()

    def with_top_k(self, top_k: int) -> "Searcher":
        self.config = dataclasses.replace(self.config, top_k=top_k)
        self.config.validate()
        return self

    def with_ef(self, ef: int) -> "Searcher":
        self.config = dataclasses.replace(self.config, ef=ef)
        self.config.validate()
        return self

    def with_min_similarity(self, s: float | None) -> "Searcher":
        self.config = dataclasses.replace(self.config, min_similarity=s)
        return self

    def with_vectors(self, include: bool = True) -> "Searcher":
        self.config = dataclasses.replace(self.config, include_vectors=include)
        return self

    def with_promote_width(self, promote_width: int | None) -> "Searcher":
        """Exact-scoring budget per hop (sketch/two-level gates;
        design.md §13). Requires an index whose search accepts it."""
        self.config = dataclasses.replace(self.config, promote_width=promote_width)
        self.config.validate()
        return self

    def with_max_iters(self, max_iters: int | None) -> "Searcher":
        """Hop-iteration cap: the batched loop runs to its slowest query's
        convergence, so the cap trades straggler tail recall for batch QPS
        (design.md §13). Requires an index whose search accepts it."""
        self.config = dataclasses.replace(self.config, max_iters=max_iters)
        self.config.validate()
        return self

    def search(self, queries) -> list[list[SearchResult]]:
        """queries [B, d] or [d] -> per-query result lists (similarity-
        filtered, ascending distance)."""
        q = np.asarray(queries, dtype=np.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        # Only forward the operating-point knobs when set: indexes without
        # a gated search (plain HNSW) don't take them.
        kw = {}
        if self.config.promote_width is not None:
            kw["promote_width"] = self.config.promote_width
        if self.config.max_iters is not None:
            kw["max_iters"] = self.config.max_iters
        dists, ids = self.index.search(
            q, k=self.config.top_k, ef=self.config.ef, **kw
        )
        dists, ids = np.asarray(dists), np.asarray(ids)
        out: list[list[SearchResult]] = []
        for bi in range(len(q)):
            hits = []
            for d, i in zip(dists[bi], ids[bi]):
                if i < 0 or not np.isfinite(d):
                    continue
                r = SearchResult(id=int(i), distance=float(d))
                if (
                    self.config.min_similarity is not None
                    and r.similarity < self.config.min_similarity
                ):
                    continue
                if self.config.include_vectors and hasattr(self.index, "get_vector"):
                    r.vector = self.index.get_vector(int(i))
                hits.append(r)
            out.append(hits)
        return [out[0]] if single else out


class MultiIndexSearcher:
    """Search several named indexes and merge by score (reference
    MultiIndexSearcher: search.rs:185-254)."""

    def __init__(self, config: SearchConfig | None = None):
        self.config = config or SearchConfig()
        self.indexes: dict[str, Any] = {}

    def add_index(self, name: str, index) -> "MultiIndexSearcher":
        self.indexes[name] = index
        return self

    def remove_index(self, name: str) -> "MultiIndexSearcher":
        self.indexes.pop(name, None)
        return self

    def search(
        self, queries, index_names: list[str] | None = None
    ) -> list[list[SearchResult]]:
        """Merge-sort per-index results by similarity desc, truncate top_k
        (reference: search.rs:224-253)."""
        q = np.asarray(queries, dtype=np.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        names = index_names if index_names is not None else list(self.indexes)
        b = len(q)
        merged: list[list[SearchResult]] = [[] for _ in range(b)]
        for name in names:
            idx = self.indexes.get(name)
            if idx is None:
                continue
            results = Searcher(idx, self.config).search(q)
            for bi, hits in enumerate(results):
                for h in hits:
                    h.index_name = name
                merged[bi].extend(hits)
        for bi in range(b):
            merged[bi].sort(key=lambda r: -r.similarity)
            merged[bi] = merged[bi][: self.config.top_k]
        return [merged[0]] if single else merged
