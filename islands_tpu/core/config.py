"""Configuration types for the LEANN-style index.

Mirrors the behavioral surface of the reference's config structs
(src/core/leann.rs:321-460, src/core/pq.rs:12-65, src/core/search.rs:8-52)
while adding the TPU-specific knobs (wave size, beam expansion width, dtypes)
that the batched device pipeline needs.
"""

from __future__ import annotations

import dataclasses
import enum
import math


class DistanceMetric(str, enum.Enum):
    """Distance metrics (reference: src/core/distance.rs:7-19).

    All are *distances*: lower is better.
    - COSINE: 1 - cosine_similarity (zero vectors -> 1.0)
    - EUCLIDEAN: L2 distance
    - DOT_PRODUCT: negative dot product
    - MANHATTAN: L1 distance
    """

    COSINE = "cosine"
    EUCLIDEAN = "euclidean"
    DOT_PRODUCT = "dotproduct"
    MANHATTAN = "manhattan"


class PruningStrategy(str, enum.Enum):
    """Candidate-pruning strategies before embedding recompute
    (reference: src/core/leann.rs:167-178).
    """

    GLOBAL = "global"
    LOCAL = "local"
    PROPORTIONAL = "proportional"


class ConfigError(ValueError):
    """Invalid configuration (reference: CoreError::InvalidConfig)."""


@dataclasses.dataclass(frozen=True)
class LeannConfig:
    """LEANN index configuration (reference: src/core/leann.rs:321-460).

    Defaults follow the paper parameters (`paper_default`, leann.rs:386-403):
    M=30, m0=60, efConstruction=128, efSearch=64, top-2% hub preservation.

    TPU-specific fields (no referent in the reference, which inserts nodes one
    at a time): `wave_size` is how many vectors are inserted per batched
    construction wave; `expand_width` is how many frontier nodes each query
    expands per search hop (the reference pops one heap entry per hop).
    """

    m: int = 30
    m0: int = 60
    ef_construction: int = 128
    ml: float = 1.0 / math.log(30.0)
    max_layers: int = 16
    metric: DistanceMetric = DistanceMetric.COSINE
    ef_search: int = 64
    beam_width: int = 1
    prune_ratio: float = 0.0
    pruning_strategy: PruningStrategy = PruningStrategy.GLOBAL
    high_degree_pruning: bool = True
    hub_percentile: float = 0.02
    is_compact: bool = True
    is_recompute: bool = True
    # RNG-heuristic (diversity) neighbor selection: keep a candidate only if
    # it is closer to the inserted node than to any already-selected neighbor.
    # The reference's nearest-only selection (leann.rs:761-833) produces
    # cluster-redundant edges that cripple flat-graph navigation on clustered
    # corpora; this is the standard HNSW select-heuristic fix.
    diversify: bool = True
    # Sketch-gated construction (round-2 default): the wave candidate search
    # ranks neighbors via inline int8-projection sketch blocks (ops/proj.py)
    # instead of per-neighbor embedding-row gathers, and exact-rescores the
    # pooled candidates once per wave. Round-1 profiling showed the hop is
    # bound by gather COUNT (~10 ns/row regardless of row size); the inline
    # block layout cuts fetch count ~BW-fold. Supersedes the round-1
    # `pq_build` flag (PQ-code rows were the same gather count and measured
    # slower end-to-end; see docs/design.md).
    sketch_build: bool = True
    # Projected dimensions of the sketch (multiple of 4; int8-quantized).
    sketch_dims: int = 16
    # Construction searches an approx pool of sketch_pool_mult*ef_construction
    # entries, exact-rescoring all of it and keeping the best ef_construction
    # by TRUE distance. The over-provisioned pool absorbs sketch ranking
    # noise, which otherwise costs graph recall at large n (measured at 1M:
    # recall@10 0.893 -> parity with the exact build at mult=2).
    sketch_pool_mult: int = 2
    # Candidate entry points sampled from the inserted prefix per wave; each
    # query starts at its nearest routing node (cuts hops on clustered data).
    routing_size: int = 1024
    # Post-build refinement passes (Vamana-style second pass): re-run the
    # candidate search for every node over the COMPLETE graph, exact-rescore,
    # and re-select its row (current neighbors stay in the candidate set).
    # Early waves of the main build selected from a small inserted prefix;
    # a refinement pass lets them see the whole corpus. Each pass costs
    # roughly one build search phase.
    refine_passes: int = 0
    # Default QUERY gate: when True, LeannIndex.search(gate="auto") uses the
    # sketch-gated hop (recomputing only the final ef embeddings per query).
    # Off by default: sketch ranking fidelity depends on the corpus living on
    # a low-dimensional manifold (true for real text/code embeddings, false
    # for uniform-random vectors); callers with real embeddings opt in.
    sketch_query: bool = False

    # --- TPU build/search pipeline knobs ---
    wave_size: int = 1024
    expand_width: int = 4
    # Extra reverse-edge slots per node during construction; overflowing nodes
    # are repaired (pruned back to m0 by distance) at the end of each wave.
    reverse_slack: int = 60
    # Intra-wave brute-force neighbors merged into each new node's candidates
    # (restores the links sequential insertion would have created in-wave).
    intra_wave_k: int = 30
    seed: int = 0
    # Default search operating-point knobs (design.md §13): per-call
    # arguments win; None keeps the gate-appropriate conservative formulas.
    # `promote_width` caps exact scoring (or encoder recomputes) per hop in
    # the sketch gate; `max_search_iters` caps hop iterations — the batched
    # loop runs to its slowest query's convergence, so the cap trades
    # straggler tail recall for batch QPS.
    promote_width: int | None = None
    max_search_iters: int | None = None

    @staticmethod
    def paper_default() -> "LeannConfig":
        return LeannConfig()

    @staticmethod
    def fast() -> "LeannConfig":
        """Speed-optimized preset (reference: leann.rs:406-416)."""
        return LeannConfig(
            m=16,
            m0=32,
            ef_construction=100,
            ef_search=32,
            prune_ratio=0.3,
            reverse_slack=32,
            intra_wave_k=16,
        )

    @staticmethod
    def accurate() -> "LeannConfig":
        """Accuracy-optimized preset (reference: leann.rs:419-429)."""
        return LeannConfig(
            m=48,
            m0=96,
            ef_construction=400,
            ef_search=128,
            prune_ratio=0.0,
            reverse_slack=96,
            intra_wave_k=48,
        )

    def validate(self) -> None:
        """Reference: leann.rs:432-460."""
        if self.m <= 0:
            raise ConfigError("M must be > 0")
        if self.m0 < self.m:
            raise ConfigError("M0 must be >= M")
        if self.ef_construction < self.m:
            raise ConfigError("ef_construction must be >= M")
        if not 0.0 <= self.prune_ratio <= 1.0:
            raise ConfigError("prune_ratio must be in [0.0, 1.0]")
        if self.beam_width <= 0:
            raise ConfigError("beam_width must be > 0")
        if not 0.0 <= self.hub_percentile <= 1.0:
            raise ConfigError("hub_percentile must be in [0.0, 1.0]")
        if self.promote_width is not None and self.promote_width <= 0:
            raise ConfigError("promote_width must be > 0 when set")
        if self.max_search_iters is not None and self.max_search_iters <= 0:
            raise ConfigError("max_search_iters must be > 0 when set")
        if self.refine_passes < 0:
            raise ConfigError("refine_passes must be >= 0")
        if self.wave_size <= 0:
            raise ConfigError("wave_size must be > 0")
        if self.expand_width <= 0:
            raise ConfigError("expand_width must be > 0")


@dataclasses.dataclass(frozen=True)
class HnswConfig:
    """Multi-layer HNSW configuration (reference: src/core/hnsw.rs:14-69).

    Defaults match the reference: m=16, m0=32, ef_construction=200,
    ml=1/ln(16), max_layers=16. TPU knobs as in LeannConfig.
    """

    m: int = 16
    m0: int = 32
    ef_construction: int = 200
    ml: float = 1.0 / math.log(16.0)
    max_layers: int = 16
    metric: DistanceMetric = DistanceMetric.COSINE
    # --- TPU build pipeline knobs ---
    wave_size: int = 1024
    expand_width: int = 4
    reverse_slack: int = 32
    intra_wave_k: int = 16
    seed: int = 0

    @staticmethod
    def fast() -> "HnswConfig":
        """Speed preset (reference: hnsw.rs:50-58)."""
        return HnswConfig(m=8, m0=16, ef_construction=100,
                          ml=1.0 / math.log(8.0), reverse_slack=16, intra_wave_k=8)

    @staticmethod
    def accurate() -> "HnswConfig":
        """Accuracy preset (reference: hnsw.rs:61-69)."""
        return HnswConfig(m=32, m0=64, ef_construction=400,
                          ml=1.0 / math.log(32.0), reverse_slack=64, intra_wave_k=32)

    def validate(self) -> None:
        if self.m <= 0:
            raise ConfigError("m must be > 0")
        if self.m0 < self.m:
            raise ConfigError("m0 must be >= m")
        if self.ef_construction < self.m:
            raise ConfigError("ef_construction must be >= m")
        if self.max_layers <= 0:
            raise ConfigError("max_layers must be > 0")

    def to_leann(self, layer: int) -> "LeannConfig":
        """Per-layer construction params: layer 0 uses m0, upper layers m
        (reference: hnsw.rs insert uses max_connections(layer))."""
        m_l = self.m0 if layer == 0 else self.m
        return LeannConfig(
            m=max(m_l // 2, 1),
            m0=m_l,
            ef_construction=max(self.ef_construction, m_l),
            ml=self.ml,
            max_layers=1,
            metric=self.metric,
            high_degree_pruning=False,
            wave_size=self.wave_size,
            expand_width=self.expand_width,
            reverse_slack=self.reverse_slack,
            intra_wave_k=min(self.intra_wave_k, m_l),
            seed=self.seed + layer,
        )


@dataclasses.dataclass(frozen=True)
class PQConfig:
    """Product quantization configuration (reference: src/core/pq.rs:12-65)."""

    num_subquantizers: int = 8
    num_centroids: int = 256
    training_iterations: int = 25
    seed: int | None = None

    def validate(self, dimension: int) -> None:
        if self.num_subquantizers <= 0:
            raise ConfigError("num_subquantizers must be > 0")
        if dimension % self.num_subquantizers != 0:
            raise ConfigError(
                f"dimension {dimension} must be divisible by "
                f"num_subquantizers {self.num_subquantizers}"
            )
        if not 1 <= self.num_centroids <= 65536:
            raise ConfigError("num_centroids must be in range [1, 65536]")

    @property
    def bytes_per_vector(self) -> int:
        """Reference: pq.rs:57-64 (u8 codes for <=256 centroids, else u16)."""
        if self.num_centroids <= 256:
            return self.num_subquantizers
        return self.num_subquantizers * 2


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Search-time configuration (reference: src/core/search.rs:8-52)."""

    top_k: int = 10
    ef: int = 100
    include_vectors: bool = False
    include_metadata: bool = True
    min_similarity: float | None = None
    # Two-level search (spec Algorithm 2): fraction of the approximate queue
    # promoted to exact scoring per hop.
    rerank_ratio: float = 0.1
    # Operating-point knobs (design.md §13), passed through to indexes that
    # support them (sketch/two-level gates); None keeps index defaults.
    promote_width: int | None = None
    max_iters: int | None = None

    def validate(self) -> None:
        if self.top_k <= 0:
            raise ConfigError("top_k must be > 0")
        if self.ef < self.top_k:
            raise ConfigError("ef must be >= top_k")
        if self.promote_width is not None and self.promote_width <= 0:
            raise ConfigError("promote_width must be > 0 when set")
        if self.max_iters is not None and self.max_iters <= 0:
            raise ConfigError("max_iters must be > 0 when set")


def distance_to_similarity(distance: float) -> float:
    """Score mapping used by the reference's SearchResult::to_similarity
    (src/core/search.rs:55-103): similarity = 1 / (1 + distance)."""
    return 1.0 / (1.0 + distance)
