"""Core vector engine: configs, graph storage, construction, search, PQ,
embedding providers, on-disk format (reference: src/core/)."""

from islands_tpu.core.config import (
    ConfigError,
    DistanceMetric,
    HnswConfig,
    LeannConfig,
    PQConfig,
    PruningStrategy,
    SearchConfig,
    distance_to_similarity,
)
from islands_tpu.core.csr import SENTINEL, CsrGraph

__all__ = [
    "CsrGraph", "ConfigError", "DistanceMetric", "HnswConfig", "LeannConfig",
    "PQConfig", "PruningStrategy", "SENTINEL", "SearchConfig",
    "distance_to_similarity",
]
