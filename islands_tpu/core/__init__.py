from islands_tpu.core.config import (
    DistanceMetric,
    LeannConfig,
    PQConfig,
    PruningStrategy,
    SearchConfig,
)
from islands_tpu.core.csr import SENTINEL, CsrGraph

__all__ = [
    "CsrGraph",
    "SENTINEL",
    "DistanceMetric",
    "LeannConfig",
    "PQConfig",
    "PruningStrategy",
    "SearchConfig",
]
