"""Utilities: persistent compilation cache, tracing/metrics/logging."""

from islands_tpu.utils.cache import enable_persistent_cache
from islands_tpu.utils.tracing import (
    JsonFormatter,
    Metrics,
    init_logging,
    metrics,
    record_recompute_efficiency,
    span,
)

__all__ = [
    "JsonFormatter", "Metrics", "enable_persistent_cache", "init_logging",
    "metrics", "record_recompute_efficiency", "span",
]
