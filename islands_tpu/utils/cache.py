"""Persistent XLA compilation cache.

The wave-batched construction and beam-search executables are large (30-40s
compiles on TPU). All shapes are static and corpus-independent after the
ctx-as-argument refactor (core/search.py), so compiled artifacts are fully
reusable across processes — enabling JAX's persistent compilation cache makes
every build/search after the first process start dispatch-only.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a durable directory. Idempotent."""
    global _ENABLED
    import jax

    cache_dir = path or os.environ.get(
        "ISLANDS_TPU_CACHE", str(Path.home() / ".cache" / "islands_tpu" / "xla")
    )
    if not _ENABLED:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        try:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # knob names vary across jax versions; the dir alone suffices
        _ENABLED = True
    return cache_dir
