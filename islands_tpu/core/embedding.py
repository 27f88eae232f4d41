"""Embedding providers: the id -> embedding recompute boundary.

Reference: the `EmbeddingProvider` trait (src/core/leann.rs:82-99 —
`compute_embedding(id)`, `compute_embeddings_batch`, `dimension`) and its
in-memory test fake `InMemoryEmbeddingProvider` (leann.rs:101-159).

TPU-native difference: a provider here is *jittable* — `provider.batch_fn`
maps an int32 id vector straight to an [E, d] embedding matrix on device, so
recompute batches fuse into the search loop instead of crossing a host
boundary per hop (the reference calls a Rust trait object per hop;
SURVEY.md §7 "hard parts" #4).
"""

from __future__ import annotations

from typing import Any, Callable, Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class EmbeddingError(ValueError):
    """Provider failure (reference: CoreError::EmbeddingError)."""


@runtime_checkable
class EmbeddingProvider(Protocol):
    """Protocol for id -> embedding computation (leann.rs:82-99).

    Device surface: `embed_fn` is a STATIC jittable function
    `(embed_ctx, ids [E] int32) -> [E, d] f32`; `embed_ctx` is the pytree of
    arrays it reads (corpus / params / token tables). The ctx flows through
    jit as an argument — never a closure — so search executables are shared
    across corpora (see core/search.py compile discipline). Out-of-range ids
    may return arbitrary rows (callers mask validity)."""

    @property
    def dimension(self) -> int: ...

    @property
    def num_items(self) -> int: ...

    @property
    def embed_fn(self) -> Callable[[Any, Array], Array]: ...

    @property
    def embed_ctx(self): ...

    def compute_embedding(self, item_id: int) -> np.ndarray: ...

    def compute_embeddings_batch(self, ids) -> np.ndarray: ...


def _gather_embed(ctx, ids: Array) -> Array:
    """embed_fn of the in-memory provider: plain row gather."""
    x = ctx
    return x[jnp.clip(ids, 0, x.shape[0] - 1)]


class InMemoryEmbeddingProvider:
    """Array-backed provider — the device-free test fake standing in for the
    embedding server (reference: leann.rs:101-159)."""

    def __init__(self, embeddings):
        x = jnp.asarray(embeddings, dtype=jnp.float32)
        if x.ndim != 2:
            raise EmbeddingError("embeddings must be [n, d]")
        self._x = x

    @property
    def dimension(self) -> int:
        return self._x.shape[1]

    @property
    def num_items(self) -> int:
        return self._x.shape[0]

    @property
    def embeddings(self) -> Array:
        return self._x

    @property
    def embed_fn(self):
        return _gather_embed

    @property
    def embed_ctx(self):
        return self._x

    def batch_fn(self) -> Callable[[Array], Array]:
        x = self._x
        n = x.shape[0]

        def fn(ids: Array) -> Array:
            return x[jnp.clip(ids, 0, n - 1)]

        return fn

    def compute_embedding(self, item_id: int) -> np.ndarray:
        if not 0 <= item_id < self.num_items:
            raise EmbeddingError(f"id {item_id} out of range [0, {self.num_items})")
        return np.asarray(self._x[item_id])

    def compute_embeddings_batch(self, ids) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        if ids.size and (ids.min() < 0 or ids.max() >= self.num_items):
            raise EmbeddingError("id out of range")
        return np.asarray(self._x[jnp.asarray(ids, dtype=jnp.int32)])


class CallableEmbeddingProvider:
    """Wraps an arbitrary jittable `ids -> [E, d]` function (e.g. an encoder
    forward over an on-device token table — see models/). This is the bridge
    the reference leaves unimplemented (`EmbeddingProvider for EmbedderProvider`
    errors out at src/core/embedding/provider.rs:450-472)."""

    def __init__(self, fn: Callable[[Array], Array], dimension: int, num_items: int):
        self._fn = fn
        self._dimension = dimension
        self._num_items = num_items
        # stable per-instance wrapper so jit static-arg hashing is consistent
        self._embed_fn = lambda ctx, ids: fn(ids)

    @property
    def dimension(self) -> int:
        return self._dimension

    @property
    def num_items(self) -> int:
        return self._num_items

    @property
    def embed_fn(self):
        return self._embed_fn

    @property
    def embed_ctx(self):
        return None

    def batch_fn(self) -> Callable[[Array], Array]:
        return self._fn

    def compute_embedding(self, item_id: int) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray([item_id], dtype=jnp.int32))[0])

    def compute_embeddings_batch(self, ids) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(ids, dtype=jnp.int32)))


def materialize_embeddings(
    provider: EmbeddingProvider, n: int, batch: int = 1024
) -> Array:
    """Pull all n embeddings through the provider in batches — the build-time
    temp-embedding pass (reference: leann.rs:560-580 computes each vector once
    during construction, then drops them)."""
    fn = provider.batch_fn()
    outs = []
    for s in range(0, n, batch):
        ids = jnp.arange(s, min(s + batch, n), dtype=jnp.int32)
        outs.append(fn(ids))
    if not outs:
        return jnp.zeros((0, provider.dimension), dtype=jnp.float32)
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]
