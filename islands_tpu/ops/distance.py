"""Batched distance kernels.

TPU-first reformulation of the reference's scalar distance loops
(src/core/distance.rs:71-122, src/core/embedding/mod.rs:129-200): instead of
one pair at a time, everything is a pairwise matrix op so the contraction maps
onto the MXU. Cosine/L2/dot all reduce to a single [B,d]x[d,N] matmul; only
Manhattan is a genuinely elementwise (VPU) op.

Semantics match the reference exactly:
- cosine(a, b)   = 1 - a.b / (|a||b|), zero vectors -> 1.0  (distance.rs:71-88)
- euclidean      = sqrt(sum (a-b)^2)                         (distance.rs:92-108)
- dotproduct     = -a.b                                      (distance.rs:112-115)
- manhattan      = sum |a-b|                                 (distance.rs:119-122)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from islands_tpu.core.config import DistanceMetric

Array = jax.Array


def normalize(v: Array, axis: int = -1, eps: float = 0.0) -> Array:
    """L2-normalize; zero vectors stay zero (reference: distance.rs:125-139)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return jnp.where(norm > eps, v / jnp.maximum(norm, 1e-30), jnp.zeros_like(v))


def _sq_norms(x: Array) -> Array:
    return jnp.sum(x * x, axis=-1)


@functools.partial(jax.jit, static_argnames=("metric", "squared"))
def pairwise_distance(
    q: Array,
    x: Array,
    metric: DistanceMetric = DistanceMetric.COSINE,
    squared: bool = False,
) -> Array:
    """Distance matrix between queries `q` [B, d] and points `x` [N, d].

    Returns [B, N] float32. `squared=True` skips the sqrt for EUCLIDEAN
    (monotone, for comparisons only — reference: distance.rs:54-66).
    """
    q = q.astype(jnp.float32)
    x = x.astype(jnp.float32)
    if metric == DistanceMetric.COSINE:
        qn = normalize(q)
        xn = normalize(x)
        sim = jnp.dot(qn, xn.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return 1.0 - sim
    if metric == DistanceMetric.EUCLIDEAN:
        # |q-x|^2 = |q|^2 + |x|^2 - 2 q.x : one MXU matmul + rank-1 updates.
        d2 = (
            _sq_norms(q)[:, None]
            + _sq_norms(x)[None, :]
            - 2.0 * jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        )
        d2 = jnp.maximum(d2, 0.0)
        return d2 if squared else jnp.sqrt(d2)
    if metric == DistanceMetric.DOT_PRODUCT:
        return -jnp.dot(q, x.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    if metric == DistanceMetric.MANHATTAN:
        # Elementwise |q-x| has no matmul form; broadcast on the VPU.
        return jnp.sum(jnp.abs(q[:, None, :] - x[None, :, :]), axis=-1)
    raise ValueError(f"unknown metric: {metric}")


def distance(a: Array, b: Array, metric: DistanceMetric = DistanceMetric.COSINE) -> Array:
    """Scalar distance between two vectors (reference: distance.rs:38-52)."""
    return pairwise_distance(a[None, :], b[None, :], metric)[0, 0]


@functools.partial(jax.jit, static_argnames=("metric",))
def rowwise_distance(
    q: Array,
    rows: Array,
    metric: DistanceMetric = DistanceMetric.COSINE,
    q_prepped: bool = False,
) -> Array:
    """Distances from one query [d] to gathered rows [E, d] -> [E].

    The inner scoring op of the beam-search hop: rows are neighbor embeddings
    gathered from HBM. vmapped over the query batch this becomes a batched
    matvec on the MXU. For COSINE, `q_prepped`/pre-normalized rows let callers
    hoist normalization out of the loop (build-time path pre-normalizes the
    whole corpus once).
    """
    q = q.astype(jnp.float32)
    rows = rows.astype(jnp.float32)
    if metric == DistanceMetric.COSINE:
        return 1.0 - jnp.dot(rows, q, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    if metric == DistanceMetric.EUCLIDEAN:
        diff = rows - q[None, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    if metric == DistanceMetric.DOT_PRODUCT:
        return -jnp.dot(rows, q, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    if metric == DistanceMetric.MANHATTAN:
        return jnp.sum(jnp.abs(rows - q[None, :]), axis=-1)
    raise ValueError(f"unknown metric: {metric}")


@functools.partial(jax.jit, static_argnames=("metric",))
def rows_distance(q: Array, rows: Array, metric: DistanceMetric) -> Array:
    """Per-row distances: q [R, d] vs rows [R, B, d] -> [R, B].

    Used by the construction repair pass (each overflowing node scores its own
    neighbor list). Inputs must be prepped (prep_query/prep_corpus).
    """
    q = q.astype(jnp.float32)
    rows = rows.astype(jnp.float32)
    if metric in (DistanceMetric.COSINE, DistanceMetric.DOT_PRODUCT):
        sim = jnp.einsum(
            "rbd,rd->rb", rows, q,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 1.0 - sim if metric == DistanceMetric.COSINE else -sim
    if metric == DistanceMetric.EUCLIDEAN:
        diff = rows - q[:, None, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    if metric == DistanceMetric.MANHATTAN:
        return jnp.sum(jnp.abs(rows - q[:, None, :]), axis=-1)
    raise ValueError(f"unknown metric: {metric}")


def prep_query(q: Array, metric: DistanceMetric) -> Array:
    """Preprocess queries so `rowwise_distance` is a pure matvec.

    For COSINE this normalizes; other metrics are identity. Corpus arrays
    should be passed through `prep_corpus` with the same metric.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    if metric == DistanceMetric.COSINE:
        return normalize(q)
    return q


def prep_corpus(x: Array, metric: DistanceMetric) -> Array:
    x = jnp.asarray(x, dtype=jnp.float32)
    if metric == DistanceMetric.COSINE:
        return normalize(x)
    return x


def brute_force_topk(
    q: Array,
    x: Array,
    k: int,
    metric: DistanceMetric = DistanceMetric.COSINE,
    batch: int = 8192,
) -> tuple[Array, Array]:
    """Exact top-k by full scan: the recall oracle (reference tests use the
    same brute-force ground truth, e.g. src/core/hnsw.rs:806-854).

    Returns (dists [B, k], ids [B, k]) sorted ascending by distance.
    Scans `x` in chunks to bound the [B, N] intermediate.
    """
    n = x.shape[0]
    b = q.shape[0]
    best_d = jnp.full((b, k), jnp.inf, dtype=jnp.float32)
    best_i = jnp.full((b, k), -1, dtype=jnp.int32)
    for start in range(0, n, batch):
        stop = min(start + batch, n)
        d = pairwise_distance(q, x[start:stop], metric)
        ids = jnp.arange(start, stop, dtype=jnp.int32)[None, :].repeat(b, axis=0)
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        neg_top, pos = jax.lax.top_k(-all_d, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(all_i, pos, axis=1)
    return best_d, best_i
