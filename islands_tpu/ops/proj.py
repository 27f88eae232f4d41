"""Quantized projection sketches: the TPU-native approximate-distance gate.

Round-1 profiling showed the graph engine's hop cost is bound by the COUNT of
HBM row fetches, not bytes (~10 ns per gathered row on v5e regardless of row
size), while gathering one node's whole neighbor *block* costs only ~2-3 row
fetches. The fix is a data layout, not a kernel: keep, for every node, an
inline copy of its neighbors' distance sketches (`[N, BW, P/4]` int32 = P
int8-quantized projection components per neighbor), so one hop fetches
`expand_width` contiguous blocks instead of `expand_width * BW` scattered
embedding rows, and scores them with pure VPU math.

This plays the role the reference reserves for PQ-ADC gating in two-level
search (docs/leann-specification.md:223-271): an O(few-bytes) approximate
score that triages candidates before exact scoring. A random-orthonormal
projection is used instead of PQ codebooks because evaluating it is dense
arithmetic (MXU/VPU friendly), while ADC needs per-element table lookups that
serialize on TPU (measured ~10 ns per lookup — the same latency wall the
sketch exists to avoid).

Quantization is int8 with one global scale, packed 4 components per int32 so
incremental updates (reverse-edge inserts during construction) ride the fast
single-axis element scatter (measured 4.9 ns/element vs 1.6 us/row for
multi-axis row scatters).

Scoring convention: the QUERY side is pre-multiplied by the quantization
scale, so gathered int8 values are compared raw — no dequantization in the
hop loop. All sketch distances are monotone surrogates of the true metric
(squared L2 in the projected subspace for euclidean/manhattan, negative
projected dot for cosine/dot); they are used for ranking only and are always
followed by exact rescoring of survivors.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from islands_tpu.core.config import DistanceMetric

Array = jax.Array

# Components are packed 4-per-int32.
PACK = 4


def make_projection(dim: int, proj_dims: int, seed: int = 0) -> Array:
    """Random orthonormal projection [dim, proj_dims] (QR of seeded gaussian).

    Orthonormal columns make E[(Wq).(Wx)] = (proj_dims/dim) q.x and preserve
    relative L2 distances with JL-style distortion; data-independent and
    deterministic, so a (dim, proj_dims, seed) triple fully identifies it on
    disk.
    """
    if proj_dims % PACK != 0:
        raise ValueError(f"proj_dims must be a multiple of {PACK}")
    if proj_dims > dim:
        raise ValueError("proj_dims must be <= dim")
    g = jax.random.normal(jax.random.PRNGKey(seed), (dim, proj_dims), jnp.float32)
    q, _ = jnp.linalg.qr(g)
    return q[:, :proj_dims]


def fit_scale(proj: Array) -> Array:
    """Global int8 quantization scale: map 4 sigma to the int8 range."""
    rms = jnp.sqrt(jnp.mean(proj.astype(jnp.float32) ** 2))
    return jnp.where(rms > 0, 127.0 / (4.0 * rms), jnp.float32(1.0))


def quantize_pack(proj: Array, scale: Array) -> Array:
    """[..., P] f32 -> [..., P/4] int32 (4 int8 components per word)."""
    p = proj.shape[-1]
    v = jnp.clip(jnp.round(proj * scale), -127, 127).astype(jnp.int32) & 0xFF
    v = v.reshape(*proj.shape[:-1], p // PACK, PACK)
    shifts = jnp.array([0, 8, 16, 24], dtype=jnp.int32)
    return jnp.sum(v << shifts, axis=-1).astype(jnp.int32)


def unpack_raw(packed: Array) -> Array:
    """[..., P/4] int32 -> [..., P] f32 of RAW int8 values (not dequantized).

    Compare against scale-premultiplied query sketches; see module docstring.
    """
    shifts = jnp.array([0, 8, 16, 24], dtype=jnp.int32)
    b = (packed[..., None] >> shifts) & 0xFF
    b = b - ((b & 0x80) << 1)  # sign-extend int8
    out = b.astype(jnp.float32)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * PACK)


def sketch_query(q_prepped: Array, w: Array, scale: Array) -> Array:
    """Project prepped queries and pre-multiply by the quantization scale."""
    return jnp.dot(q_prepped.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32) * scale


def uses_dot(metric: DistanceMetric) -> bool:
    return metric in (DistanceMetric.COSINE, DistanceMetric.DOT_PRODUCT)


@functools.partial(jax.jit, static_argnames=("metric",))
def sketch_distance(qs: Array, raw: Array, metric: DistanceMetric) -> Array:
    """Approximate distances: qs [P] (scaled query sketch) vs raw [..., P]
    unpacked int8 values -> [...]. Monotone surrogate of `metric`; ranking
    only."""
    if uses_dot(metric):
        return -jnp.einsum("...p,p->...", raw, qs, preferred_element_type=jnp.float32)
    diff = raw - qs
    return jnp.einsum("...p,...p->...", diff, diff, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("metric", "dim"))
def sketch_distance_calibrated(
    qs: Array, raw: Array, metric: DistanceMetric, scale: Array, dim: int
) -> Array:
    """Approximate distances on the TRUE metric's scale, so a gated search
    can compare an approximate-queue head against an exact pool's worst
    entry (the cross-queue test in two-level search, spec Algorithm 2).

    For an orthonormal projection W [dim, P], E|W^T v|^2 = (P/dim) |v|^2 and
    E[(W^T a).(W^T b)] = (P/dim) a.b; both query and stored sides carry one
    factor of `scale`, giving the calibrations below. Manhattan uses the
    gaussian L1/L2 ratio sqrt(2 dim / pi) as a coarse surrogate — gating
    only, exact rescoring follows.
    """
    p = raw.shape[-1]
    inv = (dim / p) / (scale * scale)
    if metric == DistanceMetric.DOT_PRODUCT:
        return -jnp.einsum("...p,p->...", raw, qs,
                           preferred_element_type=jnp.float32) * inv
    if metric == DistanceMetric.COSINE:
        sim = jnp.einsum("...p,p->...", raw, qs,
                         preferred_element_type=jnp.float32) * inv
        return 1.0 - sim
    diff = raw - qs
    l2sq = jnp.einsum("...p,...p->...", diff, diff,
                      preferred_element_type=jnp.float32) * inv
    l2 = jnp.sqrt(jnp.maximum(l2sq, 0.0))
    if metric == DistanceMetric.MANHATTAN:
        return l2 * jnp.sqrt(2.0 * dim / jnp.pi)
    return l2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SketchIndex:
    """Persistent sketch bundle for gated search over a built graph.

    - w: [dim, P] projection (reconstructible from seed, stored for safety)
    - scale: f32 scalar quantization scale
    - node_sketch: [N, P/4] int32 packed per-node sketches
    - nbr_sketch: [N, M * P/4] int32 inline neighbor sketches, row-aligned
      with CsrGraph.neighbors: row i is the [M, P/4] word block flattened.
      Kept 2-D because a trailing dimension of P/4 (= 4 words) forces XLA's
      (8, 128) tile layout to pad the minor dim 4 -> 128 lanes — a 32x
      physical inflation that OOMed the 1M build when a [N, M, 4] copy
      materialized.
    """

    w: Array
    scale: Array
    node_sketch: Array
    nbr_sketch: Array

    def tree_flatten(self):
        return (self.w, self.scale, self.node_sketch, self.nbr_sketch), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def proj_dims(self) -> int:
        return self.w.shape[1]

    def storage_bytes(self) -> int:
        return (
            4 * self.w.size + 4
            + 4 * self.node_sketch.size
            + 4 * self.nbr_sketch.size
        )


def build_sketch_index(
    x_prepped: Array,
    neighbors: Array,
    proj_dims: int = 16,
    seed: int = 0,
) -> SketchIndex:
    """Derive a SketchIndex for an existing graph (one-time gather pass)."""
    w = make_projection(x_prepped.shape[1], proj_dims, seed)
    proj = jnp.dot(x_prepped.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32)
    scale = fit_scale(proj)
    node_sketch = quantize_pack(proj, scale)
    n = x_prepped.shape[0]
    nbr_sketch = node_sketch[jnp.clip(neighbors, 0, n - 1)].reshape(n, -1)
    return SketchIndex(w=w, scale=scale, node_sketch=node_sketch,
                       nbr_sketch=nbr_sketch)
