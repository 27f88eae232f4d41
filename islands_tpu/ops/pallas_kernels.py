"""Pallas TPU kernels for the hot scan ops.

Two ops where hand-scheduling beats XLA's default lowering:

1. `adc_scan` — PQ asymmetric-distance full-corpus scan:
   out[b, i] = sum_s tables[b, s, codes[i, s]].
   The natural formulation is a gather (table lookup per code byte), which
   TPUs execute element-serialized. The MXU formulation used here turns each
   subspace into a one-hot matmul: tables_s [TB, K] x onehot(codes_s) [K, TN]
   -> [TB, TN], accumulated over subspaces — every FLOP lands on the systolic
   array and the only memory traffic is one pass over the codes.
   (Reference semantics: table_distance, src/core/pq.rs:341-348, over all
   vectors; powers brute-force PQ scans and the PQ-gated first stage.)

2. `pairwise_l2` / `pairwise_neg_dot` — fused distance-matrix tiles:
   one MXU matmul per [TB, TN] tile with the |q|^2 + |x|^2 - 2qx epilogue
   (and optional sqrt) applied in VMEM before writeback, so the [B, N]
   intermediate is materialized exactly once.
   (Reference semantics: scalar loops in src/core/distance.rs:92-115.)

Both fall back to pure-jnp implementations off-TPU (tests run both paths and
assert equality; the CPU test mesh has no Mosaic backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# ADC scan
# ---------------------------------------------------------------------------


def _adc_kernel(tables_ref, codes_ref, out_ref, *, num_sq: int, k: int):
    """One [TB, TN] tile: accumulate one-hot matmuls over subspaces."""
    tb = tables_ref.shape[0]
    tn = codes_ref.shape[0]
    acc = jnp.zeros((tb, tn), jnp.float32)

    # num_sq is small (8/16): unrolled python loop, all matmuls on the MXU.
    for s in range(num_sq):
        t = tables_ref[:, s, :]  # [TB, K]
        c = codes_ref[:, s]  # [TN] int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
        onehot = (iota == c[:, None]).astype(jnp.float32)  # [TN, K]
        # One-hot matmul is exact selection: bf16 MXU passes would only
        # perturb the copied table values, so force full f32 precision.
        acc = acc + jax.lax.dot_general(
            t, onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_n"))
def _adc_scan_pallas(
    tables: Array, codes: Array, tile_b: int = 8, tile_n: int = 512
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, num_sq, k = tables.shape
    n = codes.shape[0]
    bp, np_ = _round_up(b, tile_b), _round_up(n, tile_n)
    tables_p = jnp.pad(tables, ((0, bp - b), (0, 0), (0, 0)))
    codes_p = jnp.pad(codes.astype(jnp.int32), ((0, np_ - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_adc_kernel, num_sq=num_sq, k=k),
        out_shape=jax.ShapeDtypeStruct((bp, np_), jnp.float32),
        grid=(bp // tile_b, np_ // tile_n),
        in_specs=[
            pl.BlockSpec(
                (tile_b, num_sq, k), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n, num_sq), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * num_sq * k,
            bytes_accessed=bp * num_sq * k * 4 + np_ * num_sq * 4 + bp * np_ * 4,
            transcendentals=0,
        ),
    )(tables_p, codes_p)
    return out[:b, :n]


@jax.jit
def _adc_scan_jnp(tables: Array, codes: Array) -> Array:
    c = codes.astype(jnp.int32)  # [N, S]
    g = jnp.take_along_axis(
        tables[:, None, :, :], c[None, :, :, None], axis=3
    )[..., 0]  # [B, N, S]
    return jnp.sum(g, axis=-1)


def adc_scan(tables: Array, codes: Array) -> Array:
    """Full ADC scan: tables [B, S, K] f32, codes [N, S] -> sums [B, N] f32
    (no sqrt — callers finalize per metric, see pq.gated_block_scorer_for)."""
    if _on_tpu():
        return _adc_scan_pallas(tables, codes)
    return _adc_scan_jnp(tables, codes)


# ---------------------------------------------------------------------------
# Gated ADC: per-query candidate scoring (the two-level hop's hot op)
# ---------------------------------------------------------------------------


def _gated_adc_kernel(tables_ref, codes_ref, out_ref, acc_ref, *,
                      num_sq: int, k: int, group: int, ep: int):
    """One query-group: out[g, e] = sum_s tables[g, s, codes[g, e, s]].

    The gated hop scores each query against its OWN candidates, so the
    full-scan trick (adc_scan: one [TB, K] x [K, TN] matmul, codes shared
    by every query) does not apply — per query the one-hot contraction is
    a matvec and the MXU runs at 1/128 utilization (measured 0.3-1% of
    bf16 peak via XLA's einsum lowering, benches/twolevel_ablate.py: the
    ADC line is 70% of the whole hop loop).

    Dilution trick: stack the GROUP's candidates as G*Ep one-hot columns
    and matmul against all G query tables at once —
        acc [G, G*Ep] += tables_s [G, K] x onehot(codes_s) [K, G*Ep]
    — then keep only the block diagonal (query g's slice of columns).
    G-fold FLOP waste, but the MXU output tile [G=8, G*Ep] is full-width,
    a 128/G = 16x utilization win over the matvec form. The one-hot is
    generated per subspace in VMEM (iota compare) so, as in adc_scan, the
    only HBM traffic is one pass over codes + tables.
    """
    acc_ref[:] = jnp.zeros_like(acc_ref)
    ge = group * ep
    for s in range(num_sq):  # num_sq <= 64: unrolled, all dots on the MXU
        c_s = codes_ref[0, s, :]  # [G*Ep] int32 (lane dim)
        iota = jax.lax.broadcasted_iota(jnp.int32, (k, ge), 0)
        onehot = (iota == c_s[None, :]).astype(jnp.bfloat16)  # [K, G*Ep]
        t_s = tables_ref[:, s, :].astype(jnp.bfloat16)  # [G, K]
        # bf16 operands / f32 accumulation — identical numerics to the
        # XLA einsum path in pq._gated_block_scorer (one-hot values are
        # exact in bf16; only table values round, ~0.4% rel).
        acc_ref[:] += jax.lax.dot_general(
            t_s, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    for g in range(group):
        out_ref[g, :] = acc_ref[g, g * ep:(g + 1) * ep]


@functools.partial(jax.jit, static_argnames=("group",))
def _gated_adc_pallas(tables: Array, codes: Array, group: int = 8) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, num_sq, k = tables.shape
    e = codes.shape[1]
    ep = _round_up(e, 128)
    gb = _round_up(b, group)
    # Pad codes with k: iota == k never holds, so padded columns/rows sum
    # to 0 and are sliced away / masked by the caller.
    codes_p = jnp.pad(codes.astype(jnp.int32),
                      ((0, gb - b), (0, ep - e), (0, 0)),
                      constant_values=k)
    tables_p = jnp.pad(tables, ((0, gb - b), (0, 0), (0, 0)))
    # [GB, Ep, S] -> [GB//G, S, G*Ep]: per subspace the group's candidate
    # codes land contiguous on the lane axis (query g owns lanes
    # [g*Ep, (g+1)*Ep), matching the kernel's diagonal-block extraction).
    codes_t = (
        codes_p.reshape(gb // group, group, ep, num_sq)
        .transpose(0, 3, 1, 2)
        .reshape(gb // group, num_sq, group * ep)
    )

    out = pl.pallas_call(
        functools.partial(_gated_adc_kernel, num_sq=num_sq, k=k,
                          group=group, ep=ep),
        out_shape=jax.ShapeDtypeStruct((gb, ep), jnp.float32),
        grid=(gb // group,),
        in_specs=[
            pl.BlockSpec((group, num_sq, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_sq, group * ep), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, ep), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((group, group * ep), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * gb * group * ep * num_sq * k,
            bytes_accessed=(gb * num_sq * k * 4 + gb * ep * num_sq * 4
                            + gb * ep * 4),
            transcendentals=0,
        ),
    )(tables_p, codes_t)
    return out[:b, :e]


@jax.jit
def _gated_adc_jnp(tables: Array, codes: Array) -> Array:
    c = codes.astype(jnp.int32)  # [B, E, S]
    k = tables.shape[-1]
    onehot = (c[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, k), 3))
    return jnp.einsum(
        "besk,bsk->be", onehot.astype(jnp.bfloat16),
        tables.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )


def gated_adc_sums(tables: Array, codes: Array, group: int = 8) -> Array:
    """Batched gated ADC: tables [B, S, K] f32, codes [B, E, S] int -> sums
    [B, E] f32 (no metric finalize/masking — see pq.gated_block_scorer_for).
    Pallas grouped-dilution kernel on TPU, einsum fallback elsewhere."""
    if _on_tpu():
        return _gated_adc_pallas(tables, codes, group=group)
    return _gated_adc_jnp(tables, codes)


# ---------------------------------------------------------------------------
# Fused pairwise distance tiles
# ---------------------------------------------------------------------------


def _l2_kernel(q_ref, x_ref, out_ref, *, squared: bool):
    q = q_ref[:]  # [TB, d]
    x = x_ref[:]  # [TN, d]
    cross = jax.lax.dot_general(
        q, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    d2 = jnp.maximum(q2 + x2.T - 2.0 * cross, 0.0)
    out_ref[:] = d2 if squared else jnp.sqrt(d2)


def _dot_kernel(q_ref, x_ref, out_ref):
    out_ref[:] = -jax.lax.dot_general(
        q_ref[:], x_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("kernel_name", "squared", "tile_b", "tile_n"))
def _pairwise_pallas(
    q: Array, x: Array, kernel_name: str, squared: bool = False,
    tile_b: int = 256, tile_n: int = 512,
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = q.shape
    n = x.shape[0]
    tile_b = min(tile_b, _round_up(b, 8))
    tile_n = min(tile_n, _round_up(n, 128))
    bp, np_ = _round_up(b, tile_b), _round_up(n, tile_n)
    qp = jnp.pad(q.astype(jnp.float32), ((0, bp - b), (0, 0)))
    xp = jnp.pad(x.astype(jnp.float32), ((0, np_ - n), (0, 0)))

    kern = (
        functools.partial(_l2_kernel, squared=squared)
        if kernel_name == "l2" else _dot_kernel
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bp, np_), jnp.float32),
        grid=(bp // tile_b, np_ // tile_n),
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * d,
            bytes_accessed=(bp * d + np_ * d + bp * np_) * 4,
            transcendentals=0,
        ),
    )(qp, xp)
    return out[:b, :n]


def pairwise_l2(
    q: Array, x: Array, squared: bool = False, use_pallas: bool = False
) -> Array:
    """L2 distance matrix [B, N]. XLA's own matmul+epilogue fusion measured
    faster than the hand tile at full f32 precision (1.6ms vs 5.8ms for
    512x20k x 128d), so the Pallas path is opt-in."""
    if use_pallas and _on_tpu() and q.shape[-1] >= 8:
        return _pairwise_pallas(q, x, "l2", squared=squared)
    q = q.astype(jnp.float32)
    x = x.astype(jnp.float32)
    d2 = (
        jnp.sum(q * q, axis=1)[:, None]
        + jnp.sum(x * x, axis=1)[None, :]
        - 2.0 * jnp.dot(q, x.T, preferred_element_type=jnp.float32)
    )
    d2 = jnp.maximum(d2, 0.0)
    return d2 if squared else jnp.sqrt(d2)


def pairwise_neg_dot(q: Array, x: Array, use_pallas: bool = False) -> Array:
    """Negative-dot-product matrix [B, N] (Pallas path opt-in; see
    pairwise_l2)."""
    if use_pallas and _on_tpu() and q.shape[-1] >= 8:
        return _pairwise_pallas(q, x, "dot")
    return -jnp.dot(
        q.astype(jnp.float32), x.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
