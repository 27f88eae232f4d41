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


# ---------------------------------------------------------------------------
# Fused hop-merge: the sketch-gated hop loop's dedup + sort + AQ-merge network
# ---------------------------------------------------------------------------

_HOLE = 0x3FFFFFFF  # sorts after every real id (n < 2^30)
_SENTINEL = -1


def _ce_rows(d, i, h, desc, tie_break_ids):
    """One bitonic compare-exchange stage along axis 0 (rows = elements,
    lanes = queries): row j pairs with row j XOR h.

    `desc` [L, 1] bool marks rows inside descending-direction blocks.
    XOR-partner addressing via two static rolls + an iota select, so the
    lane (query) axis is never reshaped — every op is elementwise over a
    [L, Q] tile, which is the whole point of running this in VMEM: XLA's
    stage-by-stage lowering round-trips ~16 MB of pool state to HBM per
    stage (benches/sort_micro.py), a Pallas program does ~70 stages on
    VMEM-resident state with one HBM read and one write total.
    """
    L = d.shape[0]
    up = (jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) & h) == 0
    dp = jnp.where(up, jnp.roll(d, -h, axis=0), jnp.roll(d, h, axis=0))
    ip = jnp.where(up, jnp.roll(i, -h, axis=0), jnp.roll(i, h, axis=0))
    if tie_break_ids:
        p_less = (dp < d) | ((dp == d) & (ip < i))
        p_greater = (dp > d) | ((dp == d) & (ip > i))
    else:
        p_less = dp < d
        p_greater = dp > d
    # A slot takes its partner's (value, aux) only when the partner is
    # STRICTLY better for the order the slot wants — on exact key ties
    # both partners keep their own pair, so no aux is lost or duplicated
    # (take_p = p_less == want_min would duplicate the low partner's aux
    # into both slots whenever keys tie).
    want_min = up ^ desc
    # bitwise form: Mosaic cannot lower a select between two i1 vectors
    take_p = (want_min & p_less) | (~want_min & p_greater)
    return jnp.where(take_p, dp, d), jnp.where(take_p, ip, i)


def _bitonic_sort_rows(d, i, *, descending=False, tie_break_ids=False):
    """Full bitonic sort along axis 0 of [L, Q], carrying one aux operand."""
    L = d.shape[0]
    assert L & (L - 1) == 0
    iota = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
    k = 2
    while k <= L:
        h = k // 2
        while h >= 1:
            desc = (iota & k) != 0 if k < L else jnp.full(
                (L, 1), descending)
            if k < L and descending:
                desc = ~desc
            d, i = _ce_rows(d, i, h, desc, tie_break_ids)
            h //= 2
        k *= 2
    return d, i


def _bitonic_merge_rows(d, i):
    """Merge a bitonic [L, Q] sequence (asc run then desc run) ascending."""
    L = d.shape[0]
    assert L & (L - 1) == 0
    desc = jnp.zeros((L, 1), bool)
    h = L // 2
    while h >= 1:
        d, i = _ce_rows(d, i, h, desc, False)
        h //= 2
    return d, i


def _hop_merge_kernel(nd_ref, ni_ref, aqd_ref, aqi_ref,
                      pd_ref, pi_ref, od_ref, oi_ref, *,
                      pw: int, aqw: int, pad_between: int):
    """One query block: dedup the new discoveries, merge them with the
    sorted approximate queue, split off the promote head.

    State is TRANSPOSED — elements on rows, queries on lanes — so every
    sort stage is a static sublane roll + elementwise select and the lane
    axis is never permuted.
    """
    nd = nd_ref[...]          # [Ep, Q] f32, +inf at invalid
    ni = ni_ref[...]          # [Ep, Q] i32, _HOLE at invalid

    # 1. sort by id (asc) so duplicates are adjacent; invalid sort last.
    ni, nd = _bitonic_sort_rows(ni, nd)
    # 2. mark adjacent duplicates (same id => same sketch distance).
    prev = jnp.roll(ni, 1, axis=0)
    first = jax.lax.broadcasted_iota(jnp.int32, ni.shape, 0) == 0
    dup = (ni == prev) & ~first & (ni != _HOLE)
    nd = jnp.where(dup, jnp.inf, nd)
    ni = jnp.where(dup, _HOLE, ni)
    # 3. sort by distance DESCENDING: +inf invalids lead, best trail —
    #    exactly the descending run the bitonic merge wants.
    nd, ni = _bitonic_sort_rows(nd, ni, descending=True)
    # 4. asc(aq) ++ +inf pad ++ desc(new) is bitonic; one merge pass.
    # (pad_between == 0 must skip the empty operand: Mosaic rejects
    # zero-row vector types.)
    q = nd.shape[1]
    parts_d, parts_i = [aqd_ref[...]], [aqi_ref[...]]
    if pad_between:
        parts_d.append(jnp.full((pad_between, q), jnp.inf, nd.dtype))
        parts_i.append(jnp.full((pad_between, q), _HOLE, ni.dtype))
    cd = jnp.concatenate(parts_d + [nd], axis=0)
    ci = jnp.concatenate(parts_i + [ni], axis=0)
    cd, ci = _bitonic_merge_rows(cd, ci)
    ci = jnp.where(jnp.isinf(cd), _SENTINEL, ci)
    pd_ref[...] = cd[:pw]
    pi_ref[...] = ci[:pw]
    od_ref[...] = cd[pw:pw + aqw]
    oi_ref[...] = ci[pw:pw + aqw]


@functools.partial(jax.jit,
                   static_argnames=("promote_width", "q_block", "interpret"))
def _hop_merge_pallas(nd: Array, ni: Array, aqd: Array, aqi: Array,
                      *, promote_width: int, q_block: int = 512,
                      interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, e = nd.shape
    aqw = aqd.shape[1]
    ep = 8
    while ep < e:  # power of two (the sort networks need it)
        ep *= 2
    tot2 = 1
    while tot2 < aqw + ep:
        tot2 *= 2
    pad_between = tot2 - aqw - ep
    bp = _round_up(b, q_block)

    # element-major layout: [B, E] -> [Ep, Bp]
    ndt = jnp.full((ep, bp), jnp.inf, jnp.float32)
    ndt = ndt.at[:e, :b].set(nd.T.astype(jnp.float32))
    nit = jnp.full((ep, bp), _HOLE, jnp.int32)
    nit = nit.at[:e, :b].set(jnp.where(nd.T == jnp.inf, _HOLE,
                                       ni.T.astype(jnp.int32)))
    aqdt = jnp.full((aqw, bp), jnp.inf, jnp.float32)
    aqdt = aqdt.at[:, :b].set(aqd.T.astype(jnp.float32))
    aqit = jnp.full((aqw, bp), _SENTINEL, jnp.int32)
    aqit = aqit.at[:, :b].set(aqi.T.astype(jnp.int32))
    # aq invalid slots must sort last but keep SENTINEL on output; the
    # kernel maps inf -> SENTINEL at the end, so their id value in the
    # merge does not matter.

    grid = (bp // q_block,)
    specs = lambda rows: pl.BlockSpec((rows, q_block), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    pd, pi, od, oi = pl.pallas_call(
        functools.partial(_hop_merge_kernel, pw=promote_width, aqw=aqw,
                          pad_between=pad_between),
        out_shape=(
            jax.ShapeDtypeStruct((promote_width, bp), jnp.float32),
            jax.ShapeDtypeStruct((promote_width, bp), jnp.int32),
            jax.ShapeDtypeStruct((aqw, bp), jnp.float32),
            jax.ShapeDtypeStruct((aqw, bp), jnp.int32),
        ),
        grid=grid,
        in_specs=[specs(ep), specs(ep), specs(aqw), specs(aqw)],
        out_specs=(specs(promote_width), specs(promote_width),
                   specs(aqw), specs(aqw)),
        interpret=interpret,
    )(ndt, nit, aqdt, aqit)
    return (pd[:, :b].T, pi[:, :b].T, od[:, :b].T, oi[:, :b].T)


def _hop_merge_xla(nd: Array, ni: Array, aqd: Array, aqi: Array,
                   *, promote_width: int):
    """Reference composition (today's hop-loop sequence) for one query or a
    leading batch dim: sort-by-id dedup, bitonic AQ merge, promote split."""
    from islands_tpu.ops.merge import merge_sorted_with_new

    # Invalid (+inf) slots get a distinct giant id so the adjacent-dedup
    # can never pair them with a valid occurrence of the same node (the
    # Pallas path remaps identically at layout time).
    ni = jnp.where(jnp.isinf(nd), _HOLE, ni)
    sorted_ids, d_sorted = jax.lax.sort((ni, nd), num_keys=1)
    prev = jnp.concatenate(
        [jnp.full((*sorted_ids.shape[:-1], 1), -2, sorted_ids.dtype),
         sorted_ids[..., :-1]], axis=-1)
    keep = (d_sorted < jnp.inf) & (sorted_ids != prev)
    new_ids = jnp.where(keep, sorted_ids, _SENTINEL).astype(jnp.int32)
    new_d = jnp.where(keep, d_sorted, jnp.inf)
    mg_d, mg_i = merge_sorted_with_new(aqd, aqi, new_d, new_ids)
    pw = promote_width
    return (mg_d[..., :pw], mg_i[..., :pw],
            mg_d[..., pw:pw + aqd.shape[-1]],
            mg_i[..., pw:pw + aqd.shape[-1]])


_HOP_MERGE_OPS: dict = {}


def hop_merge_op_for(promote_width: int):
    """Cached custom-vmap hop-merge op for the sketch-gated search loop.

    Single-query calls (and non-TPU platforms) run the XLA composition;
    tracing vmap(search) swaps in one whole-batch Pallas kernel per hop
    (same pattern as pq.gated_block_scorer_for). Inputs: nd/ni [E] approx
    distances (+inf invalid) and ids (any value at invalid slots), aqd/aqi
    [A] the sorted approximate queue. Returns (prom_d [pw], prom_i [pw],
    aq_d' [A], aq_i' [A]) with SENTINEL ids at invalid slots."""
    if promote_width in _HOP_MERGE_OPS:
        return _HOP_MERGE_OPS[promote_width]

    from jax import custom_batching

    @custom_batching.custom_vmap
    def op(nd, ni, aqd, aqi):
        return _hop_merge_xla(nd, ni, aqd, aqi,
                              promote_width=promote_width)

    @op.def_vmap
    def _rule(axis_size, in_batched, nd, ni, aqd, aqi):
        args = []
        for a, batched in zip((nd, ni, aqd, aqi), in_batched):
            if not batched:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            args.append(a)
        if _on_tpu():
            out = _hop_merge_pallas(*args, promote_width=promote_width)
        else:
            out = _hop_merge_xla(*args, promote_width=promote_width)
        return out, (True, True, True, True)

    _HOP_MERGE_OPS[promote_width] = op
    return op
