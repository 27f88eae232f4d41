"""Fixed-shape sorted-pool maintenance primitives for the search hop loop.

The reference maintains its candidate/result sets with a BinaryHeap
(src/core/leann.rs:899-988). The TPU formulation keeps a sorted fixed-width
pool and merges each hop's discoveries into it; round 1/2 did this with a
full `lax.sort` over the concatenation — a bitonic SORT network,
O(L log^2 L) compare-exchange stages — every hop, and round-2 profiling
measured that tuple sort as the largest per-hop cost at 1M scale.

Both merge inputs are (or can cheaply be made) sorted, so a full sort is
wasted work. This module provides:

- `bitonic_merge(d, aux)`: merge an ascending run followed by a descending
  run (a bitonic sequence) into fully-sorted order in O(L log L) — log2(L)
  compare-exchange stages instead of the sort network's ~log2(L)^2/2. Each
  stage is elementwise min/max/select over the lane dimension (VPU-friendly,
  no cross-query work), vmapping cleanly over the query batch.
- `merge_sorted_with_new(pool_d, pool_aux, new_d, new_aux)`: the hop-loop
  composition — sort the (small) discovery list DESCENDING, pad the
  concatenation to a power of two with +inf between the runs (keeping it
  bitonic), and bitonic-merge.
- `pack_id_expanded` / `unpack_id_expanded`: the pool's (id, expanded) pair
  packed into one int32 so merges carry 2 sort operands instead of 3
  (distance + code), shrinking every compare-exchange stage.

(The hop loops dedup discoveries with a sort-by-id pass in core/search.py
`_dedup_sorted`; an [E, E] equality-matrix alternative was prototyped here
in round 3 but never wired in or measured, so it was removed — see git
history `dedup_first` if that experiment is revisited.)

Distances must be non-NaN (inf padding is fine) — comparisons with NaN
would break the merge invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pack_id_expanded(ids: Array, expanded: Array) -> Array:
    """Pack (id int32 < 2^30, expanded bool) into one int32: id*2 + expanded.

    SENTINEL (-1) ids with expanded=True pack to -1 and round-trip exactly
    (arithmetic shift right restores -1)."""
    return (ids.astype(jnp.int32) << 1) | expanded.astype(jnp.int32)


def unpack_id_expanded(code: Array) -> tuple[Array, Array]:
    """Inverse of pack_id_expanded: -> (ids, expanded)."""
    return code >> 1, (code & 1).astype(bool)


def bitonic_merge(d: Array, aux: Array) -> tuple[Array, Array]:
    """Sort a BITONIC sequence (ascending run then descending run) of
    power-of-two length L ascending, carrying one aux operand.

    log2(L) compare-exchange stages; at stage half-size h, element j is
    compared with element j+h within each 2h block (the classic bitonic
    merge network), implemented as reshapes + elementwise select so it
    vectorizes over any leading batch dimensions."""
    L = d.shape[-1]
    assert L & (L - 1) == 0, f"bitonic_merge needs power-of-two length, got {L}"
    lead = d.shape[:-1]
    h = L // 2
    while h >= 1:
        ds = d.reshape(*lead, L // (2 * h), 2, h)
        as_ = aux.reshape(*lead, L // (2 * h), 2, h)
        lo, hi = ds[..., 0, :], ds[..., 1, :]
        alo, ahi = as_[..., 0, :], as_[..., 1, :]
        swap = lo > hi
        d = jnp.stack(
            [jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=-2
        ).reshape(*lead, L)
        aux = jnp.stack(
            [jnp.where(swap, ahi, alo), jnp.where(swap, alo, ahi)], axis=-2
        ).reshape(*lead, L)
        h //= 2
    return d, aux


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def merge_sorted_with_new(
    pool_d: Array, pool_aux: Array, new_d: Array, new_aux: Array
) -> tuple[Array, Array]:
    """Merge an ASCENDING-sorted pool [P] with UNSORTED discoveries [E]
    (invalid entries at +inf), returning the first P+E entries ascending.

    The discoveries are sorted descending (one 2-operand sort at width E —
    needed in any formulation), the concatenation asc++pad(+inf)++desc is
    bitonic by construction (+inf padding sits between the runs), and one
    bitonic merge finishes the job. Total cost: sort(E) + log2(P+E) stages,
    vs the previous full sort network over P+E."""
    p = pool_d.shape[-1]
    e = new_d.shape[-1]
    total = _next_pow2(p + e)
    pad = total - p - e
    # Descending discovery sort: ascending sort of negated keys. +inf
    # invalid entries become -inf and lead the descending run, which is
    # exactly where the bitonic pattern wants them.
    neg_d, new_aux = jax.lax.sort((-new_d, new_aux), num_keys=1)
    new_d = -neg_d
    lead = pool_d.shape[:-1]
    inf_pad = jnp.full((*lead, pad), jnp.inf, dtype=pool_d.dtype)
    aux_pad = jnp.full((*lead, pad), -1, dtype=pool_aux.dtype)
    d = jnp.concatenate([pool_d, inf_pad, new_d], axis=-1)
    aux = jnp.concatenate([pool_aux, aux_pad, new_aux], axis=-1)
    d, aux = bitonic_merge(d, aux)
    return d[..., : p + e], aux[..., : p + e]
