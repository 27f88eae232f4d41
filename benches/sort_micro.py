"""Microbench: where does the 128-d hop loop's ~34 ms merge network go?

The hop loop issues, per hop per query: one lax.sort dedup over the 160
discoveries, one lax.sort descending pre-sort inside the AQ
merge_sorted_with_new, one small lax.sort inside the pool merge, one
lax.top_k(ef=32, k=2), plus two hand-rolled bitonic merge networks
(ops/merge.bitonic_merge). BENCH_SKETCH_ABLATE pins the whole network at
~34 ms/batch (~3 ms per hop at i=10-12) but individual removals are
near-free, so this measures each PRIMITIVE at the production shapes
([B=4096] queries) to find which lowering burns the time — XLA's sort HLO
vs hand-rolled reshape-form bitonic networks (candidate replacement).

Timing: chained dependent iterations inside one jit (CLAUDE.md fact 11) —
each step's input is the previous step's input scaled by a scalar function
of the output, so steps serialize — differential long-vs-short chain,
output copied to host (fact 19). Run SOLO on the chip.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from islands_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from islands_tpu.ops.merge import bitonic_merge, merge_sorted_with_new

B = 4096
REPS = 5


def bitonic_sort(d, aux):
    """Full bitonic sort (ascending) of the last axis, carrying one aux
    operand. Reshape + elementwise min/max form, no lax.sort HLO."""
    L = d.shape[-1]
    assert L & (L - 1) == 0
    lead = d.shape[:-1]
    k = 2
    while k <= L:
        j = k // 2
        while j >= 1:
            ds = d.reshape(*lead, L // (2 * j), 2, j)
            as_ = aux.reshape(*lead, L // (2 * j), 2, j)
            lo, hi = ds[..., 0, :], ds[..., 1, :]
            alo, ahi = as_[..., 0, :], as_[..., 1, :]
            nblk = L // (2 * j)
            # bitonic direction flips per k-block: descending where
            # (element_index & k) != 0; constant within each 2j block.
            desc = ((jnp.arange(nblk) * 2 * j) & k) != 0
            desc = desc[:, None]
            swap = (lo > hi) ^ desc
            d = jnp.stack(
                [jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)], axis=-2
            ).reshape(*lead, L)
            aux = jnp.stack(
                [jnp.where(swap, ahi, alo), jnp.where(swap, alo, ahi)],
                axis=-2,
            ).reshape(*lead, L)
            j //= 2
        k *= 2
    return d, aux


def chainable(fn):
    """Wrap op (d,i)->(anything...) into a shape-preserving chain step."""

    def step(d, i):
        outs = fn(d, i)
        dep = jnp.float32(0)
        for o in jax.tree.leaves(outs):
            v = jnp.where(jnp.isfinite(o), o, 0).astype(jnp.float32)
            dep = dep + jnp.mean(v) * 1e-9
        return d * (1.0 + dep) + dep, i + (dep > 2.0).astype(i.dtype)

    return step


def time_chain(fn, d, i, label, results):
    step = chainable(fn)
    short, long = 4, 20

    def chain(n):
        @jax.jit
        def run(d, i):
            def body(carry, _):
                return step(*carry), ()

            (d, i), _ = jax.lax.scan(body, (d, i), None, length=n)
            return d, i

        return run

    r_s, r_l = chain(short), chain(long)
    np.asarray(r_s(d, i)[0])
    np.asarray(r_l(d, i)[0])
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(r_s(d, i)[0])
        t1 = time.perf_counter()
        np.asarray(r_l(d, i)[0])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (long - short))
    per = float(np.median(ts))
    row = {"op": label, "us_per_call": round(per * 1e6, 1),
           "ms_per_12hops": round(per * 12 * 1e3, 2)}
    results.append(row)
    print(json.dumps(row), flush=True)


def main():
    rng = np.random.default_rng(0)
    results = []

    d256 = jnp.asarray(rng.standard_normal((B, 256)).astype(np.float32))
    i256 = jnp.asarray(rng.integers(0, 1 << 20, (B, 256)), jnp.int32)

    # the dedup sort: 2-operand lax.sort keyed on int ids, [B, 160]
    time_chain(lambda d, i: jax.lax.sort((i[:, :160], d[:, :160]),
                                         num_keys=1),
               d256, i256, "laxsort_id160", results)
    # same keyed on f32 distance
    time_chain(lambda d, i: jax.lax.sort((d[:, :160], i[:, :160]),
                                         num_keys=1),
               d256, i256, "laxsort_d160", results)
    # hand-rolled bitonic full sort, padded shape [B, 256]
    time_chain(bitonic_sort, d256, i256, "bitonic_sort256", results)

    def bitonic_sort160(d, i):
        pd = jnp.concatenate(
            [d[:, :160], jnp.full((B, 96), jnp.inf, d.dtype)], -1)
        pi = jnp.concatenate([i[:, :160], jnp.full((B, 96), -1, i.dtype)],
                             -1)
        return bitonic_sort(pd, pi)

    time_chain(bitonic_sort160, d256, i256, "bitonic_sort160pad", results)

    # the AQ merge as composed today (lax.sort presort inside)
    def aq_merge_today(d, i):
        aqd = jax.lax.sort(d[:, :64], dimension=-1)
        return merge_sorted_with_new(aqd, i[:, :64], d[:, 64:224],
                                     i[:, 64:224])

    time_chain(aq_merge_today, d256, i256, "aqmerge_today224", results)

    # same merge with the descending pre-sort hand-rolled
    def aq_merge_bitonic(d, i):
        aqd = jax.lax.sort(d[:, :64], dimension=-1)
        nd = jnp.concatenate(
            [d[:, 64:224], jnp.full((B, 96), -jnp.inf, d.dtype)], -1)
        ni = jnp.concatenate(
            [i[:, 64:224], jnp.full((B, 96), -1, i.dtype)], -1)
        sd, si = bitonic_sort(-nd, ni)
        sd = -sd  # descending, -inf pad now trails as +inf? (leads) — ok for timing
        md = jnp.concatenate([aqd, sd[:, :192]], -1)
        mi = jnp.concatenate([i[:, :64], si[:, :192]], -1)
        return bitonic_merge(md, mi)

    time_chain(aq_merge_bitonic, d256, i256, "aqmerge_bitonic", results)

    # pool merge at p16: 32-pool + 16 promoted -> 64 network
    def pool_merge(d, i):
        aqd = jax.lax.sort(d[:, :32], dimension=-1)
        return merge_sorted_with_new(aqd, i[:, :32], d[:, 32:48],
                                     i[:, 32:48])

    time_chain(pool_merge, d256, i256, "poolmerge_p16", results)

    # pool merge at p48 (the round-4 rung): 32 + 48 -> 128 network
    def pool_merge48(d, i):
        aqd = jax.lax.sort(d[:, :32], dimension=-1)
        return merge_sorted_with_new(aqd, i[:, :32], d[:, 32:80],
                                     i[:, 32:80])

    time_chain(pool_merge48, d256, i256, "poolmerge_p48", results)

    # expansion select: lax.top_k(32, k=2) vs argmin-mask iteration
    time_chain(lambda d, i: jax.lax.top_k(-d[:, :32], 2),
               d256, i256, "lax_topk2_of32", results)

    def topk2_iter(d, i):
        x = d[:, :32]
        i1 = jnp.argmin(x, axis=-1)
        d1 = jnp.min(x, axis=-1)
        lane = jnp.arange(32)[None, :]
        x2 = jnp.where(lane == i1[:, None], jnp.inf, x)
        i2 = jnp.argmin(x2, axis=-1)
        d2 = jnp.min(x2, axis=-1)
        return jnp.stack([d1, d2], -1), jnp.stack([i1, i2], -1)

    time_chain(topk2_iter, d256, i256, "iter_topk2_of32", results)

    out = (pathlib.Path(__file__).resolve().parent.parent
           / "BENCH_SORT_MICRO.json")
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
