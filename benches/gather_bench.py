"""Gather-wall microbenchmark: XLA row gather vs a Pallas pipelined-DMA
gather kernel, plus block-gather and flat-scatter rates.

This is the measurement behind the round-2 engine redesign (docs/design.md
§8/§10): on v5e, random row gathers cost ~10 ns/row regardless of row SIZE
(count-bound), a hand-written double-buffered row-DMA Pallas kernel is ~8x
slower than XLA's native gather (kept here as the reproducible negative
result), block gathers amortize ~25x per neighbor, and scatters are fast
only in flat single-axis form. Timing methodology: chain data-dependent
iterations inside ONE jit and fetch the result — naive per-call timing
through the remote-execution tunnel measures dispatch, not compute.

Run on the chip: /opt/venv/bin/python benches/gather_bench.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D = 1_000_000, 128
I1, I2 = 10, 50


def bench(fn, *args, label="", per=1):
    np.asarray(fn(*args, I1))
    np.asarray(fn(*args, I2))
    t0 = time.perf_counter(); np.asarray(fn(*args, I1)); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(fn(*args, I2)); t_b = time.perf_counter() - t0
    dt = (t_b - t_a) / (I2 - I1)
    print(f"{label}: {dt * 1e3:.3f} ms/iter ({dt / per * 1e9:.2f} ns/unit)")
    return dt


@partial(jax.jit, static_argnames=("iters",))
def chained_row_gather(x, ids0, iters):
    n = x.shape[0]

    def body(i, ids):
        rows = x[jnp.clip(ids, 0, n - 1)]
        s = jnp.sum(rows, axis=1).astype(jnp.int32)
        nxt = ids + 1 + (s & 7)
        return jnp.where(nxt >= n, nxt - n, nxt)

    return jax.lax.fori_loop(0, iters, body, ids0)


@partial(jax.jit, static_argnames=("iters",))
def chained_block_gather(b, ids0, iters):
    n = b.shape[0]

    def body(i, ids):
        rows = b[jnp.clip(ids, 0, n - 1)]
        s = jnp.sum(rows, axis=(1, 2)).astype(jnp.int32)
        nxt = ids + 1 + (s & 7)
        return jnp.where(nxt >= n, nxt - n, nxt)

    return jax.lax.fori_loop(0, iters, body, ids0)


# --- Pallas pipelined row-DMA gather (the measured-slower alternative) -----

CHUNK, DEPTH = 1024, 16


def _gather_kernel(ids_ref, corpus, out_ref, sems):
    c = pl.program_id(0)
    base = c * CHUNK

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            corpus.at[ids_ref[base + i]], out_ref.at[i], sems.at[slot]
        )

    for j in range(DEPTH):
        get_dma(j, j).start()

    def body(i, _):
        get_dma(i % DEPTH, i).wait()

        @pl.when(i + DEPTH < CHUNK)
        def _():
            get_dma((i + DEPTH) % DEPTH, i + DEPTH).start()

        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


@jax.jit
def pallas_gather(x, ids):
    k = ids.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (CHUNK, D), lambda c, ids: (c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((k, D), x.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, x)


@partial(jax.jit, static_argnames=("iters",))
def chained_pallas_gather(x, ids0, iters):
    n = x.shape[0]

    def body(i, ids):
        rows = pallas_gather(x, jnp.clip(ids, 0, n - 1))
        s = jnp.sum(rows, axis=1).astype(jnp.int32)
        nxt = ids + 1 + (s & 7)
        return jnp.where(nxt >= n, nxt - n, nxt)

    return jax.lax.fori_loop(0, iters, body, ids0)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), dtype=jnp.float32)
    jax.block_until_ready(x)

    for k in (131072, 1048576):
        ids0 = jax.random.randint(jax.random.PRNGKey(k), (k,), 0, N)
        bench(chained_row_gather, x, ids0,
              label=f"xla row gather f32[{N},{D}] k={k}", per=k)

    k = 131072
    ids0 = jax.random.randint(jax.random.PRNGKey(3), (k,), 0, N)
    try:
        ref = np.asarray(x[ids0])
        got = np.asarray(pallas_gather(x, ids0))
        assert np.array_equal(ref, got), "pallas gather mismatch"
        bench(chained_pallas_gather, x, ids0,
              label=f"pallas DMA gather (depth {DEPTH}) k={k}", per=k)
    except Exception as e:  # CPU/interpret environments lack Mosaic
        print(f"pallas gather skipped: {type(e).__name__}: {e}")

    bw, p4 = 60, 8
    blocks = jax.random.randint(
        jax.random.PRNGKey(5), (N, bw * p4), 0, 2**31 - 1, dtype=jnp.int32
    )
    jax.block_until_ready(blocks)
    for k in (4096, 16384):
        ids0 = jax.random.randint(jax.random.PRNGKey(k + 7), (k,), 0, N)
        bench(chained_block_gather,
              blocks.reshape(N, bw, p4), ids0,
              label=f"block gather i32[{N},{bw},{p4}] k={k}", per=k)


if __name__ == "__main__":
    main()
