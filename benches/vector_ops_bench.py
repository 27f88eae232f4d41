"""Distance-kernel microbenchmarks (criterion parity: benches/vector_ops.rs
— 4 metrics at 128d, dimension sweep to 1024, batch sweep to 1000).

Run: python benches/vector_ops_bench.py  (prints JSON lines)
"""

import json
import time

import numpy as np


def timeit(fn, *args, reps=20):
    import jax

    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / reps


def main():
    import jax.numpy as jnp

    from islands_tpu.core.config import DistanceMetric
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    # metric comparison at 128d, 1000x10000 (batch_calculate role)
    q = jnp.asarray(rng.standard_normal((1000, 128)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((10000, 128)).astype(np.float32))
    for metric in DistanceMetric:
        dt = timeit(lambda a, b: dist_ops.pairwise_distance(a, b, metric), q, x)
        print(json.dumps({
            "bench": "pairwise_1000x10000", "metric": metric.value,
            "ms": round(dt * 1000, 3),
            "gflops": round(2 * 1000 * 10000 * 128 / dt / 1e9, 1),
        }))

    # dimension sweep (reference: 32..1024)
    for d in (32, 128, 512, 1024):
        qd = jnp.asarray(rng.standard_normal((1000, d)).astype(np.float32))
        xd = jnp.asarray(rng.standard_normal((10000, d)).astype(np.float32))
        dt = timeit(
            lambda a, b: dist_ops.pairwise_distance(a, b, DistanceMetric.COSINE),
            qd, xd,
        )
        print(json.dumps({"bench": "cosine_dim_sweep", "dim": d,
                          "ms": round(dt * 1000, 3)}))


if __name__ == "__main__":
    main()
