"""PQ microbenchmarks (criterion parity: benches/pq_compression.rs — train/
encode/decode/asymmetric/table-ADC, subquantizer sweep 4-32).

Run: python benches/pq_bench.py
"""

import json
import time

import numpy as np


def timeit(fn, *args, reps=5):
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

    from islands_tpu.core.config import DistanceMetric, PQConfig
    from islands_tpu.core.pq import ProductQuantizer, pq_scan
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    n, d = 100_000, 128
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    for sq in (4, 8, 16, 32):
        pq = ProductQuantizer(PQConfig(num_subquantizers=sq, seed=0))
        t0 = time.perf_counter()
        pq.train(x)
        train_s = time.perf_counter() - t0
        enc_s = timeit(pq.encode, x, reps=3)
        codes = pq.encode(x)
        q = x[:256]
        scan_s = timeit(
            lambda qq, cc: pq_scan(pq, qq, cc, DistanceMetric.EUCLIDEAN), q, codes,
            reps=10,
        )
        print(json.dumps({
            "bench": "pq", "subquantizers": sq,
            "train_s": round(train_s, 2),
            "encode_s": round(enc_s, 3),
            "encode_vectors_per_s": round(n / enc_s),
            "adc_scan_256x100k_ms": round(scan_s * 1000, 2),
            "bytes_per_vector": pq.config.bytes_per_vector,
        }))


if __name__ == "__main__":
    main()
