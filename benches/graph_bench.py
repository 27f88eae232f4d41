"""Graph build/search microbenchmarks (criterion parity:
benches/hnsw_benchmarks.rs — insert throughput, search k=10/50, ef sweep
50-400, dim sweep 32-512, serde round-trip).

Run: python benches/graph_bench.py [N]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from islands_tpu.core.build import build_index
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32))
    metric = DistanceMetric.EUCLIDEAN
    cfg = LeannConfig(metric=metric, wave_size=4096)

    t0 = time.perf_counter()
    g = build_index(x, cfg)
    jax.block_until_ready(g.neighbors)
    build_s = time.perf_counter() - t0
    print(json.dumps({
        "bench": "build", "n": n, "dim": d,
        "seconds": round(build_s, 2),
        "vectors_per_s": round(n / build_s),
    }))

    _, tids = dist_ops.brute_force_topk(q, x, 10, metric, batch=262144)
    tids = np.asarray(tids)
    s = StoredSearcher(g, x, metric)
    for ef in (50, 100, 200, 400):
        dd, ii = s.search(q, k=10, ef=ef)
        jax.block_until_ready((dd, ii))
        t0 = time.perf_counter()
        for _ in range(5):
            dd, ii = s.search(q, k=10, ef=ef)
        jax.block_until_ready((dd, ii))
        dt = (time.perf_counter() - t0) / 5
        ii = np.asarray(ii)
        rec = float(np.mean([
            len(set(ii[b].tolist()) & set(tids[b].tolist())) / 10
            for b in range(len(tids))
        ]))
        print(json.dumps({
            "bench": "search", "ef": ef, "k": 10,
            "qps": round(1024 / dt), "recall_at_10": round(rec, 4),
        }))

    # serde round-trip (reference: bincode serde bench)
    from islands_tpu.core.storage import decode_graph, encode_graph

    t0 = time.perf_counter()
    blob = encode_graph(g, metric.value, d)
    enc_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    decode_graph(blob)
    dec_s = time.perf_counter() - t0
    print(json.dumps({
        "bench": "serde", "bytes": len(blob),
        "encode_s": round(enc_s, 3), "decode_s": round(dec_s, 3),
    }))


if __name__ == "__main__":
    main()
