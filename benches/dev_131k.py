"""Fast iteration bench at 131k (same workload family as bench.py, one
bucket down): steady-state build time (second in-process build) + query
QPS/recall for both gates at the bench operating points.

Round-3 uses this to A/B the hop-merge rework (ops/merge) and recall-margin
levers without paying the 1M bench's wall clock. Run on the chip:

    /opt/venv/bin/python benches/dev_131k.py [sketch_dims] [efc] [pool_mult]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from bench import make_bench_corpus
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    n, dim, nq = 131072, 128, 1024
    sketch_dims = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    efc = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    pool_mult = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    refine = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    metric = DistanceMetric.EUCLIDEAN
    cfg = LeannConfig(
        metric=metric, wave_size=4096, sketch_dims=sketch_dims,
        ef_construction=efc, sketch_pool_mult=pool_mult,
        refine_passes=refine,
    )

    x, queries = make_bench_corpus(n, dim, nq)

    t0 = time.perf_counter()
    g1, s1 = build_index_with_sketch(x, cfg)
    jax.block_until_ready(g1.neighbors)
    first_s = time.perf_counter() - t0
    del g1, s1
    t0 = time.perf_counter()
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    build_s = time.perf_counter() - t0
    print(f"build: first {first_s:.1f}s, steady {build_s:.1f}s "
          f"({n / build_s:.0f} vec/s)", file=sys.stderr, flush=True)

    _, true_ids = dist_ops.brute_force_topk(queries, x, 10, metric, batch=131072)
    true_ids = np.asarray(true_ids)
    searcher = StoredSearcher(graph, x, metric, sketch=sketch)

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(nq)
        ]))

    out = {
        "n": n, "sketch_dims": sketch_dims, "efc": efc,
        "pool_mult": pool_mult, "refine": refine,
        "build_steady_s": round(build_s, 2),
        "build_vps": round(n / build_s, 0),
        "build_first_s": round(first_s, 2),
    }
    for gate, efs in (("sketch", (24, 32, 48)), ("exact", (24, 32, 48))):
        for ef in efs:
            _, ids = searcher.search(queries, k=10, ef=ef, expand_width=4,
                                     gate=gate)
            rec = recall_of(np.asarray(ids))
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                d, i = searcher.search(queries, k=10, ef=ef, expand_width=4,
                                       gate=gate)
            jax.block_until_ready((d, i))
            qps = nq / ((time.perf_counter() - t0) / reps)
            out[f"{gate}_ef{ef}"] = {"recall": round(rec, 4),
                                     "qps": round(qps, 0)}
            print(f"{gate}@ef={ef}: recall {rec:.4f}, {qps:.0f} QPS",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
