"""128-d headline lever A/B: static-iteration hop loop (search._run_hops)
on the 1M sketch gate at bench.py's primary rungs.

Fact 23 established the max_iters cap binds (the batched while_loop runs
until the slowest query converges); benches/twolevel_ablate.py showed the
while machinery costs ~2.5x at 768-d. This measures the same lever where
the official headline lives: bench corpus (1M x 128, dims=48/slack=20
build), rungs p48/i10/x2 and p64/i10/x4, static_loop off/on, recall + QPS
each. Within-run ordering is decisive (fact 35: cross-session QPS swings
~1.5x). Run SOLO on the chip.
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

    n, dim, nq = 1_000_000, 128, 4096
    metric = DistanceMetric.EUCLIDEAN
    x, queries = make_bench_corpus(n, dim, nq)
    queries_np = np.asarray(queries)

    _, gt = dist_ops.brute_force_topk(queries, x, 10, metric, batch=131072)
    gt = np.asarray(gt)

    cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=48,
                      ef_construction=64, reverse_slack=20)
    t0 = time.perf_counter()
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    print(json.dumps({"build_s": round(time.perf_counter() - t0, 1)}),
          file=sys.stderr, flush=True)

    searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                              routing_size=65536)

    def run(tag, promote, max_iters, xw, static):
        kw = dict(k=10, ef=32, expand_width=xw, promote_width=promote,
                  max_iters=max_iters, static_loop=static)
        d, ids = searcher.search(queries_np, **kw)  # warm
        jax.block_until_ready((d, ids))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            d, ids = searcher.search(queries_np, **kw)
            jax.block_until_ready((d, ids))
        dt = (time.perf_counter() - t0) / reps
        ids = np.asarray(ids)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(nq)
        ]))
        print(json.dumps({
            "tag": tag, "promote": promote, "max_iters": max_iters,
            "expand_width": xw, "static_loop": static,
            "recall_at_10": round(rec, 4), "qps": round(nq / dt, 1),
        }), flush=True)

    # Interleave A/B per rung so tunnel drift can't masquerade as a win.
    for promote, mi, xw in ((48, 10, 2), (48, 12, 2), (64, 10, 4)):
        run("while", promote, mi, xw, False)
        run("scan", promote, mi, xw, True)
        run("while2", promote, mi, xw, False)


if __name__ == "__main__":
    main()
