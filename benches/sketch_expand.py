"""128-d sketch-gate expand-width sweep at the bench.py operating point.

Fact 23 tested WIDER expansion (x6/x8 — strictly worse) but never
narrower; config 4's round-4 result (x2/i20 strictly beats x4/i16 under
routed entries) says em = expand_width*m0 scales the hop machinery and
routing keeps capped recall. This replicates bench.py's exact build
(1M x 128, dims=48, slack=20, efc=64) + routed searcher and sweeps
expand_width at the primary/margin rungs. Run solo (CLAUDE.md fact 29).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import make_bench_corpus  # noqa: E402


def main() -> None:
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    N, DIM, NQ, QB = 1_000_000, 128, 4096, 4096
    metric = DistanceMetric.EUCLIDEAN
    cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=48,
                      ef_construction=64, reverse_slack=20)
    t_all = time.perf_counter()
    x, queries = make_bench_corpus(N, DIM, NQ)
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    print(f"[setup {time.perf_counter() - t_all:7.1f}s] built", flush=True)
    _, true_ids = dist_ops.brute_force_topk(queries, x, 10, metric,
                                            batch=131072)
    true_ids = np.asarray(true_ids)
    searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                              routing_size=65536)

    def run(ef, promote, mi, xw):
        _, ids = searcher.search(queries, k=10, ef=ef, expand_width=xw,
                                 gate="sketch", promote_width=promote,
                                 max_iters=mi)
        return np.asarray(ids)

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(NQ)
        ]))

    points = [
        # (ef, promote, max_iters, expand_width)
        (32, 48, 8, 4),    # control = bench primary rung
        (32, 48, 8, 2),
        (32, 48, 10, 2),
        (32, 48, 12, 2),
        (32, 64, 10, 2),
        (32, 64, 12, 2),
        (32, 48, 10, 3),
    ]
    for ef, p, mi, xw in points:
        rec = recall_of(run(ef, p, mi, xw))
        t0 = time.perf_counter()
        for _ in range(5):
            d, i = searcher.search(queries, k=10, ef=ef, expand_width=xw,
                                   gate="sketch", promote_width=p,
                                   max_iters=mi)
        jax.block_until_ready((d, i))
        qps = NQ / ((time.perf_counter() - t0) / 5)
        print(json.dumps({
            "ef": ef, "promote": p, "max_iters": mi, "expand_width": xw,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
