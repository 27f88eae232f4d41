"""Iteration-cap sweep for two-level PQ-gated search (BASELINE config 4,
1M x 768-d). The two-level default cap at ef=128/promote=32 is 64
iterations; the batched loop is straggler-bound (design.md #13), so
capped rungs probe the QPS/recall frontier.

    /opt/venv/bin/python benches/twolevel_iters.py
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

    from bench_extra import _recall, config4_setup

    idx, provider, q, true_ids, build_s = config4_setup()
    nq = q.shape[0]
    print(f"build {build_s:.1f}s", file=sys.stderr, flush=True)
    out = {"metric": "config4_max_iters_sweep", "build_s": round(build_s, 1)}

    def measure(ef, max_iters):
        idx.last_recompute_fraction = None
        _, ids = idx.search_two_level(q, k=10, provider=provider, ef=ef,
                                      rerank_ratio=0.25, max_iters=max_iters)
        rec = _recall(np.asarray(ids), true_ids)
        rf = idx.last_recompute_fraction
        t0 = time.perf_counter()
        idx.search_two_level(q, k=10, provider=provider, ef=ef,
                             rerank_ratio=0.25, max_iters=max_iters)
        qps = nq / (time.perf_counter() - t0)
        label = f"ef{ef}_i{max_iters or 'def'}"
        out[label] = {"recall": round(rec, 4), "qps": round(qps, 1),
                      "recompute_fraction": round(rf, 5) if rf else None}
        print(f"{label}: recall {rec:.4f}, {qps:.1f} QPS, rf {rf:.5f}",
              file=sys.stderr, flush=True)

    measure(128, None)             # default cap (64) — recorded 262 QPS
    for mi in (48, 40, 32, 24):
        measure(128, mi)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
