"""Config-4 alternative: exhaustive Pallas ADC scan + exact rerank
(search_pq_scan) vs graph traversal at 1M x 768. The end-rerank sweep
showed the two-level hop machinery (not the exact rescore) bounds QPS, so
the graph-free scan — pure MXU matmuls, no while_loop — may win outright.

Also re-times the two-level control point solo (run-to-run check of the
recorded 1,462/2,008 QPS). Run solo on the chip (CLAUDE.md fact 29).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_extra import _recall, _setup, config4_setup  # noqa: E402


def main() -> None:
    _setup()
    t_all = time.perf_counter()
    idx, provider, q, true_ids, build_s = config4_setup()
    nq = int(q.shape[0])
    print(f"[setup {time.perf_counter() - t_all:7.1f}s] build {build_s:.1f}s",
          flush=True)

    for rerank in (128, 256, 512):
        _, ids = idx.search_pq_scan(q, k=10, provider=provider, rerank=rerank)
        rec = _recall(np.asarray(ids), true_ids)
        t0 = time.perf_counter()
        idx.search_pq_scan(q, k=10, provider=provider, rerank=rerank)
        qps = nq / (time.perf_counter() - t0)
        print(json.dumps({
            "mode": "pq_scan", "rerank": rerank,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
        }), flush=True)

    for ef, mi in ((128, 32),):
        _, ids = idx.search_two_level(q, k=10, provider=provider, ef=ef,
                                      rerank_ratio=0.25, max_iters=mi)
        rec = _recall(np.asarray(ids), true_ids)
        t0 = time.perf_counter()
        idx.search_two_level(q, k=10, provider=provider, ef=ef,
                             rerank_ratio=0.25, max_iters=mi)
        qps = nq / (time.perf_counter() - t0)
        print(json.dumps({
            "mode": "two_level_control", "ef": ef, "max_iters": mi,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
