"""Config-4 routed-entries sweep: per-query exact-routed entry points
(route_entries_embed, fact 26's lever applied to the two-level PQ path)
vs the global-entry control at 1M x 768. The approach phase consumes
iterations; routing should let low max_iters caps keep recall (at 128-d
it took the sketch gate 24k -> 38k QPS).

Prints one JSON line per point; run solo on the chip (CLAUDE.md fact 29).
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

    points = [
        # (ef, max_iters, routing_size, end_rerank)
        (128, 32, None, False),       # global-entry control
        (128, 32, 65536, False),
        (128, 24, 65536, False),
        (128, 16, 65536, False),
        (128, 12, 65536, False),
        (128, 16, 16384, False),      # routing-size sensitivity
        (192, 16, 65536, True),       # does routing fix end-rerank coverage?
    ]
    for ef, mi, rs, er in points:
        _, ids = idx.search_two_level(q, k=10, provider=provider, ef=ef,
                                      rerank_ratio=0.25, max_iters=mi,
                                      routing_size=rs, end_rerank=er)
        rec = _recall(np.asarray(ids), true_ids)
        frac = idx.last_recompute_fraction
        t0 = time.perf_counter()
        idx.search_two_level(q, k=10, provider=provider, ef=ef,
                             rerank_ratio=0.25, max_iters=mi,
                             routing_size=rs, end_rerank=er)
        qps = nq / (time.perf_counter() - t0)
        print(json.dumps({
            "ef": ef, "max_iters": mi, "routing_size": rs, "end_rerank": er,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
            "recompute_fraction": round(frac or 0, 6),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
