"""Config-4 end-rerank sweep: pure-ADC hop loop + one final ef-wide exact
rescore vs the per-hop-promotion recorded point (design.md §16 lever).

Reuses bench_extra.config4_setup (1M x 768 Gaussian mixture, 16-subq PQ).
Each point: one recall pass (also warms the executable), one timed pass.
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
        # (ef, max_iters, end_rerank) — first row reproduces the recorded
        # per-hop-promotion point as the in-run control.
        (128, 32, False),
        (128, 32, True),
        (128, 24, True),
        (128, 16, True),
        (192, 32, True),
        (192, 24, True),
        (256, 32, True),
    ]
    for ef, mi, er in points:
        _, ids = idx.search_two_level(q, k=10, provider=provider, ef=ef,
                                      rerank_ratio=0.25, max_iters=mi,
                                      end_rerank=er)
        rec = _recall(np.asarray(ids), true_ids)
        frac = idx.last_recompute_fraction
        t0 = time.perf_counter()
        idx.search_two_level(q, k=10, provider=provider, ef=ef,
                             rerank_ratio=0.25, max_iters=mi, end_rerank=er)
        qps = nq / (time.perf_counter() - t0)
        print(json.dumps({
            "ef": ef, "max_iters": mi, "end_rerank": er,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
            "recompute_fraction": round(frac or 0, 6),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
