"""Config-4 expand-width sweep at the routed/batched operating point.

em = expand_width * m0 (240 at the default x4/m0=60) sets the per-hop
candidate count, which scales the one-hot ADC einsum, the id-sort, and
the AQ merge — the hop machinery that bounds config-4 (design.md §16).
If narrower expansion holds recall under routed entries, hop cost drops
linearly. Run solo on the chip (CLAUDE.md fact 29).
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
    idx, provider, q, true_ids, build_s = config4_setup(nq=4096)
    nq = int(q.shape[0])
    print(f"[setup {time.perf_counter() - t_all:7.1f}s] build {build_s:.1f}s",
          flush=True)

    points = [
        # (ef, max_iters, expand_width) at routing 65536, batch 4096.
        # Pass 1: x2 dominates x3/x4 (x2/i20 .9353 @ 4,936 vs x4/i16
        # .9293 @ 3,915). Pass 2: x1 a wash, i18 noisy-slow. Pass 3:
        # sweep ef downward (pool/merge/rerank width) at the x2 rungs —
        # ef=128 was tuned before routing/narrow-expand existed.
        (128, 20, 2),   # control = adopted rung
        (96, 20, 2),
        (96, 24, 2),
        (64, 24, 2),
        (64, 28, 2),
    ]
    for ef, mi, xw in points:
        _, ids = idx.search_two_level(q, k=10, provider=provider, ef=ef,
                                      rerank_ratio=0.25, max_iters=mi,
                                      routing_size=65536, expand_width=xw)
        rec = _recall(np.asarray(ids), true_ids)
        t0 = time.perf_counter()
        idx.search_two_level(q, k=10, provider=provider, ef=ef,
                             rerank_ratio=0.25, max_iters=mi,
                             routing_size=65536, expand_width=xw)
        qps = nq / (time.perf_counter() - t0)
        print(json.dumps({
            "ef": ef, "max_iters": mi, "expand_width": xw,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
