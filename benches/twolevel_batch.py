"""Config-4 query-batch sweep: the recorded points ran a SINGLE batch of
512 queries, but per-batch fixed costs (dispatch through the axon tunnel,
routing matmul, loop prologue) amortize with batch size — fact 15 measured
4096 > 2048 > 1024 at 1M x 128. This measures the routed tuned point at
nq = 512 / 2048 / 4096 (one batch each).

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
    idx, provider, q, true_ids, build_s = config4_setup(nq=4096)
    print(f"[setup {time.perf_counter() - t_all:7.1f}s] build {build_s:.1f}s",
          flush=True)

    for nq, ef, mi in ((512, 128, 16), (2048, 128, 16), (4096, 128, 16),
                       (4096, 128, 24)):
        qs, ts = q[:nq], true_ids[:nq]
        _, ids = idx.search_two_level(qs, k=10, provider=provider, ef=ef,
                                      rerank_ratio=0.25, max_iters=mi,
                                      routing_size=65536)
        rec = _recall(np.asarray(ids), ts)
        t0 = time.perf_counter()
        idx.search_two_level(qs, k=10, provider=provider, ef=ef,
                             rerank_ratio=0.25, max_iters=mi,
                             routing_size=65536)
        qps = nq / (time.perf_counter() - t0)
        print(json.dumps({
            "nq": nq, "ef": ef, "max_iters": mi, "routing_size": 65536,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
