"""Config-4 4-bit PQ variant: 32 subquantizers x 16 centroids — the same
128-bit/vector budget as the recorded 16x256 codebook, but the one-hot ADC
einsum shrinks 8x ([em, 32, 16] vs [em, 16, 256]) and the hop machinery is
what bounds config-4 (design.md §16). Gate fidelity may drop (coarser
24-d subspaces gain, 16-way quantization loses); this measures both sides
at the adopted rungs. Run solo on the chip (CLAUDE.md fact 29).
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
    idx, provider, q, true_ids, build_s = config4_setup(
        nq=4096, num_subquantizers=32, num_centroids=16)
    nq = int(q.shape[0])
    print(f"[setup {time.perf_counter() - t_all:7.1f}s] build {build_s:.1f}s",
          flush=True)

    points = [
        # (ef, max_iters, expand_width) at routing 65536, batch 4096 —
        # mirrors the adopted 8-bit rungs (.9353 @ 4,936 x2/i20;
        # .9470 @ 4,369 x2/i24).
        (128, 20, 2),
        (128, 24, 2),
        (128, 16, 2),
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
            "pq": "32x16", "ef": ef, "max_iters": mi, "expand_width": xw,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
