"""Config-4 promote-width sweep at the adopted routed/narrow-expand rung.

promote_width was NEVER swept on the two-level path — every config-4
sweep (twolevel_expand/iters/routing/batch) ran the ef=128 default
promote of 32, tuned before routing and narrow expansion existed. Two
measured facts say wide-promote/low-cap should dominate here too:

- At 128-d, promote_width is ~QPS-free and wide-promote/low-cap beat
  narrow-promote/high-cap at every rung (CLAUDE.md fact 28: p64/i10
  .9381 @ 41.0k vs p32/i16 .9099 @ 38.5k).
- Config-4's exact-rescore cost is provably NOT the hop bottleneck
  (fact 34: end_rerank cut exact scores 87% and gained only 8% QPS) —
  so doubling promote should cost well under 8% while buying the
  recall that lets the iteration cap drop below 20.

Hypothesis: p64 at i14-16 reaches the adopted .9353 with fewer hops →
net QPS win over x2/i20/p32 = 4,936. Run solo on the chip (fact 29);
promote_width stays <= 96 (fact 28 compile wedge).
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
        # (ef, max_iters, expand_width, promote_width) at routing 65536,
        # batch 4096. First rung = adopted control (p=None -> default 32).
        (128, 20, 2, None),  # control = adopted rung (.9353 @ 4,936)
        (128, 20, 2, 64),    # promote cost probe at equal cap
        (128, 16, 2, 64),    # the hypothesized winner
        (128, 14, 2, 64),
        (128, 14, 2, 96),
        (128, 12, 2, 96),
    ]
    # Resolve the same defaults search_two_level applies (leann.py:379-387)
    # so the recorded JSON can't mislabel a rung: default promote is
    # round(rerank_ratio * aq_width) with aq_width = max(ef, 64), and the
    # runtime clamps promote_width to em = expand_width * max_degree.
    rerank_ratio = 0.25
    max_degree = int(idx.graph.max_degree)
    for ef, mi, xw, pw in points:
        assert pw is None or pw <= 96, "fact 28: promote > 96 wedges the chip"
        em = xw * max_degree
        resolved_pw = pw if pw is not None else max(
            1, round(rerank_ratio * max(ef, 64)))
        effective_pw = min(resolved_pw, em)
        assert effective_pw == resolved_pw, (
            f"promote_width {resolved_pw} clamps to {effective_pw} at "
            f"expand_width={xw} (em={em}) — rung would be mislabeled")
        _, ids = idx.search_two_level(q, k=10, provider=provider, ef=ef,
                                      rerank_ratio=rerank_ratio, max_iters=mi,
                                      routing_size=65536, expand_width=xw,
                                      promote_width=pw)
        rec = _recall(np.asarray(ids), true_ids)
        t0 = time.perf_counter()
        idx.search_two_level(q, k=10, provider=provider, ef=ef,
                             rerank_ratio=rerank_ratio, max_iters=mi,
                             routing_size=65536, expand_width=xw,
                             promote_width=pw)
        qps = nq / (time.perf_counter() - t0)
        print(json.dumps({
            "ef": ef, "max_iters": mi, "expand_width": xw,
            "promote_width": effective_pw,
            "control": pw is None,
            "below_gate": rec < 0.9,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
        }), flush=True)
    print(f"[done {time.perf_counter() - t_all:7.1f}s]", flush=True)


if __name__ == "__main__":
    main()
