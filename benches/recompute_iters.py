"""Iteration-cap sweep for recompute mode (BASELINE config 3, 131k chunks).

Recompute-mode cost is encoder-bound: encodes/query = promote_width x hop
iterations actually run (CLAUDE.md fact 21). The batched query loop runs to
the slowest query's convergence (fact 23), so capping max_iters cuts encoder
work directly. Sweeps max_iters at the tuned ef=48 operating points.

    /opt/venv/bin/python benches/recompute_iters.py
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

    from bench_extra import _recall, config3_setup

    qn = 256
    idx, provider, q, true_ids, build_s = config3_setup(qn)
    print(f"build {build_s:.1f}s", file=sys.stderr, flush=True)
    out = {"metric": "config3_max_iters_sweep", "build_s": round(build_s, 1)}

    def measure(ef, promote, max_iters, bs=64):
        idx.last_recompute_fraction = None
        ids = []
        for s in range(0, qn, bs):
            _, i = idx.search(q[s:s + bs], k=10, provider=provider, ef=ef,
                              gate="sketch", promote_width=promote,
                              max_iters=max_iters)
            ids.append(np.asarray(i))
        rec = _recall(np.concatenate(ids), true_ids)
        rf = idx.last_recompute_fraction
        t0 = time.perf_counter()
        for s in range(0, qn, bs):
            idx.search(q[s:s + bs], k=10, provider=provider, ef=ef,
                       gate="sketch", promote_width=promote,
                       max_iters=max_iters)
        qps = qn / (time.perf_counter() - t0)
        label = (f"ef{ef}_p{promote}_i{max_iters or 'def'}"
                 + (f"_b{bs}" if bs != 64 else ""))
        out[label] = {"recall": round(rec, 4), "qps": round(qps, 1),
                      "recompute_fraction": round(rf, 5) if rf else None}
        print(f"{label}: recall {rec:.4f}, {qps:.1f} QPS, rf {rf:.5f}",
              file=sys.stderr, flush=True)

    if len(sys.argv) > 1 and sys.argv[1] == "bs":
        # Query-batch sweep at the recorded operating point (ef48/p32/i36).
        # Two opposing forces: (a) the in-loop encoder batch is bs x
        # promote_width — at bs=64 that is 2048, deep past the measured MFU
        # cliff (BENCH_ENCODER attn_impl_sweep: 32.5% at 64 vs 19.8% at
        # 1024+); (b) the lockstep while_loop runs to the slowest query in
        # the batch (fact 23), so smaller batches also waste fewer
        # straggler hops — against per-batch fixed dispatch costs (fact 15,
        # measured at 1M stored, not here).
        for bs in (64, 32, 16, 8):
            measure(48, 32, 36, bs=bs)
    else:
        # Rounds 1-2 (git log, routing=1024): default cap 40 = .9242 @ 18.6;
        # i36 .9191 @ 20.6; i32 .9086 @ 23.3; i28 .8965 @ 26.3 — QPS tracks
        # 1/iters exactly (encoder roofline). Round 3: dense routing (16384,
        # fact 26) shortens the approach; re-find the >= .9 crossing.
        measure(48, 32, None)
        measure(48, 32, 32)
        measure(48, 32, 28)
        measure(48, 32, 24)
        measure(48, 32, 20)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
