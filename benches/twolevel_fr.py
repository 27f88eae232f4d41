"""Config-4 final_rescore sweep (round 5): push the grouped-kernel cap
ladder's below-gate rungs back over recall .9.

BENCH_C4_ATTACK's cap ladder stops at i14 = .9014 @ 16,338 QPS — i12 is
.8828 @ 18,821, below gate. `final_rescore=F` (search._search_one_two_level)
exact-rescores the F best approximate-queue entries ONCE after the loop:
at b4096/fr128 that is ~524k row-fetches = ~5 ms per 0.22 s batch (fact 7's
10 ns/row), so if it recovers the capped tail's recall the i12/i10 rungs
become the new frontier. Narrow promote (p16) composes: fewer 3 kB per-hop
fetches (fact 36's cost), with fr recovering the stranded heads.

Uses /tmp/c4_cache (twolevel_ablate.get_setup, ~1 min warm), grouped ADC,
device-resident queries + methodology of benches/c4_attack.py. Run SOLO on
the chip (facts 29/32).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from twolevel_ablate import get_setup  # noqa: E402  (same dir)


def main():
    import jax
    import jax.numpy as jnp

    idx, x_np, q_np, gt = get_setup()
    from islands_tpu.core.embedding import InMemoryEmbeddingProvider

    provider = InMemoryEmbeddingProvider(x_np)
    nq = q_np.shape[0]
    q_dev = jax.block_until_ready(jnp.asarray(q_np))

    def recall(ids):
        return float(np.mean([
            len(set(ids[i, :10].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(nq)
        ]))

    def run(tag, reps=3, **kw):
        base = dict(k=10, provider=provider, ef=128, rerank_ratio=0.25,
                    max_iters=20, routing_size=65536, expand_width=2,
                    adc_impl="grouped")
        base.update(kw)
        d, ids = idx.search_two_level(q_dev, **base)  # warm/compile
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            d, ids = idx.search_two_level(q_dev, **base)
            runs.append(nq / (time.perf_counter() - t0))
        rec = recall(np.asarray(ids))
        runs = sorted(runs, reverse=True)
        row = {"tag": tag, "qps": round(runs[len(runs) // 2], 1),
               "qps_runs": [round(r, 1) for r in runs],
               "recall_at_10": round(rec, 4),
               **({"below_gate": True} if rec < 0.9 else {}),
               **{k: v for k, v in kw.items()}}
        print(json.dumps(row), flush=True)
        return row

    if len(sys.argv) > 1 and sys.argv[1] == "phase3":
        # fr64 frontier refinement: phase-2 found fr64 strictly beats
        # fr128 at i14/p16 (20,509 @ .9021 vs 17,965 @ .9032 — the extra
        # 64 row-fetches/query buy nothing at 768-d). Find the fr64
        # margin rung and check p24.
        rows = [
            run("i14_p16_fr64", max_iters=14, promote_width=16,
                final_rescore=64),                        # phase-2 winner
            run("i16_p16_fr64", max_iters=16, promote_width=16,
                final_rescore=64),
            run("i18_p16_fr64", max_iters=18, promote_width=16,
                final_rescore=64),
            run("i14_p24_fr64", max_iters=14, promote_width=24,
                final_rescore=64),
        ]
        name = "BENCH_C4_FR3.json"
    elif len(sys.argv) > 1 and sys.argv[1] == "phase2":
        # Margin hunt around the phase-1 winner (i14/p16/fr128 = 18,325 @
        # .9032 — gate margin .0032 too thin to adopt): walk iterations up
        # for a >= .91 rung, probe fr64 (cheaper recovery), and try the
        # untried wider-AQ deeper-recovery lever (aq_width default is
        # max(ef, 64) = 128 here; 192/256 retains more found-but-evicted
        # candidates for the final rescore at a small AQ-sort cost).
        rows = [
            run("i14_p16_fr128", max_iters=14, promote_width=16,
                final_rescore=128),                       # phase-1 winner
            run("i16_p16_fr128", max_iters=16, promote_width=16,
                final_rescore=128),
            run("i18_p16_fr128", max_iters=18, promote_width=16,
                final_rescore=128),
            run("i16_fr128", max_iters=16, final_rescore=128),
            run("i14_p16_fr64", max_iters=14, promote_width=16,
                final_rescore=64),
            run("i14_p16_aq192_fr192", max_iters=14, promote_width=16,
                aq_width=192, final_rescore=192),
            run("i12_p16_aq256_fr256", max_iters=12, promote_width=16,
                aq_width=256, final_rescore=256),
        ]
        name = "BENCH_C4_FR2.json"
    else:
        rows = [
            run("control_i20"),                               # adopted rung
            run("i12_fr128", max_iters=12, final_rescore=128),
            run("i12_fr64", max_iters=12, final_rescore=64),
            run("i14_fr128", max_iters=14, final_rescore=128),
            run("i10_fr128", max_iters=10, final_rescore=128),
            run("i12_p16_fr128", max_iters=12, promote_width=16,
                final_rescore=128),
            run("i14_p16_fr128", max_iters=14, promote_width=16,
                final_rescore=128),
        ]
        name = "BENCH_C4_FR.json"
    out = pathlib.Path(__file__).resolve().parent.parent / name
    out.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
