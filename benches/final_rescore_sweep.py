"""final_rescore sweep at the 1M x 128 headline config (round 5).

Design.md section 20's cost map: the exact promote rescore is ~19 ms of the
71.8 ms batch because it gathers promote_width=48 scattered rows per query
PER HOP. A narrower promote_width halves that term but strands true
neighbors in the approximate queue (facts 28/33: p32 loses recall at equal
cap). `final_rescore` (search._search_one_sketch_gated) exact-rescores the
AQ head ONCE after the loop — per query, not per hop — recovering exactly
those stranded candidates. This sweep measures whether narrow-promote +
final-rescore dominates the adopted p48/i10/x2 rung.

Uses the ablation's cached build (/tmp/sketch1m_cache, benches/
sketch_ablate.py writes it) through the PRODUCTION StoredSearcher path,
device-resident queries (fact 38b). Run SOLO on the chip (facts 29/32).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    from benches.sketch_ablate import get_setup

    import jax

    from islands_tpu.core.search import StoredSearcher

    graph, sketch, x, queries, gt, metric = get_setup()
    nq = queries.shape[0]
    searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                              routing_size=65536)
    q_dev = jax.block_until_ready(jax.numpy.asarray(queries))

    # (promote, max_iters, expand, final_rescore); FR_POINTS env overrides
    # (JSON list) and FR_OUT renames the artifact for follow-up probes.
    points = [
        (48, 10, 2, 0),    # adopted primary rung (control)
        (48, 10, 2, 64),   # pure recall upside at full promote
        (32, 10, 2, 64),
        (24, 10, 2, 64),
        (24, 12, 2, 64),
        (16, 10, 2, 64),
    ]
    import os
    if os.environ.get("FR_POINTS"):
        points = [tuple(p) for p in json.loads(os.environ["FR_POINTS"])]
    out_name = os.environ.get("FR_OUT", "BENCH_FINAL_RESCORE.json")
    rows = []
    for pt in points:
        # 4-tuple (promote, max_iters, expand, fr) or 5-tuple (+ aq_width:
        # wider AQ retains more found-but-evicted candidates for fr).
        p, mi, xw, fr = pt[:4]
        aq = pt[4] if len(pt) > 4 else None
        kw = dict(k=10, ef=32, expand_width=xw, promote_width=p,
                  max_iters=mi, final_rescore=fr, aq_width=aq)
        d, ids = searcher.search(q_dev, **kw)
        jax.block_until_ready((d, ids))
        reps = 3
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            d, ids = searcher.search(q_dev, **kw)
            jax.block_until_ready((d, ids))
            runs.append(time.perf_counter() - t0)
        dt = sorted(runs)[1]
        ids_np = np.asarray(ids)[:, :10]
        rec = float(np.mean([
            len(set(ids_np[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(nq)
        ]))
        row = {"promote": p, "max_iters": mi, "expand": xw,
               "final_rescore": fr,
               **({"aq_width": aq} if aq else {}),
               "recall_at_10": round(rec, 4),
               "qps": round(nq / dt, 1),
               "qps_runs": [round(nq / r, 1) for r in sorted(runs)],
               **({"below_gate": True} if rec < 0.9 else {})}
        rows.append(row)
        print(json.dumps(row), flush=True)

    (ROOT / out_name).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
