"""A/B: fused Pallas hop-merge kernel vs the inline XLA composition on the
official 1M x 128 bench ladder (round-5 lever, CLAUDE.md fact 41: the hop
loop is two gathers + the merge network; the fused op runs the id-sort
dedup, descending pre-sort, bitonic AQ merge and promote split in one
VMEM-resident program instead of XLA's stage-by-stage HBM round-trips).

Same graph, same GT, device-resident query slices (fact 38b), interleaved
rung order (inline/fused per rung) so tunnel drift cancels. Run SOLO.

    /opt/venv/bin/python benches/hop_fused_ab.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from islands_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from bench import make_bench_corpus
from islands_tpu.core.build import build_index_with_sketch
from islands_tpu.core.config import DistanceMetric, LeannConfig
from islands_tpu.core.search import StoredSearcher
from islands_tpu.ops import distance as dist_ops

N, DIM, NQ, BATCH = 1_000_000, 128, 4096, 4096
metric = DistanceMetric.EUCLIDEAN


def main():
    x, queries = make_bench_corpus(N, DIM, NQ)

    gt_path = pathlib.Path(f"/tmp/gt_{N}_{DIM}_{NQ}.npy")
    if gt_path.exists():
        true_ids = np.load(gt_path)
    else:
        _, true_ids = dist_ops.brute_force_topk(queries, x, 10, metric,
                                                batch=65536)
        true_ids = np.asarray(true_ids)
        np.save(gt_path, true_ids)

    cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=48,
                      ef_construction=64, reverse_slack=20)
    t0 = time.perf_counter()
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    print(f"build {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                              routing_size=65536)

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(NQ)
        ]))

    results = []

    def measure(ef, p, mi, xw, fr, impl):
        kw = dict(k=10, ef=ef, expand_width=xw, gate="sketch",
                  promote_width=p, max_iters=mi, final_rescore=fr,
                  hop_merge=impl)
        ids_all = []
        for s in range(0, NQ, BATCH):
            _, ids = searcher.search(queries[s:s + BATCH], **kw)
            ids_all.append(np.asarray(ids))
        rec = recall_of(np.concatenate(ids_all))
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                for s in range(0, NQ, BATCH):
                    d, i = searcher.search(queries[s:s + BATCH], **kw)
                jax.block_until_ready((d, i))
            runs.append(NQ / ((time.perf_counter() - t0) / 5))
        qps = sorted(runs)[1]
        row = {"rung": f"p{p}_i{mi}_x{xw}_fr{fr}", "impl": impl,
               "recall": round(rec, 4), "qps": round(qps, 1),
               "qps_runs": [round(r, 1) for r in runs]}
        results.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    for ef, p, mi, xw, fr in ((32, 8, 12, 2, 64), (32, 16, 12, 2, 64),
                              (32, 24, 12, 2, 64)):
        for impl in ("inline", "fused", "inline", "fused"):
            measure(ef, p, mi, xw, fr, impl)

    out = pathlib.Path(__file__).resolve().parent.parent / "BENCH_HOP_FUSED.json"
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
