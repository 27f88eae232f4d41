"""2M x 128 single-chip SKETCH gate (round 4): the slack=20 trick at scale.

Round 3 recorded the 2M sketch gate as broken: dims=16 (all that fit at
bw=120) gives recall .686 (BENCH_SHARDED.json) — the fidelity floor, and
the motivation for config 5's multi-shard story. design.md §17's finding
(the build HBM peak scales with bw*dims, bw = m0 + reverse_slack)
re-opens the single-chip question: at reverse_slack=20 (bw=80), 2M x
dims=24 is 1920 B/vec inline sketch — exactly the footprint of the
PROVEN 1M dims=48 and 1M-at-bw-120 dims=32 configs — and dims=32 (2560
B/vec, 5.12 GB static) is within fact 16's measured wall (5.8 GB).

    /opt/venv/bin/python benches/scale_2m.py [dims]

Reference scale story: /root/reference/README.md:135-170 (sharding
advertised for corpora beyond one node, never measured).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(dims: int = 24):
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from bench import make_bench_corpus
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    n, dim, nq = 2_000_000, 128, 4096
    metric = DistanceMetric.EUCLIDEAN
    cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=dims,
                      ef_construction=64, reverse_slack=20)
    x, queries = make_bench_corpus(n, dim, nq)

    # GT before the build (fact 17); same corpus/queries as sharded_chip.py
    # (make_bench_corpus is seeded), so its cache is reusable.
    gt_path = pathlib.Path(f"/tmp/gt_shard_{n}_{dim}_{nq}.npy")
    if gt_path.exists():
        gt = np.load(gt_path)
    else:
        _, gt = dist_ops.brute_force_topk(queries, x, 10, metric,
                                          batch=65536)
        gt = np.asarray(gt)
        np.save(gt_path, gt)
    print(f"GT ready for n={n}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    build_s = time.perf_counter() - t0
    print(f"[2M d{dims}] build {build_s:.1f}s ({n / build_s:.0f} vec/s)",
          file=sys.stderr, flush=True)

    searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                              routing_size=65536)
    out = {"metric": f"scale_2m_sketch_dims{dims}_slack20", "n": n,
           "dim": dim, "sketch_dims": dims, "reverse_slack": 20,
           "build_s": round(build_s, 1), "build_vps": round(n / build_s, 0)}

    def measure(ef, promote, mi, batch=2048, xw=4):
        ids_all = []
        for s in range(0, nq, batch):
            _, ids = searcher.search(queries[s:s + batch], k=10, ef=ef,
                                     expand_width=xw, gate="sketch",
                                     promote_width=promote, max_iters=mi)
            ids_all.append(np.asarray(ids))
        ids = np.concatenate(ids_all)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(nq)
        ]))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            for s in range(0, nq, batch):
                d, i = searcher.search(queries[s:s + batch], k=10, ef=ef,
                                       expand_width=xw, gate="sketch",
                                       promote_width=promote, max_iters=mi)
            jax.block_until_ready((d, i))
        qps = nq / ((time.perf_counter() - t0) / reps)
        label = f"ef{ef}" + (f"_p{promote}" if promote else "") + \
            (f"_i{mi}" if mi else "") + (f"_x{xw}" if xw != 4 else "")
        out[label] = {"recall": round(rec, 4), "qps": round(qps, 0)}
        print(f"[2M d{dims}] {label}: recall {rec:.4f}, {qps:.0f} QPS",
              file=sys.stderr, flush=True)

    # One doubling deeper than 1M: caps shift up ~2 hops. Ladder brackets
    # the 1M operating points (p48/i8 .9432, p64/i10 .9847 at 1M).
    # Pass-2 note: p64 rungs (x4 i12 .8880; x2 best i16 .8862 @ 33.6k)
    # all sit under the gate — the recorded 2M point is p96/i12 (promote
    # width is the recall lever at 2M approach depth, fact 28).
    measure(32, 96, 12)            # recorded .9223 @ 29.0k control
    measure(32, 96, 14, xw=2)
    measure(32, 96, 16, xw=2)
    measure(32, 80, 16, xw=2)  # promote <= 96 ONLY (fact 28 wedge)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
