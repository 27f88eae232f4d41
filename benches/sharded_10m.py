"""Config-5 at its SPECIFIED scale: 10M chunks as 8 shards x 1.25M, every
factor measured on the chip (VERDICT r4 missing #1 / next-round #2).

BASELINE.json config 5 claims 10M across a mesh; rounds 3-4 only ever built
2 shards x 1M. This script produces the full composed evidence one chip
allows:

  1. 10M x 128 corpus + brute-force ground truth FIRST (CLAUDE.md fact 17;
     host RAM 125 GB holds the 5.1 GB corpus, HBM holds it only during GT);
  2. EIGHT sequential shard builds at n_shard = 1.25M with the adopted
     per-shard config (sketch_dims=48, reverse_slack=20) — the quarter-step
     structural bucket (build._bucket_size: 1.25M -> 1.31M, not 2M) is what
     makes dims=48 fit; each shard is queried immediately after its build
     (warm + 3 timed reps at the 1M-proven rungs), results pulled to host,
     then freed so HBM never holds two shards;
  3. host k-merge by exact distance across the 8 shards' top-10
     (src/core/search.rs:185-254 semantics — identical math to the
     mesh all-gather merge in parallel/sharded._merge_topk), recall vs the
     REAL 10M GT;
  4. the merge cost is MEASURED, not assumed: t_merge = host concat +
     argsort + gather over [nq, 8*10] (the mesh path moves the same [B, k]
     rows over ICI, strictly cheaper than host);
  5. projections with every factor measured:
       qps_8chip_projection  = nq / (max_shard_batch_time + t_merge)
       qps_one_chip_serialized = nq / (sum shard times + t_merge)
       build: per-shard seconds (8-chip wall = max, not sum).

Writes `config5_10m_measured` into BENCH_SHARDED.json. Run SOLO
(fact 29/32); ~60-80 min warm cache, longer on a cold one.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ROOT = pathlib.Path(__file__).resolve().parent.parent


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_bench_corpus
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    n_total, dim, nq, shards = 10_000_000, 128, 4096, 8
    n_shard = n_total // shards  # 1.25M -> 1.31M structural bucket
    metric = DistanceMetric.EUCLIDEAN
    cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=48,
                      ef_construction=64, reverse_slack=20)

    t_all = time.perf_counter()
    log(f"corpus gen {n_total}x{dim}")
    x, queries = make_bench_corpus(n_total, dim, nq)
    x_host = np.asarray(x)
    queries_np = np.asarray(queries)

    # --- 1. 10M ground truth BEFORE any build state exists (fact 17) ---
    gt_path = pathlib.Path(f"/tmp/gt_shard_{n_total}_{dim}_{nq}.npy")
    if gt_path.exists():
        gt = np.load(gt_path)
        del x
    else:
        log("10M brute-force GT")
        _, gt = dist_ops.brute_force_topk(
            jnp.asarray(queries_np), x, 10, metric, batch=32768)
        gt = np.asarray(gt)
        np.save(gt_path, gt)
        del x
    log(f"GT done at {time.perf_counter() - t_all:.0f}s")

    # --- 2. stream 8 shard builds + queries (one shard in HBM at a time) ---
    # Per-shard rungs: the 1M-proven final_rescore frontier (p16/p24 +
    # i12/fr64 — design.md §21), the round-4 primary (p48/i10/x2) for
    # continuity with fact 40, and the wide recall rung (p64/i10/x4).
    points = [(32, 16, 12, 2, 64), (32, 24, 12, 2, 64),
              (32, 48, 10, 2, 0), (32, 64, 10, 4, 0)]
    build_times = []
    acc = {pt: {"d": [], "i": [], "t": []} for pt in points}
    for s in range(shards):
        xs = jnp.asarray(x_host[s * n_shard : (s + 1) * n_shard])
        t0 = time.perf_counter()
        graph, sketch = build_index_with_sketch(xs, cfg)
        jax.block_until_ready(graph.neighbors)
        bt = time.perf_counter() - t0
        build_times.append(bt)
        log(f"shard {s} build {bt:.1f}s ({n_shard / bt:.0f} vec/s)")

        searcher = StoredSearcher(graph, xs, metric, sketch=sketch,
                                  routing_size=65536)
        # Device-resident queries: same methodology as bench.py's ladder
        # (CLAUDE.md fact 38b — a per-call 2.1 MB host copy through the
        # ~15-30 MB/s tunnel costs 70-140 ms vs ~100-170 ms of search).
        q_dev = jax.block_until_ready(jnp.asarray(queries_np))
        for ef, promote, max_iters, xw, fr in points:
            d, ids = searcher.search(q_dev, k=10, ef=ef,
                                     expand_width=xw, promote_width=promote,
                                     max_iters=max_iters, final_rescore=fr)
            jax.block_until_ready((d, ids))
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                d, ids = searcher.search(q_dev, k=10, ef=ef,
                                         expand_width=xw,
                                         promote_width=promote,
                                         max_iters=max_iters,
                                         final_rescore=fr)
                jax.block_until_ready((d, ids))
            ts = (time.perf_counter() - t0) / reps
            a = acc[(ef, promote, max_iters, xw, fr)]
            a["t"].append(ts)
            a["d"].append(np.asarray(d))
            a["i"].append(np.asarray(ids).astype(np.int64) + s * n_shard)
            log(f"shard {s} p{promote}/i{max_iters}/x{xw}/fr{fr}: "
                f"{ts * 1e3:.0f} ms/batch ({nq / ts:.0f} QPS solo)")
        del graph, sketch, xs, searcher

    # --- 3-5. measured host k-merge + composed projections ---
    blob_path = ROOT / "BENCH_SHARDED.json"
    blob = json.loads(blob_path.read_text()) if blob_path.exists() else {}
    best = None
    for ef, promote, max_iters, xw, fr in points:
        a = acc[(ef, promote, max_iters, xw, fr)]
        d_cat = np.concatenate(a["d"], axis=1)
        i_cat = np.concatenate(a["i"], axis=1)
        t0 = time.perf_counter()
        order = np.argsort(d_cat, axis=1)[:, :10]
        merged = np.take_along_axis(i_cat, order, axis=1)
        t_merge = time.perf_counter() - t0
        rec = float(np.mean([
            len(set(merged[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(nq)
        ]))
        t_max, t_sum = max(a["t"]), sum(a["t"])
        entry = {
            "n": n_total, "dim": dim, "shards": shards,
            "per_shard_n": n_shard,
            "sketch_dims": 48, "reverse_slack": 20,
            "structural_bucket": 1_310_720,
            "gate": (f"sketch_ef{ef}_p{promote}_i{max_iters}_x{xw}"
                     f"_fr{fr}_r65536"),
            "recall_vs_10m_gt": round(rec, 4),
            **({"below_gate": True} if rec < 0.9 else {}),
            "build_s_per_shard": [round(t, 1) for t in build_times],
            "build_s_8chip_wall": round(max(build_times), 1),
            "per_shard_qps": [round(nq / t, 1) for t in a["t"]],
            "merge_s_measured": round(t_merge, 4),
            "qps_8chip_projection": round(nq / (t_max + t_merge), 1),
            "qps_one_chip_serialized": round(nq / (t_sum + t_merge), 1),
            "notes": "merge measured on host over [nq, 80]; the mesh "
                     "all-gather moves the same [B,k] rows over ICI "
                     "(parallel/sharded._merge_topk), strictly cheaper",
        }
        print(json.dumps(entry), flush=True)
        if (ef, promote, max_iters, xw) == points[-1]:
            entry["notes"] = ("margin rung on the same 8 shard builds: wide "
                              "frontier p64/x4 trades QPS for recall at 10M. "
                              + entry["notes"])
            blob["config5_10m_measured_margin"] = entry
        if rec >= 0.9 and (best is None or entry["qps_8chip_projection"]
                           > best["qps_8chip_projection"]):
            best = entry
    blob["config5_10m_measured"] = best if best is not None else entry
    blob_path.write_text(json.dumps(blob, indent=1))
    log(f"done at {time.perf_counter() - t_all:.0f}s")


if __name__ == "__main__":
    main()
