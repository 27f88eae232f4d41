"""Config-5 capacity-wall evidence: 2 shards x 1M with the PROVEN per-shard
operating point (sketch_dims=32 — the config the single-chip 2M corpus cannot
fit, CLAUDE.md fact 16 / BENCH_SHARDED round-3 note).

Round 3 measured that a 2M single-chip build only fits sketch_dims=16, whose
sketch gate collapses (recall .686), and asserted — without running it — that
a 2-shard mesh removes the wall because each shard runs the proven 1M/dims=32
config. This script runs that claim with real arithmetic on ONE chip:

  1. brute-force 2M ground truth FIRST (fact 17: GT chunks next to live
     build state are RESOURCE_EXHAUSTED-marginal);
  2. build shard A = x[:1M] and shard B = x[1M:] sequentially with the
     bench.py 1M config (dims=32, efc=64), pulling each finished shard to
     host before the next build so HBM never holds two;
  3. query each shard with the sketch-gated ladder point (ef=32, p=64,
     i=10, routing 65536 — bench.py's primary rung), merge the per-shard
     top-10 by exact distance on host, score vs the 2M GT;
  4. report the measured one-chip serialized QPS (shards timed back to
     back) and the 2-chip mesh projection nq/max(t_A, t_B) — the shards
     are independent, so a 2-device mesh runs them concurrently (the
     shard_map path in parallel/sharded.py; its collectives are the
     CPU-mesh-tested merge, search semantics identical to the host merge
     here).

Writes a `chip_2m_s2_dims32` block into BENCH_SHARDED.json.

Run (chip, ~20-30 min warm cache):
    /opt/venv/bin/python benches/sharded_2x1m.py

Reference scale story: /root/reference/README.md:135-170 (sharding
advertised, never measured); merge semantics: src/core/search.rs:185-254.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ROOT = pathlib.Path(__file__).resolve().parent.parent


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

    n_total, dim, nq = 2_000_000, 128, 4096
    n_shard = n_total // 2
    metric = DistanceMetric.EUCLIDEAN
    # Round-4 per-shard config = the adopted 1M operating point
    # (dims=48 sketches at reverse_slack=20, design.md section 17).
    cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=48,
                      ef_construction=64, reverse_slack=20)

    x, queries = make_bench_corpus(n_total, dim, nq)
    x = np.asarray(x)
    queries_np = np.asarray(queries)

    # --- 1. 2M ground truth BEFORE any build state exists (fact 17) ---
    gt_path = pathlib.Path(f"/tmp/gt_shard_{n_total}_{dim}_{nq}.npy")
    if gt_path.exists():
        gt = np.load(gt_path)
    else:
        _, gt = dist_ops.brute_force_topk(
            jnp.asarray(queries_np), jnp.asarray(x), 10, metric, batch=65536)
        gt = np.asarray(gt)
        np.save(gt_path, gt)
    print(f"GT done for n={n_total}", file=sys.stderr, flush=True)

    # --- 2. sequential shard builds, each at the proven 1M config ---
    shards_host = []  # (neighbors, degrees, levels, entry, maxlvl, sketch arrays)
    build_times = []
    for s in range(2):
        xs = x[s * n_shard : (s + 1) * n_shard]
        t0 = time.perf_counter()
        graph, sketch = build_index_with_sketch(jnp.asarray(xs), cfg)
        jax.block_until_ready(graph.neighbors)
        bt = time.perf_counter() - t0
        build_times.append(bt)
        print(f"shard {s} build {bt:.1f}s ({n_shard / bt:.0f} vec/s)",
              file=sys.stderr, flush=True)
        shards_host.append({
            "neighbors": np.asarray(graph.neighbors),
            "degrees": np.asarray(graph.degrees),
            "levels": np.asarray(graph.levels),
            "entry": int(graph.entry_point),
            "max_level": int(graph.max_level),
            "nbr_sketch": np.asarray(sketch.nbr_sketch),
            "node_sketch": np.asarray(sketch.node_sketch),
            "w": np.asarray(sketch.w),
            "scale": np.asarray(sketch.scale),
        })
        del graph, sketch  # free HBM before the next shard build

    # --- 3. per-shard gated queries + host-side k-merge ---
    from islands_tpu.core.csr import CsrGraph
    from islands_tpu.ops.proj import SketchIndex

    # Two per-shard operating points per round-4 fact 35: the round-4
    # control (p64/i10/x4) and the narrow-expansion 1M rung (p48/i12/x2,
    # .9538 @ ~71.6k at 1M single-index).
    points = [(32, 64, 10, 4), (32, 48, 12, 2), (32, 48, 10, 2)]
    acc = {pt: {"d": [], "i": [], "qps": []} for pt in points}
    for s in range(2):
        h = shards_host[s]
        graph = CsrGraph(
            neighbors=jnp.asarray(h["neighbors"]),
            degrees=jnp.asarray(h["degrees"]),
            levels=jnp.asarray(h["levels"]),
            entry_point=jnp.int32(h["entry"]),
            max_level=jnp.int32(h["max_level"]),
        )
        sketch = SketchIndex(
            w=jnp.asarray(h["w"]), scale=jnp.asarray(h["scale"]),
            node_sketch=jnp.asarray(h["node_sketch"]),
            nbr_sketch=jnp.asarray(h["nbr_sketch"]),
        )
        xs = jnp.asarray(x[s * n_shard : (s + 1) * n_shard])
        searcher = StoredSearcher(graph, xs, metric, sketch=sketch,
                                  routing_size=65536)
        for ef, promote, max_iters, xw in points:
            # warm + recall pass
            d, ids = searcher.search(queries_np, k=10, ef=ef,
                                     expand_width=xw,
                                     promote_width=promote,
                                     max_iters=max_iters)
            jax.block_until_ready((d, ids))
            # timed pass
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                d, ids = searcher.search(queries_np, k=10, ef=ef,
                                         expand_width=xw,
                                         promote_width=promote,
                                         max_iters=max_iters)
            jax.block_until_ready((d, ids))
            ts = (time.perf_counter() - t0) / reps
            a = acc[(ef, promote, max_iters, xw)]
            a["qps"].append(nq / ts)
            a["d"].append(np.asarray(d))
            a["i"].append(np.asarray(ids) + s * n_shard)
            print(f"shard {s} p{promote}/i{max_iters}/x{xw}: "
                  f"{ts * 1e3:.0f} ms/batch ({nq / ts:.0f} QPS solo)",
                  file=sys.stderr, flush=True)
        del graph, sketch, xs, searcher

    out = None
    for ef, promote, max_iters, xw in points:
        a = acc[(ef, promote, max_iters, xw)]
        # host k-merge by exact distance (search.rs:185-254 semantics)
        d_cat = np.concatenate(a["d"], axis=1)
        i_cat = np.concatenate(a["i"], axis=1)
        order = np.argsort(d_cat, axis=1)[:, :10]
        merged = np.take_along_axis(i_cat, order, axis=1)
        rec = float(np.mean([
            len(set(merged[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(nq)
        ]))
        shard_qps = a["qps"]
        qps_serial = nq / sum(nq / q for q in shard_qps)
        qps_mesh2 = nq / max(nq / q for q in shard_qps)
        entry = {
            "n": n_total, "dim": dim, "shards": 2, "sketch_dims": 48,
            "reverse_slack": 20,
            "per_shard_n": n_shard,
            "build_s_per_shard": [round(t, 1) for t in build_times],
            "gate": f"sketch_ef{ef}_p{promote}_i{max_iters}_x{xw}_r65536",
            "recall_vs_2m_gt": round(rec, 4),
            "qps_one_chip_serialized": round(qps_serial, 1),
            "qps_two_chip_projection": round(qps_mesh2, 1),
            "per_shard_qps": [round(q, 1) for q in shard_qps],
        }
        print(json.dumps(entry))
        if rec >= 0.9 and (out is None
                           or entry["qps_two_chip_projection"]
                           > out["qps_two_chip_projection"]):
            out = entry
    if out is None:
        out = entry

    bs_path = ROOT / "BENCH_SHARDED.json"
    if bs_path.exists():
        blob = json.loads(bs_path.read_text())
    else:
        blob = {}
    blob["chip_2m_s2_dims48"] = out
    bs_path.write_text(json.dumps(blob, indent=1))


if __name__ == "__main__":
    main()
