"""Sharded archipelago performance (BASELINE config 5; VERDICT r2 #4).

Two modes:

  chip  (default on TPU): single-chip S=1 ShardedIndex at the largest
        per-shard scale that fits v5e HBM — the per-shard throughput a
        10M-corpus/8-chip deployment would see. Reports build vec/s, QPS at
        recall@10 >= 0.9, bytes/vec.
  mesh  (CPU, 8 virtual devices): fixed n/shard scaling table S in
        {1, 2, 4, 8} — per-shard work is constant, so QPS deltas measure
        the hierarchical all-gather merge overhead. Absolute CPU numbers
        are meaningless; the SHAPE of the curve is the result.

Run:
  /opt/venv/bin/python benches/sharded_bench.py chip [n_total]
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      /opt/venv/bin/python benches/sharded_bench.py mesh
"""

import json
import sys
import time

import numpy as np


def _corpus(n, dim, nq, seed=0):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kc, ka, kn, kq, kqa = jax.random.split(key, 5)
    n_centers = max(min(4096, n // 64), 1)
    centers = jax.random.normal(kc, (n_centers, dim), dtype=jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_centers)
    x = centers[assign] + 0.8 * jax.random.normal(kn, (n, dim), dtype=jnp.float32)
    qa = jax.random.randint(kqa, (nq,), 0, n_centers)
    q = centers[qa] + 0.8 * jax.random.normal(kq, (nq, dim), dtype=jnp.float32)
    return np.asarray(x), np.asarray(q)


def run_chip(n_total: int):
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.parallel.mesh import make_mesh
    from islands_tpu.parallel.sharded import ArchipelagoSearcher, build_sharded

    dim, nq = 128, 1024
    cfg = LeannConfig(
        metric=DistanceMetric.EUCLIDEAN, wave_size=4096, sketch_dims=32,
        ef_construction=64,
    )
    x, queries = _corpus(n_total, dim, nq)
    mesh = make_mesh(n_shards=1)

    t0 = time.perf_counter()
    index = build_sharded(x, cfg, mesh=mesh)
    jax.block_until_ready(index.neighbors)
    build_s = time.perf_counter() - t0
    print(f"S=1 build n={n_total}: {build_s:.1f}s ({n_total / build_s:.0f} "
          "vec/s)", file=sys.stderr, flush=True)

    import jax.numpy as jnp

    xd = jnp.asarray(x)
    _, true_ids = dist_ops.brute_force_topk(
        jnp.asarray(queries), xd, 10, cfg.metric, batch=262144
    )
    true_ids = np.asarray(true_ids)
    searcher = ArchipelagoSearcher(index)

    out = {"mode": "chip", "n": n_total, "build_s": round(build_s, 2),
           "build_vps": round(n_total / build_s, 0),
           "bytes_per_vec": round(
               (index.neighbors.size + index.node_sketch.size
                + index.nbr_sketch.size) * 4 / n_total, 1)
           if index.has_sketch else None}
    for ef in (32, 48, 64):
        _, ids = searcher.search(jnp.asarray(queries), k=10, ef=ef)
        ids = np.asarray(ids)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(nq)
        ]))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            d, i = searcher.search(jnp.asarray(queries), k=10, ef=ef)
        jax.block_until_ready((d, i))
        qps = nq / ((time.perf_counter() - t0) / reps)
        out[f"ef{ef}"] = {"recall": round(rec, 4), "qps": round(qps, 0)}
        print(f"S=1 ef={ef}: recall {rec:.4f}, {qps:.0f} QPS",
              file=sys.stderr, flush=True)
        if rec >= 0.9:
            break
    print(json.dumps(out))


def run_mesh():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.parallel.mesh import make_mesh
    from islands_tpu.parallel.sharded import ArchipelagoSearcher, build_sharded

    dim, nq, n_per_shard = 64, 256, 8192
    cfg = LeannConfig(
        metric=DistanceMetric.EUCLIDEAN, wave_size=1024, sketch_dims=16,
        ef_construction=32,
    )
    rows = []
    for s_count in (1, 2, 4, 8):
        n = n_per_shard * s_count
        x, queries = _corpus(n, dim, nq)
        mesh = make_mesh(n_shards=s_count, devices=jax.devices()[:s_count])
        index = build_sharded(x, cfg, mesh=mesh)
        searcher = ArchipelagoSearcher(index)
        qd = jnp.asarray(queries)
        d, i = searcher.search(qd, k=10, ef=32)  # compile
        jax.block_until_ready((d, i))
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            d, i = searcher.search(qd, k=10, ef=32)
        jax.block_until_ready((d, i))
        qps = nq / ((time.perf_counter() - t0) / reps)
        rows.append({"shards": s_count, "n": n, "qps": round(qps, 0)})
        print(f"S={s_count} n={n}: {qps:.0f} QPS (fixed n/shard)",
              file=sys.stderr, flush=True)
    base = rows[0]["qps"]
    for r in rows:
        r["merge_overhead_pct"] = round(100 * (base - r["qps"]) / base, 1)
    print(json.dumps({"mode": "mesh", "rows": rows}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    if mode == "chip":
        run_chip(int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000)
    else:
        run_mesh()
