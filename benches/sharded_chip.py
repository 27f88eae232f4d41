"""Real-chip scale point for the archipelago path (BASELINE config 5).

Builds and queries 2M x 128 through ShardedIndex on a 1-chip mesh (S=1):
the largest corpus ever built in this repo, exercising the exact code
path that fans out over an 8-chip mesh (shard_map + hierarchical merge),
with the HBM budget of docs/design.md §12 scaled to one chip
(sketch_dims=16 -> ~2.97 kB/vec static, ~6 GB at 2M).

    /opt/venv/bin/python benches/sharded_chip.py [n_millions]

Reference story: /root/reference/README.md:135-170 (sharding advertised,
never measured).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(n_m: float = 2.0):
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from bench import make_bench_corpus
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.parallel.mesh import make_mesh
    from islands_tpu.parallel.sharded import ArchipelagoSearcher, build_sharded

    n, dim, nq = int(n_m * 1_000_000), 128, 2048
    metric = DistanceMetric.EUCLIDEAN
    # Dense routing (fact 26): the exact gate routes entries through the
    # sketch, so low iteration caps keep recall.
    cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=16,
                      ef_construction=64, routing_size=65536)
    x, queries = make_bench_corpus(n, dim, nq)
    x = np.asarray(x)
    queries = np.asarray(queries)

    gt_path = pathlib.Path(f"/tmp/gt_shard_{n}_{dim}_{nq}.npy")
    if gt_path.exists():
        gt = np.load(gt_path)
    else:
        _, gt = dist_ops.brute_force_topk(
            jnp_q(queries), jnp_q(x), 10, metric, batch=65536)
        gt = np.asarray(gt)
        np.save(gt_path, gt)
    print(f"GT done for n={n}", file=sys.stderr, flush=True)

    mesh = make_mesh(n_shards=1, n_dp=1, devices=jax.devices()[:1])
    t0 = time.perf_counter()
    idx = build_sharded(x, cfg, mesh=mesh)
    jax.block_until_ready(idx.neighbors)
    build_s = time.perf_counter() - t0
    print(f"build {build_s:.1f}s ({n / build_s:.0f} vec/s)",
          file=sys.stderr, flush=True)

    searcher = ArchipelagoSearcher(idx)
    out = {"n": n, "dim": dim, "shards": 1, "build_s": round(build_s, 1),
           "build_vps": round(n / build_s, 0)}
    # Exact gate default cap at ef=64/x4 is 80 iterations; the batched loop
    # is straggler-bound (design.md §13), so capped rungs trade tail recall
    # for QPS exactly as at 1M.
    # Round-3 measured (2M, S=1, single-entry): exact@64 recall flat .988
    # from the default cap (80) down to i32; i24 .9846 @ 12.0k, i20 .9726 @
    # 14.4k. These rungs re-measure with sketch-routed entries + dense
    # routing (65536).
    for gate, ef, mi in (
        ("exact", 64, 24), ("exact", 64, 20), ("exact", 64, 16),
        ("exact", 64, 12),
    ):
        ids_all = []
        for s in range(0, nq, 1024):
            _, ids = searcher.search(queries[s:s + 1024], k=10, ef=ef,
                                     gate=gate, max_iters=mi)
            ids_all.append(np.asarray(ids))
        ids = np.concatenate(ids_all)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(nq)
        ]))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            for s in range(0, nq, 1024):
                d, i = searcher.search(queries[s:s + 1024], k=10, ef=ef,
                                       gate=gate, max_iters=mi)
        jax.block_until_ready((d, i))
        qps = nq / ((time.perf_counter() - t0) / reps)
        label = f"{gate}_ef{ef}" + (f"_i{mi}" if mi else "")
        out[label] = {"recall": round(rec, 4), "qps": round(qps, 0)}
        print(f"{label}: recall {rec:.4f}, {qps:.0f} QPS",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


def jnp_q(a):
    import jax.numpy as jnp

    return jnp.asarray(a)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 2.0)
