"""Archipelago weak-scaling table on the 8-virtual-device CPU mesh.

Fixed n-per-shard; S = 1, 2, 4, 8 shards. Ideal weak scaling keeps QPS
flat as shards (and total corpus) grow; the delta is the all-gather
top-k merge + beam-width effects. Also reports merge overhead directly:
per-shard local search time vs full merged search at S=8.

CPU numbers are for *scaling shape* only — absolute QPS is meaningless
off-chip. Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        /opt/venv/bin/python benches/sharded_scaling.py

Reference story being measured: /root/reference/README.md:135-170
(horizontal scaling via index shards; the reference never measures it).
"""

import json
import os
import pathlib
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# The axon sitecustomize sets jax_platforms="axon,cpu" at interpreter
# startup, ignoring JAX_PLATFORMS; override before backend init or this
# script steals the chip from concurrent TPU runs.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax

    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.parallel.mesh import make_mesh
    from islands_tpu.parallel.sharded import ArchipelagoSearcher, build_sharded

    n_per_shard, dim, nq = 16384, 64, 512
    metric = DistanceMetric.EUCLIDEAN
    rng = np.random.default_rng(11)
    x_full = rng.normal(size=(8 * n_per_shard, dim)).astype(np.float32)
    queries = rng.normal(size=(nq, dim)).astype(np.float32)
    cfg = LeannConfig(metric=metric, wave_size=2048, sketch_build=True,
                      sketch_dims=32, ef_construction=48)

    out = {"n_per_shard": n_per_shard, "dim": dim, "nq": nq, "rows": []}
    for s in (1, 2, 4, 8):
        n = s * n_per_shard
        x = x_full[:n]
        mesh = make_mesh(n_shards=s, n_dp=1, devices=jax.devices()[:s])
        t0 = time.perf_counter()
        idx = build_sharded(x, cfg, mesh=mesh)
        jax.block_until_ready(idx.neighbors)
        build_s = time.perf_counter() - t0

        searcher = ArchipelagoSearcher(idx)
        _, gt = dist_ops.brute_force_topk(queries, x, 10, metric)
        gt = np.asarray(gt)

        for gate in ("exact", "sketch"):
            d, ids = searcher.search(queries, k=10, ef=64, gate=gate)
            ids = np.asarray(ids)
            rec = float(np.mean([
                len(set(ids[i].tolist()) & set(gt[i].tolist())) / 10.0
                for i in range(nq)
            ]))
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                d, ids_j = searcher.search(queries, k=10, ef=64, gate=gate)
            jax.block_until_ready((d, ids_j))
            qps = nq / ((time.perf_counter() - t0) / reps)
            row = {"shards": s, "n_total": n, "gate": gate,
                   "build_s": round(build_s, 1),
                   "build_vps": round(n / build_s, 0),
                   "recall@10": round(rec, 4), "qps": round(qps, 0)}
            out["rows"].append(row)
            print(f"S={s} n={n} {gate}: recall {rec:.4f} "
                  f"{qps:.0f} QPS (build {build_s:.1f}s)",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
