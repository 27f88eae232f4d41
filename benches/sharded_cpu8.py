"""Config-5 merge correctness on the REAL 8-shard code path at non-toy n
(VERDICT r4 next-round #2b): build_sharded + ArchipelagoSearcher on the
8-virtual-device CPU mesh, merged recall vs brute-force ground truth.

The chip evidence (benches/sharded_10m.py / sharded_2x1m.py) measures
per-shard QPS with a host-side merge; THIS script exercises the actual
shard_map build and the all-gather k-merge (parallel/sharded.py:750-776,
reference merge semantics src/core/search.rs:185-254) end to end on 8
devices — correctness, not QPS (CPU timings say nothing about the chip).

Usage:  /opt/venv/bin/python benches/sharded_cpu8.py [n]   (default 65536)
Writes `cpu8_merge_correctness` into BENCH_SHARDED.json.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    import os

    # Both knobs BEFORE any backend use: the axon sitecustomize overrides
    # JAX_PLATFORMS (CLAUDE.md fact 24) so the platform needs a config
    # update, and the virtual device count is read at backend init.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.parallel.mesh import make_mesh
    from islands_tpu.parallel.sharded import ArchipelagoSearcher, build_sharded

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    dim, nq, k = 64, 256, 10
    metric = DistanceMetric.EUCLIDEAN

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((max(n // 64, 1), dim)).astype(np.float32)
    x = (centers[rng.integers(0, len(centers), n)]
         + 0.8 * rng.standard_normal((n, dim)).astype(np.float32))
    q = (centers[rng.integers(0, len(centers), nq)]
         + 0.8 * rng.standard_normal((nq, dim)).astype(np.float32))

    mesh = make_mesh(n_shards=8, n_dp=1)
    assert len(jax.devices()) >= 8, jax.devices()

    cfg = LeannConfig(metric=metric, wave_size=2048, sketch_dims=16,
                      ef_construction=48)
    t0 = time.perf_counter()
    idx = build_sharded(x, cfg, mesh)
    build_s = time.perf_counter() - t0
    print(f"built {n} on 8 CPU shards in {build_s:.0f}s", file=sys.stderr,
          flush=True)

    _, gt = dist_ops.brute_force_topk(jnp.asarray(q), jnp.asarray(x), k,
                                      metric, batch=16384)
    gt = np.asarray(gt)

    searcher = ArchipelagoSearcher(idx)
    out = {"n": n, "dim": dim, "shards": 8, "nq": nq,
           "build_seconds_cpu": round(build_s, 1)}
    for gate, ef in (("exact", 64), ("sketch", 64)):
        d, ids = searcher.search(q, k=k, ef=ef, gate=gate)
        d, ids = np.asarray(d), np.asarray(ids)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(gt[i].tolist())) / k
            for i in range(nq)
        ]))
        valid = ids[ids >= 0]
        assert valid.size and valid.max() < n
        assert np.all(np.diff(np.where(np.isfinite(d), d, np.inf),
                              axis=1) >= -1e-5)
        out[f"recall_{gate}_ef{ef}"] = round(rec, 4)
        print(json.dumps({gate: rec}), flush=True)

    blob_path = ROOT / "BENCH_SHARDED.json"
    blob = json.loads(blob_path.read_text()) if blob_path.exists() else {}
    blob["cpu8_merge_correctness"] = out
    blob_path.write_text(json.dumps(blob, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
