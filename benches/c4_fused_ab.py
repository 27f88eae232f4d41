"""Config-4 A/B: fused Pallas hop-merge vs the inline XLA composition on
the adopted 1M x 768 two-level operating point (i16/p16/fr64, fact 42).

Reuses the cached index (/tmp/c4_cache/index.leann + gt.npy,
benches/twolevel_ablate.get_setup) and regenerates the deterministic
corpus/queries on device (bench_extra.config4_setup PRNGKey(1) geometry)
instead of the deleted x.npy/q.npy host copies. Device-resident queries
(fact 38b), interleaved impl order. Run SOLO.

    /opt/venv/bin/python benches/c4_fused_ab.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from islands_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

CACHE = pathlib.Path("/tmp/c4_cache")
N, DIM, NQ = 1_000_000, 768, 4096


def main():
    import jax
    import jax.numpy as jnp

    from islands_tpu.core import storage
    from islands_tpu.core.embedding import InMemoryEmbeddingProvider

    idx = storage.load_index(CACHE / "index.leann")
    gt = np.load(CACHE / "gt.npy")[:NQ]

    key = jax.random.PRNGKey(1)
    kc, ka, kn, kq, kqa = jax.random.split(key, 5)
    ncent = 4096
    centers = jax.random.normal(kc, (ncent, DIM), dtype=jnp.float32)
    x = centers[jax.random.randint(ka, (N,), 0, ncent)] + 0.8 * jax.random.normal(
        kn, (N, DIM), dtype=jnp.float32)
    q_dev = centers[jax.random.randint(kqa, (NQ,), 0, ncent)] + 0.8 * (
        jax.random.normal(kq, (NQ, DIM), dtype=jnp.float32))
    jax.block_until_ready((x, q_dev))
    provider = InMemoryEmbeddingProvider(x)

    def recall(ids):
        return float(np.mean([
            len(set(ids[i, :10].tolist()) & set(gt[i].tolist())) / 10.0
            for i in range(NQ)
        ]))

    results = []

    def run(tag, impl, reps=3, **kw):
        base = dict(k=10, provider=provider, ef=128, max_iters=16,
                    promote_width=16, final_rescore=64,
                    routing_size=65536, expand_width=2, hop_merge=impl)
        base.update(kw)
        d, ids = idx.search_two_level(q_dev, **base)  # warm/compile
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                d, ids = idx.search_two_level(q_dev, **base)
            runs.append(NQ / ((time.perf_counter() - t0) / reps))
        rec = recall(np.asarray(ids))
        row = {"tag": tag, "impl": impl, "qps": round(sorted(runs)[1], 1),
               "qps_runs": [round(r, 1) for r in runs],
               "recall_at_10": round(rec, 4),
               **({"below_gate": True} if rec < 0.9 else {}),
               **{k: v for k, v in kw.items()}}
        results.append(row)
        print(json.dumps(row), flush=True)
        return row

    for impl in ("inline", "fused", "inline", "fused"):
        run("adopted_i16_p16_fr64", impl)
    # If fused wins, the per-hop saving may move the cap frontier down.
    run("i14_p16_fr64", "fused", max_iters=14)
    run("i12_p16_fr64", "fused", max_iters=12)

    out = pathlib.Path(__file__).resolve().parent.parent / "BENCH_C4_FUSED.json"
    out.write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
