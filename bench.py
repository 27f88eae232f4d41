"""Headline benchmark: QPS at recall@10 >= 0.9 on synthetic vectors
(BASELINE.json config 2: graph build + pure beam search with stored
embeddings), run on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "queries/s", "vs_baseline": ratio, ...}

The reference publishes no measured numbers (BASELINE.md); `REF_QPS` below is
a single-thread CPU estimate for the reference's sequential heap search
(ef=64, M~30 neighbor expansions x 128-d scalar distance loops ~ O(1e6) flops
+ heap/hash overhead per query ~= 1 ms) pending a measured native baseline.
"""

import json
import os
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 2048))
QUERY_BATCH = int(os.environ.get("BENCH_QUERY_BATCH", 1024))
TARGET_RECALL = 0.9
REF_QPS = 1000.0  # estimated reference single-thread QPS (see module docstring)
REF_BUILD_VPS = 3000.0  # estimated reference build throughput, vectors/s


def main():
    import jax
    import jax.numpy as jnp

    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from islands_tpu.core.build import build_index
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    metric = DistanceMetric.EUCLIDEAN
    cfg = LeannConfig(metric=metric, wave_size=4096)  # paper graph params

    # Clustered synthetic corpus (Gaussian mixture): the BASELINE workload is
    # code-chunk embeddings, which live on a low-dimensional manifold —
    # uniform-random vectors at 1M x 128d have near-degenerate neighbor
    # contrast and measure the data, not the index.
    key = jax.random.PRNGKey(0)
    kc, ka, kn, kq, kqa = jax.random.split(key, 5)
    # sigma=0.8 vs unit-variance centers: clusters overlap (neighbor sets
    # straddle clusters), matching real embedding manifolds rather than
    # either degenerate extreme (uniform random / separated balls).
    n_centers = max(min(4096, N // 64), 1)
    centers = jax.random.normal(kc, (n_centers, DIM), dtype=jnp.float32)
    assign = jax.random.randint(ka, (N,), 0, n_centers)
    x = centers[assign] + 0.8 * jax.random.normal(kn, (N, DIM), dtype=jnp.float32)
    q_assign = jax.random.randint(kqa, (N_QUERIES,), 0, n_centers)
    queries = centers[q_assign] + 0.8 * jax.random.normal(
        kq, (N_QUERIES, DIM), dtype=jnp.float32
    )
    jax.block_until_ready((x, queries))

    # --- build ---
    t0 = time.perf_counter()
    graph = build_index(x, cfg)
    jax.block_until_ready(graph.neighbors)
    build_s = time.perf_counter() - t0
    build_vps = N / build_s

    # --- ground truth ---
    _, true_ids = dist_ops.brute_force_topk(queries, x, 10, metric, batch=262144)
    true_ids = np.asarray(true_ids)

    searcher = StoredSearcher(graph, x, metric)

    def run(ef, expand):
        ids_all = []
        for s in range(0, N_QUERIES, QUERY_BATCH):
            _, ids = searcher.search(
                queries[s : s + QUERY_BATCH], k=10, ef=ef, expand_width=expand
            )
            ids_all.append(np.asarray(ids))
        return np.concatenate(ids_all)

    def recall_of(ids):
        return float(
            np.mean([
                len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
                for i in range(N_QUERIES)
            ])
        )

    # Smallest ef reaching target recall, then time it.
    chosen = None
    for ef in (32, 48, 64, 96, 128, 192, 256):
        r = recall_of(run(ef, 4))
        if r >= TARGET_RECALL:
            chosen = (ef, r)
            break
    if chosen is None:
        chosen = (256, r)
    ef, rec = chosen

    # Timed runs (post-warmup; compile already amortized by the recall scan).
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        for s in range(0, N_QUERIES, QUERY_BATCH):
            d, i = searcher.search(
                queries[s : s + QUERY_BATCH], k=10, ef=ef, expand_width=4
            )
        jax.block_until_ready((d, i))
    dt = (time.perf_counter() - t0) / reps
    qps = N_QUERIES / dt

    print(
        json.dumps(
            {
                "metric": f"qps_at_recall10>={TARGET_RECALL}_{N}x{DIM}",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / REF_QPS, 2),
                "recall_at_10": round(rec, 4),
                "ef": ef,
                "build_seconds": round(build_s, 2),
                "build_vectors_per_s": round(build_vps, 1),
                "build_vs_baseline": round(build_vps / REF_BUILD_VPS, 2),
                "index_bytes_per_vector": round(graph.storage_bytes() / N, 2),
                "n": N,
                "dim": DIM,
            }
        )
    )


if __name__ == "__main__":
    main()
