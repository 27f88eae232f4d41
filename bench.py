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


def make_bench_corpus(n, dim, n_queries):
    """The bench workload: overlapping Gaussian-mixture corpus + queries.

    Clustered synthetic data because the BASELINE workload is code-chunk
    embeddings, which live on a low-dimensional manifold — uniform-random
    vectors at 1M x 128d have near-degenerate neighbor contrast and measure
    the data, not the index. sigma=0.8 vs unit-variance centers: clusters
    overlap (neighbor sets straddle clusters), matching real embedding
    manifolds rather than either degenerate extreme (uniform random /
    separated balls). Shared with bench_baseline.py so the native baseline
    is measured on the identical workload.
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    kc, ka, kn, kq, kqa = jax.random.split(key, 5)
    n_centers = max(min(4096, n // 64), 1)
    centers = jax.random.normal(kc, (n_centers, dim), dtype=jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_centers)
    x = centers[assign] + 0.8 * jax.random.normal(kn, (n, dim), dtype=jnp.float32)
    q_assign = jax.random.randint(kqa, (n_queries,), 0, n_centers)
    queries = centers[q_assign] + 0.8 * jax.random.normal(
        kq, (n_queries, dim), dtype=jnp.float32
    )
    jax.block_until_ready((x, queries))
    return x, queries


def _bucket(n):
    b = 512
    while b < n:
        b *= 2
    return b


def load_measured_baseline():
    """Measured native-baseline numbers (bench_baseline.py), if present."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parent / "BASELINE_MEASURED.json"
    if p.exists():
        return json.loads(p.read_text())
    return None


def main():
    import jax

    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from islands_tpu.core.build import build_index
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    from islands_tpu.core.build import build_index_with_sketch

    metric = DistanceMetric.EUCLIDEAN
    # Paper graph degree (m0=60); 32-d sketches (halved JL noise vs the
    # 16-d default) pay off at 1M-scale neighbor density for construction
    # candidate quality and the gated query path. ef_construction=64: with
    # the 2x over-provisioned exact-rescored pool (sketch_pool_mult) the
    # effective candidate set is 128, and 1M-scale recall measured equal to
    # efc=128 at 1.4x the build throughput.
    cfg = LeannConfig(
        metric=metric, wave_size=4096, sketch_dims=32, ef_construction=64
    )

    x, queries = make_bench_corpus(N, DIM, N_QUERIES)

    # --- warmup: load/compile the wave executables on a half-size corpus in
    # the SAME power-of-two structural bucket (identical shapes). Through the
    # axon tunnel, first dispatch of each cached executable costs minutes of
    # load time that has nothing to do with build throughput; the reported
    # build time measures the algorithm, warmup_seconds reports the rest. ---
    n_warm = (_bucket(N) // 2) + 1  # smallest n mapping to N's bucket
    t0 = time.perf_counter()
    gw, _ = build_index_with_sketch(x[:n_warm], cfg)
    jax.block_until_ready(gw.neighbors)
    warm_s = time.perf_counter() - t0
    del gw

    # --- build (sketch-gated wave pipeline; the sketch is reused at query
    # time for the gated search, so its cost is charged to the build) ---
    t0 = time.perf_counter()
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    build_s = time.perf_counter() - t0
    build_vps = N / build_s

    # --- ground truth ---
    _, true_ids = dist_ops.brute_force_topk(queries, x, 10, metric, batch=262144)
    true_ids = np.asarray(true_ids)

    searcher = StoredSearcher(graph, x, metric, sketch=sketch)

    def run(ef, gate):
        ids_all = []
        for s in range(0, N_QUERIES, QUERY_BATCH):
            _, ids = searcher.search(
                queries[s : s + QUERY_BATCH], k=10, ef=ef, expand_width=4,
                gate=gate,
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

    def timed(ef, gate, reps=5):
        t0 = time.perf_counter()
        for _ in range(reps):
            for s in range(0, N_QUERIES, QUERY_BATCH):
                d, i = searcher.search(
                    queries[s : s + QUERY_BATCH], k=10, ef=ef, expand_width=4,
                    gate=gate,
                )
            jax.block_until_ready((d, i))
        return N_QUERIES / ((time.perf_counter() - t0) / reps)

    # Per gate: smallest ef reaching target recall; report the faster gate.
    best = None
    for gate in ("sketch", "exact"):
        chosen = None
        for ef in (24, 32, 48, 64, 96, 128, 192, 256):
            r = recall_of(run(ef, gate))
            if r >= TARGET_RECALL:
                chosen = (ef, r)
                break
        if chosen is None:
            continue
        ef, rec = chosen
        qps = timed(ef, gate)
        if best is None or qps > best[0]:
            best = (qps, gate, ef, rec)
    if best is None:  # neither gate reached target recall: report exact@256
        rec = recall_of(run(256, "exact"))
        best = (timed(256, "exact"), "exact", 256, rec)
    qps, gate, ef, rec = best

    measured = load_measured_baseline()
    ref_qps = measured["ref_qps"] if measured else REF_QPS
    ref_build_vps = measured["ref_build_vps"] if measured else REF_BUILD_VPS

    bytes_per_vec = graph.storage_bytes() / N
    if sketch is not None:
        # On-disk sketch cost: per-node packed sketch + projection + scale
        # (inline neighbor blocks are derived at load time).
        bytes_per_vec += (4 * sketch.node_sketch.size + 4 * sketch.w.size + 4) / N

    print(
        json.dumps(
            {
                "metric": f"qps_at_recall10>={TARGET_RECALL}_{N}x{DIM}",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / ref_qps, 2),
                "recall_at_10": round(rec, 4),
                "ef": ef,
                "gate": gate,
                "build_seconds": round(build_s, 2),
                "build_vectors_per_s": round(build_vps, 1),
                "build_vs_baseline": round(build_vps / ref_build_vps, 2),
                "warmup_seconds": round(warm_s, 2),
                "index_bytes_per_vector": round(bytes_per_vec, 2),
                "baseline_source": "measured" if measured else "estimated",
                "n": N,
                "dim": DIM,
            }
        )
    )


if __name__ == "__main__":
    main()
