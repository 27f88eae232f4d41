"""Headline benchmark: QPS at recall@10 >= 0.9 on synthetic vectors
(BASELINE.json config 2: graph build + pure beam search with stored
embeddings), run on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "queries/s", "vs_baseline": ratio, ...}

Baselines are MEASURED (BASELINE_MEASURED.json: single-thread C++ -O3
reimplementation of the reference's sequential algorithm on the identical
workload); the module-level REF_* constants are only the fallback if that
file is missing.

Robustness contract (round 3; round 2's driver run timed out with rc=124 and
recorded nothing): the benchmark ALWAYS emits its JSON line within
BENCH_BUDGET_S seconds (default 1050). A watchdog thread emits the
best-so-far result and exits 0 when the budget is nearly exhausted — JAX
device calls don't yield to Python signal handlers, so a thread + os._exit
is the only preemption that works mid-dispatch. Stage progress streams to
stderr so a hard kill still leaves forensics. The expensive half-corpus
warmup build is replaced by build.warm_build_executables (one wave at the
bucket shapes), and the recall sweep starts at the known-good operating
point instead of walking a ladder.
"""

import json
import os
import sys
import threading
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 4096))
QUERY_BATCH = int(os.environ.get("BENCH_QUERY_BATCH", 4096))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1050))
TARGET_RECALL = 0.9
REF_QPS = 1000.0  # fallback only; see module docstring
REF_BUILD_VPS = 3000.0

_T0 = time.monotonic()
_EMITTED = threading.Event()
# Best-so-far result; the watchdog emits this verbatim. Populated stage by
# stage so a timeout at any point still records every number measured so far.
_RESULT = {
    "metric": f"qps_at_recall10>={TARGET_RECALL}_{N}x{DIM}",
    "value": 0.0,
    "unit": "queries/s",
    "vs_baseline": 0.0,
    "n": N,
    "dim": DIM,
    "stage": "init",
}


def elapsed() -> float:
    return time.monotonic() - _T0


def budget_left() -> float:
    return BUDGET_S - 30.0 - elapsed()


def log(msg: str) -> None:
    print(f"[bench {elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit_and_exit(code: int = 0) -> None:
    if not _EMITTED.is_set():
        _EMITTED.set()
        print(json.dumps(_RESULT), flush=True)
    os._exit(code)


def _watchdog() -> None:
    while True:
        left = budget_left()
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    log(f"budget {BUDGET_S}s nearly exhausted -> emitting best-so-far")
    if _RESULT.get("stage") in ("init", "corpus"):
        # No device work completed: the TPU/tunnel never answered (a wedged
        # chip claim hangs PJRT client init indefinitely) — distinguish that
        # from a slow build so the record isn't read as an algorithm result.
        _RESULT["error"] = "tpu_unreachable: no device op completed in budget"
    emit_and_exit(0)


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


def load_measured_baseline():
    """Measured native-baseline numbers (bench_baseline.py), if present."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parent / "BASELINE_MEASURED.json"
    if p.exists():
        return json.loads(p.read_text())
    return None


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from islands_tpu.core.build import build_index_with_sketch, warm_build_executables
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    measured = load_measured_baseline()
    ref_qps = measured["ref_qps"] if measured else REF_QPS
    ref_build_vps = measured["ref_build_vps"] if measured else REF_BUILD_VPS
    _RESULT["baseline_source"] = "measured" if measured else "estimated"

    metric = DistanceMetric.EUCLIDEAN
    # Paper graph degree (m0=60); 48-d sketches at reverse_slack=20: the
    # build HBM peak scales with bw*dims (bw = m0 + slack), so trimming
    # slack 60 -> 20 fits the higher-fidelity sketches in the footprint of
    # the old dims=32/bw=120 config — and builds FASTER (waves scale with
    # bw) with recall up at every capped rung (design.md §17, tune_1m tags
    # O/P: ef32/i16 .9736 vs .9099). ef_construction=64: with the 2x
    # over-provisioned exact-rescored pool (sketch_pool_mult) the effective
    # candidate set is 128, and 1M-scale recall measured equal to efc=128
    # at 1.4x the build throughput.
    cfg = LeannConfig(
        metric=metric, wave_size=4096, sketch_dims=48, ef_construction=64,
        reverse_slack=20,
    )

    log(f"corpus gen: {N}x{DIM}, {N_QUERIES} queries")
    x, queries = make_bench_corpus(N, DIM, N_QUERIES)
    _RESULT["stage"] = "corpus"

    # --- warmup: dispatch (load) the build executables at the bucket shapes.
    # Executable LOAD through the axon tunnel costs minutes per process and
    # has nothing to do with build throughput; warmup_seconds reports it. ---
    log("warming build executables (one wave at bucket shapes)")
    t0 = time.perf_counter()
    warm_build_executables(N, DIM, cfg)
    warm_s = time.perf_counter() - t0
    _RESULT["warmup_seconds"] = round(warm_s, 2)
    _RESULT["stage"] = "warmed"
    log(f"warmup done in {warm_s:.1f}s; starting timed build")

    # --- build (sketch-gated wave pipeline; the sketch is reused at query
    # time for the gated search, so its cost is charged to the build) ---
    t0 = time.perf_counter()
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    build_s = time.perf_counter() - t0
    build_vps = N / build_s
    # Two accountings (VERDICT r4 weak #4, the BASELINE "equal index size"
    # clause). Storage-parity: the graph CSR alone (4 B/edge + offsets +
    # levels) — the reference's on-disk layout (leann.rs:180-191, ~244 B at
    # m0=60). This is a real persistence mode (storage.save_index
    # persist_sketch=False): the sketch is deterministically re-derived at
    # load from stored embeddings + graph + seed (one projection matmul;
    # bit-identical, tests/test_storage.py), so every QPS rung below holds
    # at reference-equal index size. The default accounting additionally
    # charges the persisted sketch (node table + projection + scale; inline
    # neighbor blocks always derive at load) for deployments that persist
    # it to skip the load-time matmul.
    parity_bytes = graph.storage_bytes() / N
    bytes_per_vec = parity_bytes
    if sketch is not None:
        bytes_per_vec += (4 * sketch.node_sketch.size + 4 * sketch.w.size + 4) / N
    _RESULT.update(
        build_seconds=round(build_s, 2),
        build_vectors_per_s=round(build_vps, 1),
        build_vs_baseline=round(build_vps / ref_build_vps, 2),
        index_bytes_per_vector=round(bytes_per_vec, 2),
        index_bytes_per_vector_storage_parity=round(parity_bytes, 2),
        stage="built",
    )
    log(f"build {build_s:.1f}s = {build_vps:.0f} vec/s "
        f"({build_vps / ref_build_vps:.1f}x baseline)")

    # --- ground truth (batch sized so the [Q, batch] chunk stays ~1 GB
    # next to the live graph + sketch state: 131072 worked four times in
    # round 4 but OOMed once in round 5 — fact 17's 65536 is the margin
    # that survives HBM-layout variance) ---
    log("ground truth (brute force)")
    _, true_ids = dist_ops.brute_force_topk(queries, x, 10, metric, batch=65536)
    true_ids = np.asarray(true_ids)
    _RESULT["stage"] = "ground_truth"

    # Dense routing entries (6.5% of corpus): the query approach starts at
    # the nearest of 65536 sampled nodes by sketch distance (one [B, R]
    # matmul — QPS-neutral), which cuts hops-to-converge and buys the
    # low-iteration-cap rungs their recall (tune_1m tags H/I/J: recall at
    # i16 rises .8734 -> .9099 from r4096 -> r65536; saturated by r131072).
    searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                              routing_size=65536)

    # Fused Pallas hop-merge (ops/pallas_kernels.hop_merge_op_for): the
    # id-sort dedup + AQ bitonic merge + promote split run as one
    # VMEM-resident program per query block. Bit-identical results at every
    # rung (BENCH_HOP_FUSED.json: recall equal to 4 decimals, ids parity
    # tested) and a +1.5-3% QPS edge on the sketch gate; exact gate rungs
    # ignore the knob (no AQ).
    HOP_MERGE = "fused"

    def run(ef, gate, promote=None, max_iters=None, xw=4, fr=0):
        ids_all = []
        for s in range(0, N_QUERIES, QUERY_BATCH):
            _, ids = searcher.search(
                queries[s : s + QUERY_BATCH], k=10, ef=ef, expand_width=xw,
                gate=gate, promote_width=promote, max_iters=max_iters,
                final_rescore=fr, hop_merge=HOP_MERGE,
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

    def timed(ef, gate, promote=None, max_iters=None, reps=5, xw=4, fr=0):
        t0 = time.perf_counter()
        for _ in range(reps):
            for s in range(0, N_QUERIES, QUERY_BATCH):
                d, i = searcher.search(
                    queries[s : s + QUERY_BATCH], k=10, ef=ef,
                    expand_width=xw,
                    gate=gate, promote_width=promote, max_iters=max_iters,
                    final_rescore=fr, hop_merge=HOP_MERGE,
                )
            jax.block_until_ready((d, i))
        return N_QUERIES / ((time.perf_counter() - t0) / reps)

    def timed3(ef, gate, promote=None, max_iters=None, xw=4, fr=0):
        """Median-of-3 timings (each itself reps=5) so the recorded QPS is
        robust to the ~1.5x session-to-session tunnel variance (CLAUDE.md
        fact 35); the spread is recorded alongside the median."""
        runs = sorted(
            timed(ef, gate, promote, max_iters, xw=xw, fr=fr)
            for _ in range(3)
        )
        return runs[1], [round(r, 1) for r in runs]

    # Headline rung needs .01 recall margin over the gate so QPS variance
    # (not recall variance) is the only noise in the official number.
    HEADLINE_MIN_RECALL = 0.91

    def record(qps, ef, gate, rec, promote=None, max_iters=None, xw=4,
               qps_runs=None, fr=0):
        _RESULT.setdefault("rungs", []).append({
            "gate": gate, "ef": ef, "promote": promote,
            "max_iters": max_iters, "expand_width": xw,
            "final_rescore": fr,
            "recall": round(rec, 4), "qps": round(qps, 1),
            **({"qps_runs": qps_runs} if qps_runs else {}),
        })
        if qps > _RESULT["value"] and rec >= HEADLINE_MIN_RECALL:
            _RESULT.update(
                value=round(qps, 1),
                vs_baseline=round(qps / ref_qps, 2),
                recall_at_10=round(rec, 4),
                ef=ef,
                gate=gate,
                promote=promote,
                stage="query",
            )
            if qps_runs:
                _RESULT["qps_runs"] = qps_runs
            log(f"recorded {gate}@ef={ef}/p={promote}: {qps:.0f} QPS @ recall "
                f"{rec:.4f} ({qps / ref_qps:.2f}x baseline)")

    # Ladder (tuned on-chip, benches/tune_1m.py runs A/E/H-P at 1Mx128;
    # final_rescore sweep BENCH_FINAL_RESCORE/FR_PROBE, round 5).
    # Four effects compose: (a) the batched while_loop runs until the
    # SLOWEST query in the batch converges, so capping max_iters trades
    # straggler tail recall for batch QPS; (b) dense routing (above)
    # shortens the approach so low caps keep recall; (c) per-hop exact
    # promotion is one of the three hop costs (design.md §20), so a
    # NARROW promote_width + one end-of-loop exact rescore of the AQ head
    # (final_rescore — recovers the stranded true neighbors once per
    # query instead of paying per hop) dominates the round-4 wide-promote
    # rungs on both axes: p16/i12/fr64 .9362 @ 59.5k vs p48/i10 .918 @
    # 56.5k same-session; (d) expand_width=2 halves the per-hop candidate
    # count (fact 35).
    # 1. sketch@ef=32, p=8, i=12, x2, fr=64: fast rung (.9113 @ ~62.0k —
    #    thin .0013 margin over the .91 guard; falls back to rung 2 as the
    #    headline if this build's recall lands under it).
    # 2. sketch@ef=32, p=16, i=12, x2, fr=64: primary (.9362 @ ~59.5k).
    # 3. sketch@ef=32, p=24, i=12, x2, fr=64: margin rung (.9508 @ ~57.9k).
    # 4. sketch@ef=32, p=48, i=10, x2: round-4 primary control (.918).
    # 5. sketch@ef=32, p=64, max_iters=10: recall-margin point
    #    (.9847 @ ~42.0k) — measured if budget allows even after earlier
    #    rungs record, so the JSON carries all operating points in
    #    "rungs". Fallbacks only run if nothing clears TARGET_RECALL.
    primary = [("sketch", 32, 8, 12, 2, 64), ("sketch", 32, 16, 12, 2, 64),
               ("sketch", 32, 24, 12, 2, 64),
               ("sketch", 32, 48, 10, 2, 0), ("sketch", 32, 64, 10, 4, 0)]
    fallback = [
        ("sketch", 32, 64, 12, 4, 0), ("sketch", 32, 96, 12, 4, 0),
        ("sketch", 32, None, 16, 4, 0), ("sketch", 32, None, None, 4, 0),
        ("exact", 64, None, None, 4, 0), ("exact", 128, None, None, 4, 0),
    ]
    for gate, ef, promote, max_iters, xw, fr in primary:
        if budget_left() < 60:
            log(f"skipping {gate}@ef={ef}: budget nearly exhausted")
            break
        log(f"recall check: {gate}@ef={ef}/p={promote}/i={max_iters}/x={xw}"
            f"/fr={fr}")
        rec = recall_of(run(ef, gate, promote, max_iters, xw, fr))
        log(f"  recall {rec:.4f}")
        if rec >= TARGET_RECALL:
            qps, runs = timed3(ef, gate, promote, max_iters, xw=xw, fr=fr)
            record(qps, ef, gate, rec, promote, max_iters, xw,
                   qps_runs=runs, fr=fr)

    for gate, ef, promote, max_iters, xw, fr in fallback:
        if _RESULT["value"] > 0:
            break
        if budget_left() < 60:
            log(f"skipping {gate}@ef={ef}: budget nearly exhausted")
            break
        log(f"recall check: {gate}@ef={ef}/i={max_iters}")
        rec = recall_of(run(ef, gate, promote, max_iters, xw, fr))
        log(f"  recall {rec:.4f}")
        if rec >= TARGET_RECALL:
            qps, runs = timed3(ef, gate, promote, max_iters, xw=xw, fr=fr)
            record(qps, ef, gate, rec, promote, max_iters, xw,
                   qps_runs=runs, fr=fr)

    if _RESULT["value"] == 0 and budget_left() > 90:
        # No rung reached HEADLINE_MIN_RECALL: report exact@256 honestly
        # (record() still requires >= .91; exact@256 measures ~.99).
        rec = recall_of(run(256, "exact"))
        record(timed(256, "exact"), 256, "exact", rec)

    _RESULT.pop("stage", None)
    log(f"done in {elapsed():.1f}s")
    emit_and_exit(0)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — always emit the JSON line
        _RESULT["error"] = f"{type(exc).__name__}: {exc}"
        log(f"FATAL: {_RESULT['error']}")
        emit_and_exit(1)
