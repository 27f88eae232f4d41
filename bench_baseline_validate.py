"""Validate BASELINE_MEASURED.json's query-scaling extrapolation with a
second measured point (VERDICT r2 weakness #6: the query side of the
baseline had one measured point, 131k, extrapolated to 1M by a
log2-depth model — this script measures the C++ reference search at 512k
and records how well the model predicted it).

Builds the sequential C++ reference index at n=524288 (~30-40 min single
thread — run in the background; CPU only, never touches the TPU), sweeps ef
for recall@10 >= 0.9 against brute-force ground truth, and appends a
`query_validation` block to BASELINE_MEASURED.json:

    predicted_qps = qps_131k * log2(131072)/log2(524288)

If the measured 512k QPS lands near the prediction, the 1M extrapolation in
`ref_qps` stands; if it bends, `ref_qps` should be refit (the script prints
both but does NOT silently change ref_qps — that is a deliberate manual
step so the headline denominator never moves without review).

Run: /opt/venv/bin/python bench_baseline_validate.py
"""

import json
import os
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

ROOT = pathlib.Path(__file__).resolve().parent
N_VAL = 524288
N_FULL = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
NQ = 512
M0, EFC = 60, 128
TARGET_RECALL = 0.9


def main():
    from bench import make_bench_corpus
    from bench_baseline import build_binary

    exe = build_binary()
    tmp = pathlib.Path("/tmp/islands_baseline")
    tmp.mkdir(exist_ok=True)

    x, queries = make_bench_corpus(N_FULL, DIM, NQ)
    x = np.asarray(x[:N_VAL], dtype=np.float32)
    queries = np.asarray(queries, dtype=np.float32)
    vec_path = tmp / "vec512k.f32"
    vec_path.write_bytes(x.tobytes())
    (tmp / "q.f32").write_bytes(queries.tobytes())

    # v2: moving-entry graph format; never reuse a v1 (entry=0) graph —
    # round 3 recorded recall .002 here because the pinned-entry stand-in
    # left node 0 in an out-closed 154-node island (see ref_baseline.cpp
    # header comment for the diagnosis).
    graph_path = tmp / f"graph_{N_VAL}_v2.bin"
    if not graph_path.exists():
        print(f"building C++ reference index at n={N_VAL} "
              "(expect ~30-40 min single-thread)", file=sys.stderr)
        t0 = time.perf_counter()
        out = subprocess.run(
            [str(exe), "build", str(vec_path), str(N_VAL), str(DIM),
             str(graph_path), str(M0), str(EFC), "65536"],
            check=True, capture_output=True, text=True, timeout=7200,
        ).stdout
        m = re.search(r"build_done n=(\d+) secs=([\d.]+) vps=([\d.]+)", out)
        build_secs = float(m.group(2))
        print(f"cpp build n={N_VAL}: {build_secs:.1f}s "
              f"({float(m.group(3)):.0f} vec/s)", file=sys.stderr)
    else:
        build_secs = None
        print(f"reusing {graph_path}", file=sys.stderr)

    # Brute-force ground truth (numpy, chunked).
    qn = (queries ** 2).sum(1)
    best_d = np.full((NQ, 10), np.inf, dtype=np.float32)
    best_i = np.full((NQ, 10), -1, dtype=np.int64)
    for s0 in range(0, N_VAL, 16384):
        xb = x[s0 : s0 + 16384]
        d2 = qn[:, None] + (xb ** 2).sum(1)[None, :] - 2.0 * queries @ xb.T
        ids = np.arange(s0, s0 + xb.shape[0])
        alld = np.concatenate([best_d, d2.astype(np.float32)], axis=1)
        alli = np.concatenate([best_i, np.broadcast_to(ids, (NQ, len(ids)))], axis=1)
        part = np.argpartition(alld, 10, axis=1)[:, :10]
        best_d = np.take_along_axis(alld, part, axis=1)
        best_i = np.take_along_axis(alli, part, axis=1)
    true_ids = best_i

    chosen = None
    for ef in (32, 48, 64, 96, 128, 192, 256):
        out = subprocess.run(
            [str(exe), "search", str(graph_path), str(vec_path),
             str(N_VAL), str(DIM), str(tmp / "q.f32"), str(NQ), str(ef),
             "10", str(tmp / "ids512k.bin")],
            check=True, capture_output=True, text=True, timeout=600,
        ).stdout
        qps = float(re.search(r"qps=([\d.]+)", out).group(1))
        ids = np.frombuffer(
            (tmp / "ids512k.bin").read_bytes(), dtype=np.int32
        ).reshape(NQ, 10)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(NQ)
        ]))
        print(f"cpp search n={N_VAL} ef={ef}: qps={qps:.0f} recall={rec:.4f}",
              file=sys.stderr)
        if rec >= TARGET_RECALL:
            chosen = (ef, qps, rec)
            break
    if chosen is None:
        chosen = (256, qps, rec)
    ef, qps_512k, rec = chosen

    baseline = json.loads((ROOT / "BASELINE_MEASURED.json").read_text())
    qps_131k = baseline["query_prefix"]["qps"]
    predicted = qps_131k * np.log2(131072) / np.log2(N_VAL)
    baseline["query_validation"] = {
        "n": N_VAL,
        "ef": ef,
        "qps": round(qps_512k, 1),
        "recall": round(rec, 4),
        "predicted_qps_by_log2_model": round(float(predicted), 1),
        "model_error_pct": round(100.0 * (qps_512k - predicted) / predicted, 1),
    }
    if build_secs is not None:
        baseline["query_validation"]["build_seconds"] = round(build_secs, 1)
    (ROOT / "BASELINE_MEASURED.json").write_text(json.dumps(baseline, indent=1))
    print(json.dumps(baseline["query_validation"]))


if __name__ == "__main__":
    main()
