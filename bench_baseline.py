"""Measure the native sequential baseline for bench.py's vs_baseline ratios.

The Rust reference publishes no benchmark numbers (BASELINE.md) and no Rust
toolchain exists in this environment, so the baseline is measured from
native/ref_baseline.cpp — a faithful single-threaded C++ (-O3) implementation
of the reference's algorithm (sequential insert with ef_construction
best-first search + high-degree-preserving pruning, leann.rs:560-631/761-833;
heap-and-hashset query search, leann.rs:899-988) on the EXACT bench workload
(same seeds, same Gaussian-mixture corpus as bench.py).

Methodology (everything below is measured, extrapolations are explicit):
  1. Sequential build at n in {16k, 32k, 65k, 131k}; per-insert cost is fit
     to a + b*log2(n) (best-first search cost grows with graph depth) and
     integrated to n=1M to predict the 1M build time.
  2. Query QPS at n=131k at the smallest ef reaching recall@10 >= 0.9
     (ground truth by brute force); extrapolated to 1M by the same log-depth
     model: QPS_1M = QPS_131k * log2(131k)/log2(1M).
Writes BASELINE_MEASURED.json, which bench.py prefers over its estimates.

Run: /opt/venv/bin/python bench_baseline.py   (CPU-only; ~10 minutes)
"""

import hashlib
import json
import os
import pathlib
import re
import subprocess
import sys
import time

import numpy as np

# Corpus generation runs on CPU (threefry is platform-independent, so the
# vectors match bench.py's TPU-generated ones) and must override the axon
# sitecustomize platform pin both via env and via jax.config (the pin is
# applied at interpreter start, before this module runs).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

ROOT = pathlib.Path(__file__).resolve().parent
SIZES = [int(s) for s in os.environ.get(
    "BENCH_SIZES", "16384,32768,65536,131072").split(",")]
N_FULL = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
NQ = 512
M0, EFC = 60, 128
TARGET_RECALL = 0.9
# Non-default dims (e.g. BENCH_DIM=768 for config 4's like-for-like
# denominator) write a side file and tag tmp artifacts so they never
# clobber the headline 128-d baseline.
SUFFIX = "" if DIM == 128 else f"_{DIM}d"
OUT_PATH = ROOT / f"BASELINE_MEASURED{SUFFIX}.json"


def build_binary() -> pathlib.Path:
    src = ROOT / "native" / "ref_baseline.cpp"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    cache = pathlib.Path.home() / ".cache" / "islands_tpu" / "native"
    cache.mkdir(parents=True, exist_ok=True)
    exe = cache / f"ref_baseline-{tag}"
    if not exe.exists():
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", str(src), "-o", str(exe)],
            check=True, capture_output=True, timeout=300,
        )
    return exe


def main():
    from bench import make_bench_corpus

    exe = build_binary()
    tmp = pathlib.Path("/tmp/islands_baseline")
    tmp.mkdir(exist_ok=True)

    n_max = SIZES[-1]
    x, queries = make_bench_corpus(N_FULL, DIM, NQ)
    x = np.asarray(x[:n_max], dtype=np.float32)
    queries = np.asarray(queries, dtype=np.float32)
    (tmp / f"vec{SUFFIX}.f32").write_bytes(x.tobytes())
    (tmp / f"q{SUFFIX}.f32").write_bytes(queries.tobytes())

    # --- 1. sequential build scaling ---
    build_points = []  # (n, seconds, vps)
    for n in SIZES:
        t0 = time.perf_counter()
        out = subprocess.run(
            [str(exe), "build", str(tmp / f"vec{SUFFIX}.f32"), str(n), str(DIM),
             str(tmp / f"graph_{n}{SUFFIX}_v2.bin"), str(M0), str(EFC), "0"],
            check=True, capture_output=True, text=True, timeout=3600,
        ).stdout
        m = re.search(r"build_done n=(\d+) secs=([\d.]+) vps=([\d.]+)", out)
        secs, vps = float(m.group(2)), float(m.group(3))
        build_points.append((n, secs, vps))
        print(f"cpp build n={n}: {secs:.1f}s ({vps:.0f} vec/s)", file=sys.stderr)

    # Fit marginal per-insert cost c(n) = a + b*log2(n) from consecutive
    # build-time differences, then integrate to N_FULL.
    diffs = []
    prev_n, prev_s = 0, 0.0
    for n, s, _ in build_points:
        dn, ds = n - prev_n, s - prev_s
        mid = (n + prev_n) / 2 or n / 2
        diffs.append((np.log2(max(mid, 2)), ds / dn))
        prev_n, prev_s = n, s
    A = np.array([[1.0, lg] for lg, _ in diffs])
    y = np.array([c for _, c in diffs])
    (a, b), *_ = np.linalg.lstsq(A, y, rcond=None)
    # integral of a + b*log2(t) dt from 0..N = a*N + b*(N*log2(N) - N/ln2)
    n_f = float(N_FULL)
    t_full = a * n_f + b * (n_f * np.log2(n_f) - n_f / np.log(2.0))
    t_full = max(t_full, build_points[-1][1])  # never faster than measured prefix
    ref_build_vps = N_FULL / t_full
    print(f"fit c(n) = {a*1e3:.3f}ms + {b*1e3:.3f}ms*log2(n); "
          f"T({N_FULL}) = {t_full:.0f}s -> {ref_build_vps:.0f} vec/s",
          file=sys.stderr)

    # --- 2. query QPS at recall>=0.9 on the largest built graph ---
    n = n_max
    # brute-force ground truth (numpy, chunked)
    qn = (queries ** 2).sum(1)
    best_d = np.full((NQ, 10), np.inf, dtype=np.float32)
    best_i = np.full((NQ, 10), -1, dtype=np.int64)
    for s0 in range(0, n, 16384):
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
            [str(exe), "search", str(tmp / f"graph_{n}{SUFFIX}_v2.bin"), str(tmp / f"vec{SUFFIX}.f32"),
             str(n), str(DIM), str(tmp / f"q{SUFFIX}.f32"), str(NQ), str(ef), "10",
             str(tmp / f"ids{SUFFIX}.bin")],
            check=True, capture_output=True, text=True, timeout=600,
        ).stdout
        m = re.search(r"qps=([\d.]+)", out)
        qps = float(m.group(1))
        ids = np.frombuffer((tmp / f"ids{SUFFIX}.bin").read_bytes(), dtype=np.int32).reshape(NQ, 10)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(NQ)
        ]))
        print(f"cpp search n={n} ef={ef}: qps={qps:.0f} recall={rec:.4f}",
              file=sys.stderr)
        if rec >= TARGET_RECALL:
            chosen = (ef, qps, rec)
            break
    if chosen is None:
        chosen = (256, qps, rec)
    ef, qps_prefix, rec = chosen
    depth_factor = np.log2(n) / np.log2(N_FULL)
    ref_qps = qps_prefix * depth_factor

    result = {
        "ref_qps": round(ref_qps, 1),
        "ref_build_vps": round(ref_build_vps, 1),
        "methodology": (
            "single-thread C++ -O3 reimplementation of the reference's "
            "sequential algorithm (native/ref_baseline.cpp) on the bench "
            "workload; build fit a+b*log2(n) on measured prefixes, query "
            f"QPS measured at n={n_max} at recall@10>=0.9 and scaled by "
            f"log2({n_max})/log2(N) for search-depth growth"
        ),
        "cpu": "driver host, single thread",
        "build_points": [
            {"n": n_, "seconds": round(s_, 2), "vps": round(v_, 1)}
            for n_, s_, v_ in build_points
        ],
        "build_fit_ms": {"a": round(a * 1e3, 4), "b": round(b * 1e3, 4)},
        "predicted_build_seconds_full": round(t_full, 1),
        "query_prefix": {
            "n": n, "ef": ef, "qps": round(qps_prefix, 1), "recall": round(rec, 4)
        },
        "n_full": N_FULL,
        "dim": DIM,
        "m0": M0,
        "ef_construction": EFC,
    }
    OUT_PATH.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
