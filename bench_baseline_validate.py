"""Validate BASELINE_MEASURED.json's query-scaling extrapolation with
measured points above the 131k prefix (VERDICT r2 weakness #6 / r3
missing #2: the query side of the baseline had one measured point,
131k, extrapolated to 1M by a log2-depth model).

Builds the sequential C++ reference index at n=N_VAL (env, default
524288; ~25-40 min single thread — run in the background; CPU only,
never touches the TPU), sweeps ef for recall@10 >= 0.9 against
brute-force ground truth, and records the point under
`query_validation_points` in BASELINE_MEASURED.json keyed by n.

ROUND-4 FINDING (measured, both with the v2 moving-entry graphs): the
reference algorithm's recall COLLAPSES above ~262k on this clustered
workload — at 512k the best measured point is recall .1145 @ ef=256,
with the entry point verified inside the giant out-component (69.7% of
nodes, BFS diameter 22). The failure is navigability, not the round-3
harness bug (pinned entry=0 in a 154-node island, since fixed): the
reference prunes overflowing rows to the nearest m0 (leann.rs:634-658),
so once a cluster holds more members than m0=60 every long-range edge
is eventually stripped and flat best-first search cannot cross between
clusters. Consequence for the headline multipliers: the reference
cannot reach recall .9 AT ALL at bench scale (1M), so `ref_qps` — its
131k operating point log2-scaled to 1M as if recall had held — is an
upper bound on the reference's true capability and every vs_baseline
ratio computed against it is conservative.

When the recall gate is not attained, the block records
`recall_gate_attained: false`, the best point, and a BFS
giant-component diagnosis instead of pretending the log-QPS model was
validated at matched recall.

Run: N_VAL=262144 /opt/venv/bin/python bench_baseline_validate.py
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
N_VAL = int(os.environ.get("N_VAL", 524288))
N_FULL = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
NQ = 512
M0, EFC = 60, 128
TARGET_RECALL = 0.9


def giant_component(adj: np.ndarray, start: int) -> tuple[int, int]:
    """Out-reachable set size and BFS hop count from `start` over the
    [n, m0] -1-padded adjacency."""
    n = adj.shape[0]
    seen = np.zeros(n, dtype=bool)
    seen[start] = True
    frontier = np.array([start])
    hops = 0
    while len(frontier):
        nxt = adj[frontier].ravel()
        nxt = nxt[nxt >= 0]
        nxt = np.unique(nxt)
        nxt = nxt[~seen[nxt]]
        seen[nxt] = True
        frontier = nxt
        hops += 1
    return int(seen.sum()), hops


def main():
    from bench import make_bench_corpus
    from bench_baseline import build_binary

    exe = build_binary()
    tmp = pathlib.Path("/tmp/islands_baseline")
    tmp.mkdir(exist_ok=True)

    x, queries = make_bench_corpus(N_FULL, DIM, NQ)
    x = np.asarray(x[:N_VAL], dtype=np.float32)
    queries = np.asarray(queries, dtype=np.float32)
    vec_path = tmp / f"vec_{N_VAL}.f32"
    if not vec_path.exists() and N_VAL == 524288 and (tmp / "vec512k.f32").exists():
        vec_path = tmp / "vec512k.f32"  # pre-round-4 artifact name
    if not vec_path.exists():
        vec_path.write_bytes(x.tobytes())
    q_path = tmp / f"qval_{N_VAL}.f32"
    q_path.write_bytes(queries.tobytes())

    # v2: moving-entry graph format; never reuse a v1 (entry=0) graph —
    # round 3 recorded recall .002 here because the pinned-entry stand-in
    # left node 0 in an out-closed 154-node island (see ref_baseline.cpp
    # header comment for the diagnosis).
    graph_path = tmp / f"graph_{N_VAL}_v2.bin"
    if not graph_path.exists():
        print(f"building C++ reference index at n={N_VAL} "
              "(expect ~25-40 min single-thread)", file=sys.stderr)
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

    ids_path = tmp / f"idsval_{N_VAL}.bin"
    chosen = None
    for ef in (32, 48, 64, 96, 128, 192, 256):
        out = subprocess.run(
            [str(exe), "search", str(graph_path), str(vec_path),
             str(N_VAL), str(DIM), str(q_path), str(NQ), str(ef),
             "10", str(ids_path)],
            check=True, capture_output=True, text=True, timeout=600,
        ).stdout
        qps = float(re.search(r"qps=([\d.]+)", out).group(1))
        ids = np.frombuffer(ids_path.read_bytes(), dtype=np.int32).reshape(NQ, 10)
        rec = float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(NQ)
        ]))
        print(f"cpp search n={N_VAL} ef={ef}: qps={qps:.0f} recall={rec:.4f}",
              file=sys.stderr)
        if rec >= TARGET_RECALL:
            chosen = (ef, qps, rec)
            break
    gate_attained = chosen is not None
    if chosen is None:
        chosen = (256, qps, rec)
    ef, qps_val, rec = chosen

    baseline = json.loads((ROOT / "BASELINE_MEASURED.json").read_text())
    qps_prefix = baseline["query_prefix"]["qps"]
    n_prefix = baseline["query_prefix"]["n"]
    predicted = qps_prefix * np.log2(n_prefix) / np.log2(N_VAL)
    point = {
        "n": N_VAL,
        "ef": ef,
        "qps": round(qps_val, 1),
        "recall": round(rec, 4),
        "recall_gate_attained": gate_attained,
        "predicted_qps_by_log2_model": round(float(predicted), 1),
    }
    if gate_attained:
        point["model_error_pct"] = round(
            100.0 * (qps_val - predicted) / predicted, 1)
    else:
        # Matched-recall comparison is impossible: diagnose the graph
        # instead so the record explains WHY (navigability collapse).
        raw = np.fromfile(graph_path, dtype=np.int32)
        gn, gm0, entry = int(raw[0]), int(raw[1]), int(raw[2])
        adj = raw[3:].reshape(gn, gm0)
        reach, hops = giant_component(adj, entry)
        point["diagnosis"] = {
            "entry": entry,
            "reachable_from_entry": reach,
            "reachable_fraction": round(reach / gn, 4),
            "bfs_hops": hops,
            "conclusion": (
                "reference recall collapses at this n on the clustered "
                "bench workload (keep-nearest-m0 overflow pruning strips "
                "long-range edges once clusters exceed m0 members; flat "
                "best-first search then cannot cross clusters even inside "
                "the giant component) — ref_qps at matched recall is an "
                "UPPER BOUND on the reference; vs_baseline is conservative"
            ),
        }
    if build_secs is not None:
        point["build_seconds"] = round(build_secs, 1)
    points = baseline.get("query_validation_points", [])
    points = [p for p in points if p.get("n") != N_VAL] + [point]
    baseline["query_validation_points"] = sorted(points, key=lambda p: p["n"])
    baseline.pop("query_validation", None)  # pre-round-4 single-point schema
    (ROOT / "BASELINE_MEASURED.json").write_text(json.dumps(baseline, indent=1))
    print(json.dumps(point))


if __name__ == "__main__":
    main()
