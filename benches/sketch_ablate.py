"""128-d sketch-gate per-hop cost ablation — the twolevel_ablate.py method
applied to the OFFICIAL headline path (_search_one_sketch_gated at bench.py's
primary rung: 1Mx128, ef=32/aq=64/p=48/i=10/x=2/r=65536, batch 4096).

Round-2's lead said "the pool+em merge sort is the largest per-hop cost";
the 768-d ablation later proved such guesses wrong twice (ADC was 70%, then
host transfers were 3x). This measures, per component, with the hop count
FORCED (fixed-trip scan, so queue dynamics can't change trips):

  full          — faithful reimplementation (recall sanity-checked vs GT)
  no_routing    — global entry instead of the in-jit [B, R] sketch routing
                  (routing is per-batch, not per-hop — its cost reads
                  directly as full - no_routing)
  routing_mm    — routing via |r|^2 - 2 q.r (one [B,P]x[P,R] MXU matmul)
                  instead of the broadcast diff-square (VPU elementwise)
  no_unpack     — inline sketch blocks reinterpreted without the int8
                  shift/mask unpack (wrong values, same gather bytes)
  no_sketchdist — sketch distance replaced by a free function of ids
                  (keeps the unpack, drops the diff-square)
  no_exact      — promotions enter the pool at sketch distances
  no_dedup / no_visited / no_aqmerge / no_poolmerge / no_topk
  sorts_only    — all merges, no scoring
  gathers_only  — scoring, no merges

Setup cached in /tmp/sketch1m_cache (graph + sketch leaves as .npz; corpus
regenerates from bench.make_bench_corpus's fixed seeds). Run SOLO on the
chip (CLAUDE.md facts 29/32).
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# SKETCH_ABLATE_SMALL=1: 16k-corpus CPU smoke test (shape/trace check only).
SMALL = os.environ.get("SKETCH_ABLATE_SMALL") == "1"
if SMALL:
    # Must happen before ANY backend use (fact 24: the axon sitecustomize
    # ignores JAX_PLATFORMS; a late update leaves the smoke test queued
    # behind the real chip job).
    import jax

    jax.config.update("jax_platforms", "cpu")
CACHE = pathlib.Path("/tmp/sketch1m_cache_small" if SMALL
                     else "/tmp/sketch1m_cache")


def get_setup():
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from bench import make_bench_corpus
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.csr import CsrGraph
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.ops import proj as proj_ops

    n, dim, nq = (16_384, 128, 64) if SMALL else (1_000_000, 128, 4096)
    metric = DistanceMetric.EUCLIDEAN
    x, queries = make_bench_corpus(n, dim, nq)

    gt_p = CACHE / "gt.npy"
    CACHE.mkdir(exist_ok=True)
    if gt_p.exists():
        gt = np.load(gt_p)
    else:
        _, gt = dist_ops.brute_force_topk(queries, x, 10, metric,
                                          batch=131072)
        gt = np.asarray(gt)
        np.save(gt_p, gt)

    idx_p = CACHE / "index.npz"
    if idx_p.exists():
        z = np.load(idx_p)
        graph = CsrGraph(
            neighbors=jnp.asarray(z["neighbors"]),
            degrees=jnp.asarray(z["degrees"]),
            levels=jnp.asarray(z["levels"]),
            entry_point=jnp.asarray(z["entry_point"]),
            max_level=jnp.asarray(z["max_level"]),
        )
        sketch = proj_ops.SketchIndex(
            w=jnp.asarray(z["w"]), scale=jnp.asarray(z["scale"]),
            node_sketch=jnp.asarray(z["node_sketch"]),
            nbr_sketch=jnp.asarray(z["nbr_sketch"]),
        )
    else:
        cfg = LeannConfig(metric=metric, wave_size=4096, sketch_dims=48,
                          ef_construction=64, reverse_slack=20)
        t0 = time.perf_counter()
        graph, sketch = build_index_with_sketch(x, cfg)
        jax.block_until_ready(graph.neighbors)
        print(f"[setup] build {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        np.savez(idx_p,
                 neighbors=np.asarray(graph.neighbors),
                 degrees=np.asarray(graph.degrees),
                 levels=np.asarray(graph.levels),
                 entry_point=np.asarray(graph.entry_point),
                 max_level=np.asarray(graph.max_level),
                 w=np.asarray(sketch.w), scale=np.asarray(sketch.scale),
                 node_sketch=np.asarray(sketch.node_sketch),
                 nbr_sketch=np.asarray(sketch.nbr_sketch))
    return graph, sketch, x, queries, gt, metric


def main():
    import jax
    import jax.numpy as jnp

    from islands_tpu.core.csr import SENTINEL
    from islands_tpu.core.search import (_not_in_set, pack_id_expanded,
                                         route_entries)
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.ops import proj as proj_ops
    from islands_tpu.ops.merge import merge_sorted_with_new

    graph, sketch, x, queries, gt, metric = get_setup()
    n, m = graph.neighbors.shape
    nq = queries.shape[0]
    dim = int(x.shape[1])
    ef, aq_width, promote_width, xw, mi = 32, 64, 48, 2, 10
    r_size = 4096 if SMALL else 65536
    em = xw * m

    xp_a = dist_ops.prep_corpus(x, metric)
    qp_a = dist_ops.prep_query(queries, metric)
    qs_a = proj_ops.sketch_query(qp_a, sketch.w, sketch.scale)
    rng = np.random.default_rng(0)
    routing_a = jnp.asarray(
        np.sort(rng.choice(n, size=r_size, replace=False)), jnp.int32)
    INF = jnp.inf

    # Pre-routed entries for the no_routing-cost comparison rows.
    entries_global_a = jnp.full((nq,), int(graph.entry_point), jnp.int32)

    # int8-row candidate layout: [N, M*P] int8 — SAME bytes as the packed
    # [N, M*P/4] int32 (still a lane-multiple row: M*48 % 128 == 0 for
    # M in {80, 120}), but the hop loop replaces the 4-op shift/mask/
    # sign-extend unpack + cross-lane reshape with one astype. Derived
    # here in row chunks to bound the f32 intermediate.
    def repack_int8(packed, chunk=131072):
        outs = []
        for s in range(0, packed.shape[0], chunk):
            raw = proj_ops.unpack_raw(packed[s:s + chunk])
            outs.append(raw.astype(jnp.int8))
        return jnp.concatenate(outs, axis=0)

    nbr_i8_a = jax.block_until_ready(repack_int8(sketch.nbr_sketch))
    # Big arrays travel as jit ARGUMENTS via this ctx tuple (CLAUDE.md
    # fact 1: a closed-over device array bakes in as an executable
    # constant — 13 variants x multi-GB constants would be fatal).
    ctx_a = (xp_a, graph.neighbors, sketch.nbr_sketch, sketch.node_sketch,
             routing_a, entries_global_a, sketch.scale, nbr_i8_a)

    def route_mm(qs, node_sketch, routing):
        raw = proj_ops.unpack_raw(node_sketch[routing])  # [R, P]
        r2 = jnp.einsum("rp,rp->r", raw, raw,
                        preferred_element_type=jnp.float32)
        cross = jnp.einsum("bp,rp->br", qs.astype(jnp.bfloat16),
                           raw.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        return routing[jnp.argmin(r2[None, :] - 2.0 * cross, axis=1)]

    def search_one(q1, qs1, entry, xp, neighbors, nbr_sketch, scale,
                   *, skip):
        def exact_d(ids, valid):
            rows = xp[jnp.clip(ids, 0, n - 1)]
            d = dist_ops.rowwise_distance(q1, rows, metric)
            return jnp.where(valid, d, INF)

        entry = jnp.maximum(entry, 0)
        d0 = exact_d(entry[None], jnp.ones((1,), bool))[0]
        pool_code = jnp.full((ef,), -1, jnp.int32).at[0].set(
            pack_id_expanded(entry.astype(jnp.int32), jnp.zeros((), bool)))
        pool_d = jnp.full((ef,), INF).at[0].set(d0)
        aq_i = jnp.full((aq_width,), SENTINEL, jnp.int32)
        aq_d = jnp.full((aq_width,), INF)

        def body(state, _):
            pool_d, pool_code, aq_d, aq_i = state
            if "topk" in skip:
                sel_pos = jnp.arange(xw)
                sel_valid = jnp.ones((xw,), bool)
            else:
                unexp = jnp.where((pool_code & 1) == 1, INF, pool_d)
                neg_best, sel_pos = jax.lax.top_k(-unexp, xw)
                sel_valid = -neg_best < INF
            pool_code = pool_code.at[sel_pos].set(pool_code[sel_pos] | 1,
                                                  unique_indices=True)
            sel_ids = pool_code[sel_pos] >> 1

            safe = jnp.clip(sel_ids, 0, n - 1)
            rows = neighbors[safe]
            blocks = nbr_sketch[safe]
            nbr_ids = rows.reshape(em)
            nbr_valid = (sel_valid[:, None].repeat(m, axis=1).reshape(em)
                         & (nbr_ids != SENTINEL))
            if blocks.dtype == jnp.int8:
                # int8-row layout: one convert replaces the word unpack.
                raw = blocks.reshape(em, -1).astype(jnp.float32)
                d_approx = proj_ops.sketch_distance_calibrated(
                    qs1, raw, metric, scale, dim)
            elif "sketchdist" in skip:
                if "unpack" in skip:
                    raw = None
                else:
                    raw = proj_ops.unpack_raw(blocks.reshape(em, -1))
                d_approx = nbr_ids.astype(jnp.float32) * 1e-7
                if raw is not None:
                    d_approx = d_approx + 0.0 * raw[:, 0]
            elif "unpack" in skip:
                # same gather bytes, no shift/mask unpack: bitcast the packed
                # words to f32 (values are wrong; cost shape is right)
                raw = jax.lax.bitcast_convert_type(
                    blocks.reshape(em, -1), jnp.float32)
                raw = jnp.tile(raw, (1, 4))[:, : qs1.shape[0]]
                d_approx = proj_ops.sketch_distance_calibrated(
                    qs1, raw, metric, scale, dim)
            else:
                raw = proj_ops.unpack_raw(blocks.reshape(em, -1))
                d_approx = proj_ops.sketch_distance_calibrated(
                    qs1, raw, metric, scale, dim)
            d_approx = jnp.where(nbr_valid, d_approx, INF)
            nbr_ids = jnp.where(nbr_valid, nbr_ids, n)

            if "dedup" in skip:
                sorted_ids, d_sorted = nbr_ids, d_approx
                keep = sorted_ids < n
            else:
                sorted_ids, d_sorted = jax.lax.sort((nbr_ids, d_approx),
                                                    num_keys=1)
                prev = jnp.concatenate(
                    [jnp.full((1,), -2, sorted_ids.dtype), sorted_ids[:-1]])
                keep = (sorted_ids < n) & (sorted_ids != prev)
            if "visited" not in skip:
                keep = keep & _not_in_set(sorted_ids, aq_i)
                keep = keep & _not_in_set(sorted_ids, pool_code >> 1)
            new_ids = jnp.where(keep, sorted_ids, SENTINEL).astype(jnp.int32)
            new_d = jnp.where(keep, d_sorted, INF)

            if "aqmerge" in skip:
                mg_d = jnp.concatenate([aq_d, new_d])
                mg_i = jnp.concatenate([aq_i, new_ids])
            else:
                mg_d, mg_i = merge_sorted_with_new(aq_d, aq_i, new_d, new_ids)
            prom_ids = mg_i[:promote_width]
            prom_valid = mg_d[:promote_width] < INF
            aq_d = mg_d[promote_width:promote_width + aq_width]
            aq_i = mg_i[promote_width:promote_width + aq_width]

            if "exact" in skip:
                d_ex = jnp.where(prom_valid, mg_d[:promote_width], INF)
            else:
                d_ex = exact_d(jnp.where(prom_valid, prom_ids, 0), prom_valid)
            prom_code = pack_id_expanded(
                jnp.where(prom_valid, prom_ids, SENTINEL), ~prom_valid)
            if "poolmerge" in skip:
                pass
            else:
                all_d, all_code = merge_sorted_with_new(pool_d, pool_code,
                                                        d_ex, prom_code)
                pool_d, pool_code = all_d[:ef], all_code[:ef]
            return (pool_d, pool_code, aq_d, aq_i), None

        state = (pool_d, pool_code, aq_d, aq_i)
        (pool_d, pool_code, _, _), _ = jax.lax.scan(body, state, None,
                                                    length=mi)
        return pool_d, pool_code >> 1

    @functools.partial(jax.jit,
                       static_argnames=("skip", "route", "sketch_src"))
    def run(ctx, qp_, qs_, *, skip, route, sketch_src="packed"):
        (xp, neighbors, nbr_sketch, node_sketch,
         routing, entries_global, scale, nbr_i8) = ctx
        if route == "prod":
            entries = route_entries(qs_, routing, node_sketch, metric)
        elif route == "mm":
            entries = route_mm(qs_, node_sketch, routing)
        else:
            entries = entries_global
        blocks_src = nbr_i8 if sketch_src == "int8" else nbr_sketch
        return jax.vmap(
            lambda q1, s1, e: search_one(q1, s1, e, xp, neighbors,
                                         blocks_src, scale, skip=skip)
        )(qp_, qs_, entries)

    variants = [
        ("full", frozenset(), "prod"),
        ("int8_rows", frozenset(), "prod"),
        ("no_routing", frozenset(), "global"),
        ("routing_mm", frozenset(), "mm"),
        ("no_sketchdist", frozenset({"sketchdist"}), "prod"),
        ("no_sketchdist_unpack", frozenset({"sketchdist", "unpack"}), "prod"),
        ("no_exact", frozenset({"exact"}), "prod"),
        ("no_dedup", frozenset({"dedup"}), "prod"),
        ("no_visited", frozenset({"visited"}), "prod"),
        ("no_aqmerge", frozenset({"aqmerge"}), "prod"),
        ("no_poolmerge", frozenset({"poolmerge"}), "prod"),
        ("no_topk", frozenset({"topk"}), "prod"),
        ("sorts_only",
         frozenset({"sketchdist", "unpack", "exact", "visited"}), "prod"),
        ("gathers_only",
         frozenset({"dedup", "aqmerge", "poolmerge", "topk", "visited"}),
         "prod"),
    ]
    results = {}
    out_rows = []
    for name, skip, route in variants:
        src = "int8" if name == "int8_rows" else "packed"
        d, ids = run(ctx_a, qp_a, qs_a, skip=skip, route=route,
                     sketch_src=src)
        jax.block_until_ready((d, ids))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            d, ids = run(ctx_a, qp_a, qs_a, skip=skip, route=route,
                         sketch_src=src)
            jax.block_until_ready((d, ids))
        dt = (time.perf_counter() - t0) / reps
        rec = None
        if name in ("full", "int8_rows", "no_routing", "routing_mm"):
            ids_np = np.asarray(ids)[:, :10]
            rec = float(np.mean([
                len(set(ids_np[i].tolist()) & set(gt[i].tolist())) / 10.0
                for i in range(nq)
            ]))
        results[name] = dt
        row = {
            "variant": name, "s_per_batch": round(dt, 4),
            "qps": round(nq / dt, 1),
            **({"recall_at_10": round(rec, 4)} if rec is not None else {}),
            **({"delta_vs_full_ms": round((results["full"] - dt) * 1e3, 2)}
               if "full" in results and name != "full" else {}),
        }
        out_rows.append(row)
        print(json.dumps(row), flush=True)

    out = pathlib.Path(__file__).resolve().parent.parent / "BENCH_SKETCH_ABLATE.json"
    out.write_text(json.dumps(out_rows, indent=1))


if __name__ == "__main__":
    main()
