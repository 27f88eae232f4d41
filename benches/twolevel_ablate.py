"""Config-4 per-hop cost ablation: which piece of the two-level hop loop
actually costs the time?

Round-4/5 refutations left a puzzle: ADC shrinking (4-bit PQ), rescore
thinning (end_rerank), ef-down, and promote-width are ALL flat or negative,
yet the hop machinery costs ~13 us/query/hop at 768-d vs ~1.8 us at the
128-d sketch gate (same widths ef aside). This script reimplements the
`_search_one_two_level` loop (core/search.py:674-823) locally with component
SWITCHES and times each variant at a FORCED iteration count (cond = it <
max_iters for every variant, so queue dynamics can't change the hop count)
on the identical built index:

  full        — faithful loop (timing baseline; recall sanity-checked)
  no_exact    — promotions enter the pool at ADC distances (no 768-d row
                fetch + score)
  no_adc      — approximate scorer replaced by a free function of ids
  no_dedup    — the id-sort + prev-compare dedup pass removed
  no_visited  — the two _not_in_set membership matrices removed
  no_aqmerge  — AQ bitonic merge replaced by concat+slice (no sort)
  no_poolmerge— pool merge replaced by slice (pool frozen after entry)
  no_topk     — expansion picks fixed pool slots instead of top_k

Setup is cached on disk (/tmp/c4_cache): index via core.storage.save_index,
corpus/queries/GT as .npy — first run pays the ~26 min build, every later
config-4 experiment loads in ~1 min. Run SOLO on the chip (CLAUDE.md fact
29). Reference semantics: spec Algorithm 2, leann.rs:899-988.
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CACHE = pathlib.Path("/tmp/c4_cache")


def get_setup(nq=4096):
    """(idx, x_np, q_np, gt_np) with a disk cache of the built index."""
    from bench_extra import _setup, config4_setup

    _setup()
    import jax.numpy as jnp  # noqa: F401

    from islands_tpu.core import storage
    from islands_tpu.core.leann import LeannIndex  # noqa: F401

    idx_p, x_p, q_p, gt_p = (CACHE / "index.leann", CACHE / "x.npy",
                             CACHE / "q.npy", CACHE / "gt.npy")
    if all(p.exists() for p in (idx_p, x_p, q_p, gt_p)):
        t0 = time.perf_counter()
        idx = storage.load_index(idx_p)
        x = np.load(x_p)
        q = np.load(q_p)
        gt = np.load(gt_p)
        print(f"[cache] loaded setup in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        return idx, x, q[:nq], gt[:nq]

    idx, provider, q, gt, build_s = config4_setup(nq=nq)
    x = np.asarray(provider.x) if hasattr(provider, "x") else None
    if x is None:  # InMemoryEmbeddingProvider stores the corpus
        x = np.asarray(provider.embed_ctx)
    CACHE.mkdir(parents=True, exist_ok=True)
    storage.save_index(idx, idx_p)
    np.save(x_p, x)
    np.save(q_p, q)
    np.save(gt_p, gt)
    print(f"[cache] built in {build_s:.1f}s and cached", file=sys.stderr,
          flush=True)
    return idx, x, q, gt


def main():
    import jax
    import jax.numpy as jnp

    from islands_tpu.core import pq as pq_mod
    from islands_tpu.core.config import DistanceMetric
    from islands_tpu.core.csr import SENTINEL
    from islands_tpu.core.search import _not_in_set, pack_id_expanded
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.ops.merge import merge_sorted_with_new

    metric = DistanceMetric.EUCLIDEAN
    idx, x_np, q_np, gt = get_setup()
    nq = q_np.shape[0]
    n = idx.num_nodes
    ef, aq_width, promote_width, xw, mi = 128, 128, 32, 2, 20

    xp = dist_ops.prep_corpus(jnp.asarray(x_np), metric)
    qp = dist_ops.prep_query(jnp.asarray(q_np), metric)
    neighbors = idx.graph.neighbors
    m = int(neighbors.shape[1])
    em = xw * m
    codes = idx.pq_codes
    nbr_codes = pq_mod.build_inline_codes(neighbors, codes)
    centroids = idx.pq.codebook.centroids
    prep_fn = pq_mod.gated_prep_for(metric)
    approx_scorer = pq_mod.gated_block_scorer_for(metric)

    # Routed entries computed ONCE outside the timed region (identical for
    # every variant; routing cost is known QPS-neutral, fact 26/34).
    from islands_tpu.core.search import route_entries_embed

    rng = np.random.default_rng(0)
    routing = jnp.asarray(rng.integers(0, n, size=65536), dtype=jnp.int32)

    def embed_fn(ctx, ids):
        return ctx[jnp.clip(ids, 0, ctx.shape[0] - 1)]

    entries = route_entries_embed(jnp.asarray(q_np), xp, routing,
                                  embed_fn=embed_fn, metric=metric)
    entries = jax.block_until_ready(entries)

    INF = jnp.float32(jnp.inf)

    def search_one(q1, tables, xp_, nbr_codes_, neighbors_, entry, *, skip):
        def exact_d(ids, valid):
            rows = xp_[jnp.clip(ids, 0, n - 1)]
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
            rows = neighbors_[safe]
            blocks = nbr_codes_[safe]
            nbr_ids = rows.reshape(em)
            nbr_valid = (sel_valid[:, None].repeat(m, axis=1).reshape(em)
                         & (nbr_ids != SENTINEL))
            if "adc" in skip:
                d_approx = nbr_ids.astype(jnp.float32) * 1e-7
                d_approx = jnp.where(nbr_valid, d_approx, INF)
            else:
                d_approx = approx_scorer(tables, blocks.reshape(em, -1),
                                         nbr_valid)
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
                pass  # pool frozen — isolates the pool merge cost
            else:
                all_d, all_code = merge_sorted_with_new(pool_d, pool_code,
                                                        d_ex, prom_code)
                pool_d, pool_code = all_d[:ef], all_code[:ef]
            return (pool_d, pool_code, aq_d, aq_i), None

        state = (pool_d, pool_code, aq_d, aq_i)
        # Forced fixed hop count: lax.scan (not while_loop) so every variant
        # executes exactly mi hops regardless of queue dynamics.
        (pool_d, pool_code, _, _), _ = jax.lax.scan(body, state, None,
                                                    length=mi)
        return pool_d, pool_code >> 1

    @functools.partial(jax.jit, static_argnames=("skip",))
    def run(qp_, tables, xp_, nbr_codes_, neighbors_, entries_, *, skip):
        return jax.vmap(
            lambda q1, t, e: search_one(q1, t, xp_, nbr_codes_, neighbors_,
                                        e, skip=skip)
        )(qp_, tables, entries_)

    tables = prep_fn(centroids, qp)

    variants = [
        ("full", frozenset()),
        ("no_exact", frozenset({"exact"})),
        ("no_adc", frozenset({"adc"})),
        ("no_dedup", frozenset({"dedup"})),
        ("no_visited", frozenset({"visited"})),
        ("no_aqmerge", frozenset({"aqmerge"})),
        ("no_poolmerge", frozenset({"poolmerge"})),
        ("no_topk", frozenset({"topk"})),
        ("sorts_only", frozenset({"adc", "exact", "visited"})),
        ("gathers_only", frozenset({"dedup", "aqmerge", "poolmerge", "topk",
                                    "visited"})),
    ]
    results = {}
    for name, skip in variants:
        d, ids = run(qp, tables, xp, nbr_codes, neighbors, entries, skip=skip)
        jax.block_until_ready((d, ids))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            d, ids = run(qp, tables, xp, nbr_codes, neighbors, entries,
                         skip=skip)
            jax.block_until_ready((d, ids))
        dt = (time.perf_counter() - t0) / reps
        rec = None
        if name == "full":
            ids_np = np.asarray(ids)[:, :10]
            rec = float(np.mean([
                len(set(ids_np[i].tolist()) & set(gt[i].tolist())) / 10.0
                for i in range(nq)
            ]))
        results[name] = dt
        print(json.dumps({
            "variant": name, "s_per_batch": round(dt, 4),
            "qps": round(nq / dt, 1),
            **({"recall_at_10": round(rec, 4)} if rec is not None else {}),
            **({"delta_vs_full_ms": round((results["full"] - dt) * 1e3, 1)}
               if "full" in results and name != "full" else {}),
        }), flush=True)


if __name__ == "__main__":
    main()
