"""Where do config-4's remaining microseconds go? Production path (7.3k QPS)
vs the ablation's faithful reimplementation (23.6k "QPS") disagree 3.2x at
IDENTICAL math (recall .9353 both). Two suspects, measured here head to head
on the cached 1Mx768 setup:

  A. ablation timing sync: block_until_ready vs host-copy (fact 19 — block
     can return early through the axon tunnel);
  B. production per-call overheads the ablation excludes: host->device
     transfer of the [4096, 768] query batch (12.6 MB/call over the vsock
     tunnel), route_entries_embed, ADC tables prep, np.asarray of results.

Rows: production_host_np (the honest production number, c4_attack method);
production_device_in (queries pre-transferred + jnp results, still
host-copy synced via a tiny slice); ablate_full_block (block_until_ready,
reproduces the 23.6k artifact if early-return is real); ablate_full_copy
(same executable, synced by copying the [4096, 10] result to host).

Run SOLO on the chip (facts 29/32).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from twolevel_ablate import get_setup  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from islands_tpu.core import pq as pq_mod
    from islands_tpu.core.config import DistanceMetric
    from islands_tpu.core.embedding import InMemoryEmbeddingProvider
    from islands_tpu.core.search import (batched_two_level_search,
                                         make_recompute_scorer,
                                         route_entries_embed)
    from islands_tpu.ops import distance as dist_ops

    metric = DistanceMetric.EUCLIDEAN
    idx, x_np, q_np, gt = get_setup()
    nq = q_np.shape[0]
    provider = InMemoryEmbeddingProvider(x_np)
    rows = []

    def report(tag, dt, extra=None):
        row = {"tag": tag, "s_per_batch": round(dt, 4),
               "qps": round(nq / dt, 1), **(extra or {})}
        rows.append(row)
        print(json.dumps(row), flush=True)

    kw = dict(k=10, provider=provider, ef=128, rerank_ratio=0.25,
              max_iters=20, routing_size=65536, expand_width=2)

    # A) the honest production number (host numpy in and out, c4_attack
    #    method) — expect ~0.55 s/batch.
    idx.search_two_level(q_np, **kw)
    t0 = time.perf_counter()
    for _ in range(3):
        d, ids = idx.search_two_level(q_np, **kw)
    report("production_host_np", (time.perf_counter() - t0) / 3)

    # B) the same production device code with every per-call host cost
    #    stripped: queries prepped + transferred once, routing entries and
    #    ADC tables computed once, results left on device (synced by a
    #    host copy of one row — a true barrier on the output buffer).
    graph = idx.graph
    qp = jax.block_until_ready(
        dist_ops.prep_query(jnp.asarray(q_np), metric))
    exact = make_recompute_scorer(provider.embed_fn, metric)
    prep_fn = pq_mod.gated_prep_for(metric)
    scorer = pq_mod.gated_block_scorer_for(metric)
    nbr_codes = idx._inline_codes()
    entries = jax.block_until_ready(
        route_entries_embed(jnp.asarray(q_np), provider.embed_ctx,
                            idx._routing_sample(65536),
                            embed_fn=provider.embed_fn, metric=metric))

    def run_device():
        return batched_two_level_search(
            qp, provider.embed_ctx, nbr_codes,
            idx.pq.codebook.centroids, graph.neighbors, entries,
            exact_scorer=exact, approx_scorer=scorer, prep_fn=prep_fn,
            ef=128, aq_width=128, promote_width=32, expand_width=2,
            max_iters=20,
        )

    d, ids, ne = run_device()
    np.asarray(ids[:8])  # warm + barrier
    t0 = time.perf_counter()
    for _ in range(3):
        d, ids, ne = run_device()
        np.asarray(ids[:8])
    report("production_device_in_copy8", (time.perf_counter() - t0) / 3)

    # same but full [4096, 128] result pulled (bounds copy-out cost)
    t0 = time.perf_counter()
    for _ in range(3):
        d, ids, ne = run_device()
        np.asarray(ids)
    report("production_device_in_copyfull", (time.perf_counter() - t0) / 3)

    ids_np = np.asarray(ids)[:, :10]
    rec = float(np.mean([
        len(set(ids_np[i].tolist()) & set(gt[i].tolist())) / 10.0
        for i in range(nq)]))
    print(json.dumps({"device_in_recall": round(rec, 4)}), flush=True)

    # C) ablation-full timing artifact check: block_until_ready vs host copy
    #    on the IDENTICAL device function.
    d, ids, ne = run_device()
    jax.block_until_ready((d, ids))
    t0 = time.perf_counter()
    for _ in range(3):
        d, ids, ne = run_device()
        jax.block_until_ready((d, ids))
    report("production_device_in_block", (time.perf_counter() - t0) / 3,
           {"note": "if this beats copy8 materially, fact 19 early-return "
                    "is live for this executable and the ablation's 23.6k "
                    "was a timing artifact"})

    out = pathlib.Path(__file__).resolve().parent.parent / "BENCH_C4_GAP.json"
    out.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
