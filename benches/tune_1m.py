"""1M operating-point exploration (round 3): query batch size, promote
width, and recall-margin levers (sketch_dims / sketch_pool_mult) on the
real chip. One process so executables load once.

    /opt/venv/bin/python benches/tune_1m.py A     # batch/promote sweep
    /opt/venv/bin/python benches/tune_1m.py B     # sketch_dims=48 build
    /opt/venv/bin/python benches/tune_1m.py C     # pool_mult=3 build
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run(tag, dims, efc, mult, wave=4096, refine=0, slack=None):
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from bench import make_bench_corpus
    from islands_tpu.core.build import build_index_with_sketch
    from islands_tpu.core.config import DistanceMetric, LeannConfig
    from islands_tpu.core.search import StoredSearcher
    from islands_tpu.ops import distance as dist_ops

    n, dim, nq = 1_000_000, 128, 4096
    metric = DistanceMetric.EUCLIDEAN
    kw = {} if slack is None else {"reverse_slack": slack}
    cfg = LeannConfig(metric=metric, wave_size=wave, sketch_dims=dims,
                      ef_construction=efc, sketch_pool_mult=mult,
                      refine_passes=refine, **kw)
    x, queries = make_bench_corpus(n, dim, nq)

    # Ground truth first (before build state occupies HBM) and cached on
    # disk — identical corpus across A/B/C/D runs.
    gt_path = pathlib.Path(f"/tmp/gt_{n}_{dim}_{nq}.npy")
    if gt_path.exists():
        true_ids = np.load(gt_path)
    else:
        _, true_ids = dist_ops.brute_force_topk(queries, x, 10, metric,
                                                batch=65536)
        true_ids = np.asarray(true_ids)
        np.save(gt_path, true_ids)

    t0 = time.perf_counter()
    graph, sketch = build_index_with_sketch(x, cfg)
    jax.block_until_ready(graph.neighbors)
    build_s = time.perf_counter() - t0
    print(f"[{tag}] build {build_s:.1f}s ({n / build_s:.0f} vec/s)",
          file=sys.stderr, flush=True)
    searcher = StoredSearcher(graph, x, metric, sketch=sketch)

    def recall_of(ids):
        return float(np.mean([
            len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10.0
            for i in range(ids.shape[0])
        ]))

    out = {"tag": tag, "dims": dims, "efc": efc, "mult": mult,
           "wave": wave, "refine": refine, "build_s": round(build_s, 1)}

    def measure(ef, batch, promote=None, label=None, max_iters=None,
                expand=4):
        # CLAUDE.md fact 28: compiling promote_width > 96 on this stack hung
        # the compile and wedged the single shared chip's claim for hours.
        assert promote is None or promote <= 96, (
            f"promote_width={promote} > 96 wedges the TPU (fact 28)")
        label = label or (
            f"ef{ef}_b{batch}" + (f"_p{promote}" if promote else "")
            + (f"_i{max_iters}" if max_iters else "")
            + (f"_x{expand}" if expand != 4 else "")
        )
        ids_all = []
        for s in range(0, nq, batch):
            _, ids = searcher.search(queries[s:s + batch], k=10, ef=ef,
                                     expand_width=expand, gate="sketch",
                                     promote_width=promote,
                                     max_iters=max_iters)
            ids_all.append(np.asarray(ids))
        rec = recall_of(np.concatenate(ids_all))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            for s in range(0, nq, batch):
                d, i = searcher.search(queries[s:s + batch], k=10, ef=ef,
                                       expand_width=expand, gate="sketch",
                                       promote_width=promote,
                                       max_iters=max_iters)
            jax.block_until_ready((d, i))
        qps = nq / ((time.perf_counter() - t0) / reps)
        out[label] = {"recall": round(rec, 4), "qps": round(qps, 0)}
        print(f"[{tag}] {label}: recall {rec:.4f}, {qps:.0f} QPS",
              file=sys.stderr, flush=True)

    if tag == "A":
        for batch in (1024, 2048, 4096):
            measure(32, batch)
        measure(32, 2048, promote=16)
        measure(32, 2048, promote=48)
        measure(24, 2048)
        measure(48, 2048)
    elif tag == "E":
        # Iteration-bound hypothesis (facts: ef24 == ef32 QPS at default
        # max_iters=40): sweep the iteration cap and expansion width.
        measure(32, 4096)                      # baseline i40
        for mi in (32, 28, 24, 20):
            measure(32, 4096, max_iters=mi)
        measure(32, 4096, max_iters=24, expand=6)
        measure(32, 4096, max_iters=20, expand=8)
        measure(32, 4096, max_iters=28, promote=48)
    elif tag == "F":
        # dims=48 fidelity (fact 16: OOMs at wave 4096; wave 2048 here):
        # if higher-fidelity sketches hold recall at low ef/iters, the
        # ef24-ish rungs unlock 30k+ QPS above the .9 gate.
        measure(32, 4096, max_iters=24)        # vs dims=32: .9183 @ 29.3k
        measure(32, 4096, max_iters=28)        # vs dims=32: .9253 @ 26.4k
        measure(24, 4096, max_iters=24)
        measure(24, 4096, max_iters=20)
        measure(32, 4096)                      # uncapped fidelity ceiling
        measure(32, 4096, max_iters=28, promote=48)  # margin point
    elif tag == "H":
        # Routing density: more entry candidates shorten the approach, so
        # capped-iteration rungs should gain recall on the SAME graph
        # (unrefined baseline: i24 .9183 @ 29.3k, i20 .8986 @ 33.3k).
        for rsize in (4096, 16384):
            searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                      routing_size=rsize)
            measure(32, 4096, max_iters=24, label=f"r{rsize}_i24")
            measure(32, 4096, max_iters=20, label=f"r{rsize}_i20")
            measure(32, 4096, max_iters=16, label=f"r{rsize}_i16")
    elif tag == "J":
        # Routing density, round 3 (I: r65536/i16 .9099 @ 37.9k over the
        # gate; i14 .8909 @ 41.5k under). Does 13%-of-corpus routing push
        # i14 over? [4096, 131072] f32 routing transient = 2 GB.
        searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                  routing_size=131072)
        for mi in (16, 14, 12):
            measure(32, 4096, max_iters=mi, label=f"r131072_i{mi}")
    elif tag == "L":
        # Wider promote at the lowest caps (i14 is .8919 at p32/r65536):
        # more exact work per hop may buy the missing recall cheaper than
        # two more hops would.
        searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                  routing_size=65536)
        for p, mi in ((40, 14), (48, 14), (40, 16), (48, 16)):
            measure(32, 4096, promote=p, max_iters=mi,
                    label=f"p{p}_r65536_i{mi}")
    elif tag == "M":
        # Promote is ~QPS-free (block gathers amortize, fact 7); iterations
        # are the expensive unit (L: p48/i14 .9388 @ 37.9k). How low can the
        # cap go with a wide promote?
        searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                  routing_size=65536)
        for p, mi in ((64, 12), (96, 12), (64, 10), (96, 10), (64, 14)):
            measure(32, 4096, promote=p, max_iters=mi,
                    label=f"p{p}_r65536_i{mi}")
    elif tag == "N":
        # Floor-hunting (M: p64/i10 .9381 @ 41k; p96/i10 .9684 @ 35.7k).
        searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                  routing_size=65536)
        # (128, 8)/(128, 10) dropped: promote_width > 96 wedges the chip
        # (fact 28; measure() now also guards this).
        for p, mi in ((64, 8), (96, 8), (96, 6)):
            measure(32, 4096, promote=p, max_iters=mi,
                    label=f"p{p}_r65536_i{mi}")
    elif tag == "K":
        # Narrow pool at dense routing: ef=24 trims the per-hop pool-merge
        # sort width. Baselines: ef32/r65536/i16 .9099 @ 38.5k.
        searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                  routing_size=65536)
        for ef, mi in ((24, 20), (24, 18), (24, 16), (32, 18)):
            measure(ef, 4096, max_iters=mi, label=f"ef{ef}_r65536_i{mi}")
    elif tag == "I":
        # Routing density, round 2 (H: r16384/i20 .9216 @ 33.3k;
        # r16384/i16 .8967 @ 38.4k just under the gate).
        for rsize, iters in ((32768, (20, 16, 14)), (65536, (16, 14))):
            searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                      routing_size=rsize)
            for mi in iters:
                measure(32, 4096, max_iters=mi, label=f"r{rsize}_i{mi}")
    elif tag == "G":
        # refine_passes=1 graph: does the Vamana-style second pass buy
        # recall at the capped operating points (unrefined: i24 .9183,
        # i20 .8986)?
        measure(32, 4096, max_iters=24)
        measure(32, 4096, max_iters=20)
        measure(24, 4096, max_iters=20)
        measure(32, 4096)                      # uncapped ceiling
        measure(32, 4096, max_iters=28, promote=48)  # margin point
    elif tag == "O":
        # dims=48 at 1M WITHOUT the OOM (VERDICT r3 #7 / fact 16): the
        # build peak scales with buffer width bw = m0 + reverse_slack, so
        # slack 60 -> 20 puts the nbr_sketch at 80*48 = 3840 B/vec — the
        # same footprint as the proven dims=32/bw=120 config. Decision
        # rung: if ef32/i16 gains >= .01 recall over dims=32 (.9099) at
        # equal QPS, adopt; else record the negative result in design.md.
        # (Smaller slack also means fewer reverse-edge slots between
        # repairs, so recall deltas mix sketch fidelity with graph quality
        # — the uncapped rung separates them: fidelity-limited configs
        # converge to the same ceiling, graph-limited ones don't.)
        searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                  routing_size=65536)
        measure(32, 4096, max_iters=16, label="r65536_i16")
        measure(32, 4096, max_iters=14, label="r65536_i14")
        measure(32, 4096, promote=64, max_iters=10, label="p64_r65536_i10")
        measure(32, 4096, label="uncapped")
    elif tag == "P":
        # Lower-cap frontier on the ADOPTED dims=48/slack=20 build (tag O:
        # p64/i10 = .9847 @ 42.0k — .085 of gate margin to spend). Same
        # wide-promote/low-cap asymmetry as fact 28; promote stays <= 96
        # (fact 28 compile wedge).
        searcher = StoredSearcher(graph, x, metric, sketch=sketch,
                                  routing_size=65536)
        measure(32, 4096, promote=64, max_iters=8, label="p64_i8")
        measure(32, 4096, promote=64, max_iters=6, label="p64_i6")
        measure(32, 4096, promote=96, max_iters=8, label="p96_i8")
        measure(32, 4096, promote=48, max_iters=8, label="p48_i8")
        measure(32, 4096, promote=64, max_iters=12, label="p64_i12")
    else:
        measure(32, 2048)
        measure(24, 2048)
        measure(32, 2048, promote=16)
    print(json.dumps(out))


if __name__ == "__main__":
    tag = sys.argv[1] if len(sys.argv) > 1 else "A"
    cfgs = {"A": (32, 64, 2, 4096, 0), "B": (48, 64, 2, 4096, 0),
            "C": (32, 64, 3, 4096, 0), "D": (48, 64, 3, 4096, 0),
            "E": (32, 64, 2, 4096, 0), "F": (48, 64, 2, 2048, 0),
            "G": (32, 64, 2, 4096, 1), "H": (32, 64, 2, 4096, 0),
            "I": (32, 64, 2, 4096, 0), "J": (32, 64, 2, 4096, 0),
            "K": (32, 64, 2, 4096, 0), "L": (32, 64, 2, 4096, 0),
            "M": (32, 64, 2, 4096, 0), "N": (32, 64, 2, 4096, 0),
            "O": (48, 64, 2, 4096, 0, 20), "P": (48, 64, 2, 4096, 0, 20)}
    spec = cfgs[tag]
    run(tag, *spec)
