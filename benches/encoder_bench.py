"""Encoder throughput + MFU on the real chip (VERDICT r2 item 5).

Measures `models/bert.py` tokens/s across batch sizes for minilm-l6 and
bge-base at seq 256, reports model FLOPs utilization against the v5e
bf16 peak (197 TFLOP/s), steady-state timed by chaining dependent
iterations inside one jit (CLAUDE.md fact #11).

Reference boundary being measured: the Candle forward pass the reference
serializes behind a Mutex (src/core/embedding/candle_provider.rs:212-225,
353-507).

    /opt/venv/bin/python benches/encoder_bench.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

V5E_PEAK_BF16 = 197e12


def model_flops_per_token(cfg, seq):
    """Forward-pass FLOPs per token (2*MACs): QKVO + attention + FFN."""
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    per_layer = (
        2 * 4 * h * h          # q, k, v, o projections
        + 2 * 2 * seq * h      # scores (q·k) + context (p·v), per query token
        + 2 * 2 * h * i        # ffn in + out
    )
    return L * per_layer


def modernbert_flops_per_token(cfg, seq):
    """ModernBERT forward FLOPs per token: QKVO + attention + GeGLU FFN
    (wi projects to 2*intermediate). Attention is counted DENSE for every
    layer — models/modernbert.py computes full [L, L] scores and applies
    the sliding window as an additive bias, so this is the arithmetic the
    chip actually executes."""
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    per_layer = (
        2 * 4 * h * h          # qkv (3hh) + o (hh)
        + 2 * 2 * seq * h      # scores + context
        + 2 * 3 * h * i        # wi (h x 2i) + wo (i x h)
    )
    return L * per_layer


def bench_config(name, cfg, seq, batches, reps=3, chains=(4, 20),
                 module=None, flops_fn=model_flops_per_token):
    import functools

    import jax
    import jax.numpy as jnp

    if module is None:
        from islands_tpu.models import bert as bert_mod
    else:
        bert_mod = module

    params = bert_mod.init_params(cfg, seed=0)
    rows = []
    for b in batches:
        rng = np.random.default_rng(b)
        ids = jnp.asarray(
            rng.integers(1, cfg.vocab_size, size=(b, seq)), jnp.int32)
        mask = jnp.ones((b, seq), jnp.int32)

        @functools.partial(jax.jit, static_argnames="length")
        def chained(params, ids, mask, length):
            # Chain data-dependent forwards inside one executable so device
            # time dominates tunnel dispatch (CLAUDE.md fact #11). The
            # carried token shift is zero at runtime but NOT provably zero
            # at compile time (f32 embedding values scaled below int32
            # resolution), so XLA cannot hoist or elide iterations.
            def body(c, _):
                emb = bert_mod.encode(params, c, mask, cfg)
                shift = (emb[:, :1] * 1e-12).astype(jnp.int32)
                return c + shift, emb[:, 0]
            c, outs = jax.lax.scan(body, ids, None, length=length)
            return outs

        def timed(length):
            # Sync via host transfer: through the axon tunnel
            # block_until_ready can return before the executable finishes
            # (measured: chain length had zero wall-clock effect); copying
            # the tiny [chain, b] output to numpy is a true barrier.
            np.asarray(chained(params, ids, mask, length=length))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(chained(params, ids, mask, length=length))
                best = min(best, time.perf_counter() - t0)
            return best

        # Differential timing: per-forward cost from the slope between two
        # chain lengths cancels the constant per-dispatch tunnel overhead.
        t_short, t_long = timed(chains[0]), timed(chains[1])
        dt = (t_long - t_short) / (chains[1] - chains[0])
        toks = b * seq
        fpt = flops_fn(cfg, seq)
        mfu = toks * fpt / dt / V5E_PEAK_BF16
        row = {"model": name, "batch": b, "seq": seq,
               "tokens_per_s": round(toks / dt, 0),
               "texts_per_s": round(b / dt, 1),
               "ms_per_batch": round(dt * 1e3, 2),
               "mfu": round(mfu, 4)}
        rows.append(row)
        print(f"{name} b={b}: {toks/dt/1e6:.2f}M tok/s, "
              f"{b/dt:.0f} texts/s, MFU {mfu:.1%}", file=sys.stderr, flush=True)
    return rows


def main():
    import dataclasses

    from islands_tpu.models.bert import BertConfig
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    seq = 256
    out = {"seq": seq, "peak_flops": V5E_PEAK_BF16, "rows": []}
    if len(sys.argv) > 1 and sys.argv[1] == "variants":
        # Attention-layout sweep (BertConfig.attn_impl docstring): minilm is
        # HBM-bandwidth-bound on the [B, H, L, L] score tensor, so the
        # folded-softmax / unpadded-transpose variants are measured head to
        # head here before one becomes the default.
        base = BertConfig.minilm_l6()
        for impl in ("slice", "fold", "dtl", "onepass"):
            cfg = dataclasses.replace(base, attn_impl=impl)
            out["rows"] += bench_config(f"minilm-l6[{impl}]", cfg, seq,
                                        (64, 1024))
        bge = BertConfig.bge_base()
        for impl in ("slice", "fold"):
            cfg = dataclasses.replace(bge, attn_impl=impl)
            out["rows"] += bench_config(f"bge-base[{impl}]", cfg, seq, (64,))
    elif len(sys.argv) > 1 and sys.argv[1] == "modernbert":
        # Second embedder architecture (provider.rs:39-73): rotary +
        # alternating global/local attention + GeGLU, models/modernbert.py.
        from islands_tpu.models import modernbert as mb

        out["rows"] += bench_config(
            "modernbert-base", mb.ModernBertConfig.modernbert_base(), seq,
            (64,), module=mb, flops_fn=modernbert_flops_per_token)
    else:
        out["rows"] += bench_config("minilm-l6", BertConfig.minilm_l6(), seq,
                                    (64, 256, 1024))
        out["rows"] += bench_config("bge-base", BertConfig.bge_base(), seq,
                                    (64, 256, 512))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
