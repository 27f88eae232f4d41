"""Encoder throughput / MFU measurement (VERDICT r2 #5).

Measures tokens/s of the jitted BERT forward (models/bert.py) on the real
chip across batch sizes at seq=256 (the reference's max_seq_length,
Cargo.toml:40), for minilm-l6 and bge-base, and reports model FLOPs
utilization against the v5e bf16 peak (197 TFLOP/s).

The reference's Candle path serializes all inference behind a Mutex
(candle_provider.rs:212-225) on CPU/GPU; this is the boundary recompute
mode is bound by (BENCH_EXTRA config 1/3), so the ratio here is the
recompute-mode headroom.

Run on the chip: /opt/venv/bin/python benches/encoder_bench.py
"""

import json
import sys
import time

import numpy as np

V5E_BF16_PEAK = 197e12


def model_flops_per_token(h: int, i: int, seq: int, layers: int) -> float:
    """Matmul FLOPs per token per forward: QKV+O projections (8h^2), FFN
    (4hi), attention scores+context (4h*seq); embeddings/layernorm ignored
    (<1%)."""
    return layers * (8.0 * h * h + 4.0 * h * i + 4.0 * h * seq)


def main():
    from islands_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from islands_tpu.models import bert as bert_mod

    seq = 256
    results = []
    for preset in ("minilm-l6", "bge-base"):
        cfg = getattr(bert_mod.BertConfig, preset.replace("-", "_"))()
        params = bert_mod.init_params(cfg, seed=0)
        fpt = model_flops_per_token(
            cfg.hidden_size, cfg.intermediate_size, seq, cfg.num_hidden_layers
        )

        fwd = jax.jit(
            lambda p, ids, mask: bert_mod.mean_pool_normalize(
                bert_mod.bert_forward(p, ids, mask, cfg), mask
            )
        )
        rng = np.random.default_rng(0)
        for batch in (32, 64, 128, 256, 512):
            ids = jnp.asarray(
                rng.integers(1000, 20000, size=(batch, seq)), dtype=jnp.int32
            )
            mask = jnp.ones((batch, seq), dtype=jnp.int32)
            jax.block_until_ready(fwd(params, ids, mask))  # compile/load
            # Steady state: chain reps with varied inputs (constant-folding
            # guard, CLAUDE.md fact #5).
            reps = 20
            t0 = time.perf_counter()
            out = None
            for r in range(reps):
                out = fwd(params, jnp.roll(ids, r, axis=0), mask)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            tok_s = batch * seq * reps / dt
            mfu = tok_s * fpt / V5E_BF16_PEAK
            row = {
                "preset": preset, "batch": batch, "seq": seq,
                "tokens_per_s": round(tok_s, 0),
                "texts_per_s": round(tok_s / seq, 1),
                "mfu_pct": round(100 * mfu, 1),
            }
            results.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
