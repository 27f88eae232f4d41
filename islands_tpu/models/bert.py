"""Pure-JAX BERT-family encoder for on-TPU embedding (re)computation.

Reference behavior: the Candle BERT path (src/core/embedding/
candle_provider.rs:353-507) — tokenize, pad, BERT forward, attention-mask-
weighted mean pooling, optional L2 normalization. The reference serializes all
inference behind a Mutex (candle_provider.rs:212-225); here the forward pass
is a jitted function — batched, bfloat16 on the MXU, and trivially
data-parallel over a mesh axis.

TPU-native shape choices:
- encoder layers run under `lax.scan` over stacked parameters (one compiled
  layer body regardless of depth);
- matmuls in bfloat16 with f32 accumulation (`preferred_element_type`);
- layernorm/softmax statistics in f32;
- static sequence-length buckets (padding happens host-side in encoder.py).

Weights load from a local HuggingFace checkpoint directory (safetensors or
torch .bin) — the reference downloads from HF Hub (candle_provider.rs:243-301)
but this environment is zero-egress, so loading is path-based; random init
serves tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Architecture hyperparameters (HF bert config.json subset)."""

    vocab_size: int = 30522
    hidden_size: int = 384
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # compute dtype for matmuls; params stay f32
    dtype: str = "bfloat16"
    # Attention inner layout (all mathematically identical; perf knob for
    # the HBM-bandwidth-bound small-hidden models, BENCH_ENCODER.json):
    #   "slice" — q/k/v as [B, L, H, D] slices of the fused qkv output
    #             (round-4 baseline);
    #   "fold"  — "slice" + softmax normalization folded into the tiny
    #             [B, L, H, D] context output: the probs tensor is written
    #             once as unnormalized exp and never re-written, saving one
    #             full read+write pass over the [B, H, L, L] score tensor
    #             per layer;
    #   "dtl"   — "fold" + q/k materialized as [B, H, D, L] (minor dim L
    #             is lane-sized, so the transpose writes are physically
    #             unpadded; the [B, L, H, D] view's (H, D) minor tile pads
    #             ~5x at head_dim 32 — fact 9).
    #   "onepass" — "dtl" + the softmax DENOMINATOR rides the PV matmul:
    #             a ones-row is appended to v along head_dim, so
    #             sum_k exp(s-smax) falls out of the same contraction as
    #             context. exp(s-smax) then has a SINGLE consumer, letting
    #             XLA fuse it into the dot's operand read — the probs
    #             tensor (the layer's largest, [B, H, L, L]) never
    #             materializes in HBM: 1 write + 2 reads of the score
    #             tensor per layer vs fold's 2 writes + 4 reads.
    attn_impl: str = "slice"

    @staticmethod
    def minilm_l6() -> "BertConfig":
        """all-MiniLM-L6-v2 (reference preset: candle_provider.rs:41-117, 384-d).

        attn_impl="dtl": at head_dim 32 the [B, L, H, D] q/k views tile-pad
        ~5x, so the lane-sized [B, H, D, L] layout wins the measured
        head-to-head (BENCH_ENCODER.json attn_impl_sweep: 33.2% vs 32.5%
        MFU at batch 64; a wash at batch 1024 where the score tensor
        dominates traffic). bge-base (head_dim 64) measured a wash — it
        keeps the default."""
        return BertConfig(attn_impl="dtl")

    @staticmethod
    def minilm_l12() -> "BertConfig":
        return BertConfig(num_hidden_layers=12)

    @staticmethod
    def bge_small() -> "BertConfig":
        """bge-small-en-v1.5 (384-d, 12 layers)."""
        return BertConfig(hidden_size=384, num_hidden_layers=12, intermediate_size=1536)

    @staticmethod
    def bge_base() -> "BertConfig":
        """bge-base-en-v1.5 (768-d)."""
        return BertConfig(hidden_size=768, num_hidden_layers=12,
                          num_attention_heads=12, intermediate_size=3072)

    @staticmethod
    def bge_large() -> "BertConfig":
        """bge-large-en-v1.5 (1024-d)."""
        return BertConfig(hidden_size=1024, num_hidden_layers=24,
                          num_attention_heads=16, intermediate_size=4096)

    @staticmethod
    def tiny_test() -> "BertConfig":
        """Small config for tests (fast compile, deterministic)."""
        return BertConfig(vocab_size=1024, hidden_size=64, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=128,
                          max_position_embeddings=128, dtype="float32")

    @staticmethod
    def from_json(path: str | Path) -> "BertConfig":
        raw = json.loads(Path(path).read_text())
        return BertConfig(
            vocab_size=raw.get("vocab_size", 30522),
            hidden_size=raw.get("hidden_size", 384),
            num_hidden_layers=raw.get("num_hidden_layers", 6),
            num_attention_heads=raw.get("num_attention_heads", 12),
            intermediate_size=raw.get("intermediate_size", 1536),
            max_position_embeddings=raw.get("max_position_embeddings", 512),
            type_vocab_size=raw.get("type_vocab_size", 2),
            layer_norm_eps=raw.get("layer_norm_eps", 1e-12),
            pad_token_id=raw.get("pad_token_id", 0),
        )


def init_params(config: BertConfig, seed: int = 0) -> dict:
    """Random-init parameter pytree. Layer params are stacked on axis 0
    ([L, ...]) for `lax.scan`."""
    rng = np.random.default_rng(seed)
    h, i, L = config.hidden_size, config.intermediate_size, config.num_hidden_layers

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    def zeros(*shape):
        return jnp.zeros(shape, jnp.float32)

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    return {
        "embeddings": {
            "word": w(config.vocab_size, h),
            "position": w(config.max_position_embeddings, h),
            "token_type": w(config.type_vocab_size, h),
            "ln_scale": ones(h),
            "ln_bias": zeros(h),
        },
        "layers": {
            # q/k/v fused into one [h, 3h] projection: one large MXU matmul
            # per layer instead of three h x h ones.
            "qkv_w": w(L, h, 3 * h), "qkv_b": zeros(L, 3 * h),
            "o_w": w(L, h, h), "o_b": zeros(L, h),
            "attn_ln_scale": ones(L, h), "attn_ln_bias": zeros(L, h),
            "ffn_in_w": w(L, h, i), "ffn_in_b": zeros(L, i),
            "ffn_out_w": w(L, i, h), "ffn_out_b": zeros(L, h),
            "ffn_ln_scale": ones(L, h), "ffn_ln_bias": zeros(L, h),
        },
    }


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def bert_forward(
    params: dict,
    input_ids: Array,
    attention_mask: Array,
    config: BertConfig,
) -> Array:
    """[B, L] int32 ids + [B, L] mask -> hidden states [B, L, H]."""
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    emb = params["embeddings"]
    b, slen = input_ids.shape
    h = config.hidden_size
    nh = config.num_attention_heads
    hd = h // nh
    eps = config.layer_norm_eps

    x = (
        emb["word"][input_ids]
        + emb["position"][:slen][None, :, :]
        + emb["token_type"][0][None, None, :]
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], eps).astype(dtype)

    # Additive mask: 0 for real tokens, -1e9 for padding — in the compute
    # dtype, so the bias add never forces the [B, H, L, L] score tensor up
    # to f32 in HBM (exp(-1e9 - max) underflows to exactly 0 in f32, same
    # as -inf; -1e9 is exactly representable in bf16).
    attn_bias = jnp.where(
        attention_mask[:, None, None, :] > 0, 0.0, -1e9
    ).astype(dtype)

    def dense(v, wname, bname, lp):
        return (
            jnp.dot(v, lp[wname], preferred_element_type=jnp.float32)
            + lp[bname]
        ).astype(dtype)

    # One-time bf16 cast of the scan-carried weight matrices: casting inside
    # the layer body re-reads every matrix from HBM in f32 each layer (2x the
    # weight bandwidth). LN params and biases stay f32 (added post-matmul in
    # f32 accumulation).
    layers = {
        k_: (v_.astype(dtype) if k_.endswith("_w") else v_)
        for k_, v_ in params["layers"].items()
    }

    inv_sqrt_hd = np.float32(1.0 / np.sqrt(hd))

    def layer_body(carry, lp):
        x = carry
        qkv = dense(x, "qkv_w", "qkv_b", lp)
        # HBM-bandwidth layout (round-4 minilm fix; the encoder is
        # bandwidth-bound at hidden=384, BENCH_ENCODER round 3):
        # - q/k/v are contiguous SLICES of the qkv output reshaped
        #   [B, L, H, D] — no 5-D transpose materializing head-major
        #   tensors whose 32-wide minor dim tile-pads 4x (fact 9);
        # - scores/probs live in HBM as bf16 (halves the two largest
        #   per-layer tensors); softmax statistics still run in f32
        #   inside one fused kernel (upcast + reduce + downcast fuse);
        # - the PV einsum writes [B, L, H, D] and reshapes straight to
        #   [B, L, H*D] (a contiguous merge) for the output projection.
        if config.attn_impl in ("dtl", "onepass"):
            v = jnp.einsum(
                "blhd->bhdl", qkv[..., 2 * h :].reshape(b, slen, nh, hd))
        else:
            v = qkv[..., 2 * h :].reshape(b, slen, nh, hd)
        if config.attn_impl in ("dtl", "onepass"):
            # q/k land in HBM as [B, H, D, L]: minor dim L is lane-sized,
            # so the materialized transposes are physically unpadded
            # (the [B, L, H, D] view tile-pads (H, D) ~5x at head_dim 32).
            q = jnp.einsum("blhd->bhdl", qkv[..., :h].reshape(b, slen, nh, hd))
            k = jnp.einsum(
                "blhd->bhdl", qkv[..., h : 2 * h].reshape(b, slen, nh, hd))
            scores = jnp.einsum(
                "bhdq,bhdk->bhqk", q, k, preferred_element_type=jnp.float32)
        else:
            q = qkv[..., :h].reshape(b, slen, nh, hd)
            k = qkv[..., h : 2 * h].reshape(b, slen, nh, hd)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = (scores * inv_sqrt_hd).astype(dtype) + attn_bias
        if config.attn_impl == "onepass":
            # The denominator rides the PV matmul: a ones-row appended to v
            # along head_dim makes sum_k exp(s - smax) fall out of the same
            # contraction as the context, so probs has a SINGLE consumer —
            # one read of the layer's largest tensor instead of fold's two
            # (denom einsum + PV). Statistics stay f32; the ones-row is
            # exact in bf16, so denom == fold's f32-accumulated row sum.
            s32 = scores.astype(jnp.float32)
            smax = jnp.max(s32, axis=-1, keepdims=True)
            probs = jnp.exp(s32 - smax).astype(dtype)
            ones = jnp.ones((b, nh, 1, slen), dtype)
            v_aug = jnp.concatenate([v, ones], axis=2)  # [B, H, D+1, L]
            ctx = jnp.einsum("bhqk,bhdk->bqhd", probs, v_aug,
                             preferred_element_type=jnp.float32)
            ctx = (ctx[..., :hd] / ctx[..., hd:hd + 1]).astype(dtype)
        elif config.attn_impl in ("fold", "dtl"):
            # Folded softmax: write the [B, H, L, L] probs tensor ONCE as
            # unnormalized exp(s - max) and divide by the row sum at the
            # tiny [B, L, H, D] context output instead — one fewer full
            # read+write pass over the layer's largest tensor. Statistics
            # stay f32; identical math to jax.nn.softmax.
            s32 = scores.astype(jnp.float32)
            smax = jnp.max(s32, axis=-1, keepdims=True)
            probs = jnp.exp(s32 - smax).astype(dtype)
            denom = jnp.einsum("bhqk->bhq", probs.astype(jnp.float32))
            pv = "bhqk,bhdk->bqhd" if config.attn_impl == "dtl" else \
                 "bhqk,bkhd->bqhd"
            ctx = jnp.einsum(pv, probs, v, preferred_element_type=jnp.float32)
            ctx = ctx / jnp.einsum("bhq->bqh", denom)[..., None]
            ctx = ctx.astype(dtype)
        else:
            probs = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1).astype(dtype)
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
            ).astype(dtype)
        ctx = ctx.reshape(b, slen, h)
        attn_out = dense(ctx, "o_w", "o_b", lp)
        x = _layer_norm(x + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"], eps)
        ff = jax.nn.gelu(dense(x, "ffn_in_w", "ffn_in_b", lp), approximate=False)
        ff = dense(ff, "ffn_out_w", "ffn_out_b", lp)
        x = _layer_norm(x + ff, lp["ffn_ln_scale"], lp["ffn_ln_bias"], eps)
        return x, None

    x, _ = jax.lax.scan(layer_body, x, layers)
    return x.astype(jnp.float32)


def mean_pool_normalize(
    hidden: Array, attention_mask: Array, normalize: bool = True
) -> Array:
    """Attention-mask-weighted mean pooling + optional L2 norm (reference:
    candle_provider.rs:434-488)."""
    mask = attention_mask.astype(jnp.float32)[:, :, None]
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    pooled = summed / counts
    if normalize:
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        pooled = pooled / jnp.maximum(norm, 1e-12)
    return pooled


def encode(
    params: dict,
    input_ids: Array,
    attention_mask: Array,
    config: BertConfig,
    normalize: bool = True,
) -> Array:
    """ids + mask -> sentence embeddings [B, H]."""
    hidden = bert_forward(params, input_ids, attention_mask, config)
    return mean_pool_normalize(hidden, attention_mask, normalize)


# ---------------------------------------------------------------------------
# HF checkpoint loading (local path; zero-egress environment)
# ---------------------------------------------------------------------------

_HF_LAYER_KEYS = {
    "o_w": "attention.output.dense.weight", "o_b": "attention.output.dense.bias",
    "attn_ln_scale": "attention.output.LayerNorm.weight",
    "attn_ln_bias": "attention.output.LayerNorm.bias",
    "ffn_in_w": "intermediate.dense.weight", "ffn_in_b": "intermediate.dense.bias",
    "ffn_out_w": "output.dense.weight", "ffn_out_b": "output.dense.bias",
    "ffn_ln_scale": "output.LayerNorm.weight", "ffn_ln_bias": "output.LayerNorm.bias",
}


def load_hf_checkpoint(path: str | Path) -> tuple[dict, BertConfig]:
    """Load a BERT checkpoint from a local HF model directory
    (model.safetensors or pytorch_model.bin + config.json). Dense weights
    are transposed to [in, out] for right-multiplication."""
    path = Path(path)
    config = BertConfig.from_json(path / "config.json")
    st = path / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        raw = load_file(str(st))
    else:
        import torch

        raw = {
            k: v.numpy()
            for k, v in torch.load(
                path / "pytorch_model.bin", map_location="cpu", weights_only=True
            ).items()
        }
    raw = {k.removeprefix("bert."): v for k, v in raw.items()}

    def get(name):
        return jnp.asarray(np.asarray(raw[name], dtype=np.float32))

    params = {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln_scale": get("embeddings.LayerNorm.weight"),
            "ln_bias": get("embeddings.LayerNorm.bias"),
        },
        "layers": {},
    }
    L = config.num_hidden_layers
    for ours, theirs in _HF_LAYER_KEYS.items():
        mats = [get(f"encoder.layer.{i}.{theirs}") for i in range(L)]
        stacked = jnp.stack(mats)
        if ours.endswith("_w"):
            stacked = stacked.transpose(0, 2, 1)  # HF stores [out, in]
        params["layers"][ours] = stacked
    # HF's separate q/k/v projections fuse into one [in, 3*out] matmul
    # (column blocks ordered q, k, v — bert_forward splits on that order).
    qkv_w, qkv_b = [], []
    for i in range(L):
        base = f"encoder.layer.{i}.attention.self"
        qkv_w.append(jnp.concatenate(
            [get(f"{base}.{p}.weight").T for p in ("query", "key", "value")],
            axis=1))
        qkv_b.append(jnp.concatenate(
            [get(f"{base}.{p}.bias") for p in ("query", "key", "value")]))
    params["layers"]["qkv_w"] = jnp.stack(qkv_w)
    params["layers"]["qkv_b"] = jnp.stack(qkv_b)
    return params, config
