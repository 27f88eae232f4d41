"""Pure-JAX ModernBERT encoder — the second embedder architecture.

Reference surface: `ModelArchitecture::ModernBert` in the embedding provider
(src/core/embedding/provider.rs:39-73) — the reference routes ModernBERT
checkpoints through the same Candle forward+pool pipeline as BERT
(candle_provider.rs:353-507). Architecture (answerdotai/ModernBERT):

- no position/token-type embeddings — rotary position embeddings (RoPE,
  rotate-half convention) applied to q/k inside attention;
- alternating attention: every `global_attn_every_n_layers`-th layer is
  GLOBAL (full attention, rope theta 160k); the rest are LOCAL (sliding
  window of +/- local_attention//2 tokens, rope theta 10k);
- pre-norm residual blocks, bias-free linears and layernorms; layer 0's
  attention norm is the identity (embeddings are already normed);
- gated MLP (GeGLU): Wi projects to 2*intermediate, `act(input) * gate`;
- final layernorm after the stack.

TPU-native shape choices (same discipline as models/bert.py):
- one `lax.scan` over stacked layer params; the global/local alternation is
  a per-layer FLAG in the scanned pytree selecting between two precomputed
  (cos, sin) tables and between the full and windowed attention bias — no
  Python branching per layer, one compiled layer body regardless of depth;
- matmuls in bfloat16 with f32 accumulation; layernorm/softmax/RoPE tables
  in f32; static shapes (bucketed lengths, encoder.py).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from islands_tpu.models.bert import _layer_norm, mean_pool_normalize

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ModernBertConfig:
    """Architecture hyperparameters (HF modernbert config.json subset)."""

    vocab_size: int = 50368
    hidden_size: int = 768
    num_hidden_layers: int = 22
    num_attention_heads: int = 12
    intermediate_size: int = 1152
    max_position_embeddings: int = 8192
    norm_eps: float = 1e-5
    pad_token_id: int = 50283
    global_rope_theta: float = 160000.0
    local_rope_theta: float = 10000.0
    local_attention: int = 128  # window = +/- local_attention // 2
    global_attn_every_n_layers: int = 3
    dtype: str = "bfloat16"

    @staticmethod
    def modernbert_base() -> "ModernBertConfig":
        """ModernBERT-base (768-d, 22 layers)."""
        return ModernBertConfig()

    @staticmethod
    def modernbert_large() -> "ModernBertConfig":
        """ModernBERT-large (1024-d, 28 layers)."""
        return ModernBertConfig(hidden_size=1024, num_hidden_layers=28,
                                num_attention_heads=16, intermediate_size=2624)

    @staticmethod
    def tiny_test() -> "ModernBertConfig":
        """Small config for tests (fast compile, deterministic). 4 layers so
        both global (0, 3) and local (1, 2) layers are exercised."""
        return ModernBertConfig(vocab_size=1024, hidden_size=64,
                                num_hidden_layers=4, num_attention_heads=4,
                                intermediate_size=96,
                                max_position_embeddings=128,
                                local_attention=16, pad_token_id=0,
                                dtype="float32")

    @staticmethod
    def from_json(path: str | Path) -> "ModernBertConfig":
        raw = json.loads(Path(path).read_text())
        d = ModernBertConfig()
        return ModernBertConfig(**{
            f.name: raw.get(f.name, getattr(d, f.name))
            for f in dataclasses.fields(ModernBertConfig) if f.name != "dtype"
        })


def init_params(config: ModernBertConfig, seed: int = 0) -> dict:
    """Random-init parameter pytree; layer params stacked on axis 0 for
    `lax.scan`. Layer 0's attn_ln_scale slot exists but is dead (the
    is_first flag selects the identity path)."""
    rng = np.random.default_rng(seed)
    h, i, L = config.hidden_size, config.intermediate_size, config.num_hidden_layers

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    return {
        "embeddings": {
            "word": w(config.vocab_size, h),
            "ln_scale": jnp.ones((h,), jnp.float32),
        },
        "layers": {
            "qkv_w": w(L, h, 3 * h),
            "o_w": w(L, h, h),
            "attn_ln_scale": jnp.ones((L, h), jnp.float32),
            "wi_w": w(L, h, 2 * i),
            "wo_w": w(L, i, h),
            "mlp_ln_scale": jnp.ones((L, h), jnp.float32),
        },
        "final_ln_scale": jnp.ones((h,), jnp.float32),
    }


def _rope_tables(slen: int, head_dim: int, theta: float) -> tuple[Array, Array]:
    """(cos, sin) [slen, head_dim] — duplicated-half layout (emb = cat(freqs,
    freqs)), matching HF's ModernBertRotaryEmbedding."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                                / head_dim))
    freqs = np.arange(slen, dtype=np.float64)[:, None] * inv_freq[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1).astype(np.float32)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x: Array) -> Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def modernbert_forward(
    params: dict,
    input_ids: Array,
    attention_mask: Array,
    config: ModernBertConfig,
) -> Array:
    """[B, L] int32 ids + [B, L] mask -> hidden states [B, L, H]."""
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    b, slen = input_ids.shape
    h = config.hidden_size
    nh = config.num_attention_heads
    hd = h // nh
    eps = config.norm_eps
    nl = config.num_hidden_layers

    x = params["embeddings"]["word"][input_ids]
    zeros_h = jnp.zeros((h,), jnp.float32)
    x = _layer_norm(x, params["embeddings"]["ln_scale"], zeros_h, eps)
    x = x.astype(dtype)

    # Additive biases (f32, downcast once): padding mask for every layer,
    # plus the sliding-window band for local layers.
    pad_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    pos = jnp.arange(slen)
    in_window = jnp.abs(pos[:, None] - pos[None, :]) <= config.local_attention // 2
    local_bias = (pad_bias + jnp.where(in_window, 0.0, -1e9)[None, None]).astype(dtype)
    pad_bias = pad_bias.astype(dtype)

    cos_g, sin_g = _rope_tables(slen, hd, config.global_rope_theta)
    cos_l, sin_l = _rope_tables(slen, hd, config.local_rope_theta)

    layer_ids = np.arange(nl)
    is_global = jnp.asarray(
        (layer_ids % config.global_attn_every_n_layers == 0).astype(np.float32))
    is_first = jnp.asarray((layer_ids == 0).astype(np.float32))

    layers = {
        k_: (v_.astype(dtype) if k_.endswith("_w") else v_)
        for k_, v_ in params["layers"].items()
    }
    layers = {**layers, "is_global": is_global, "is_first": is_first}

    inv_sqrt_hd = np.float32(1.0 / np.sqrt(hd))

    def layer_body(carry, lp):
        x = carry
        g = lp["is_global"]
        # Layer 0: identity attn norm (embeddings already normed).
        xn = _layer_norm(x, lp["attn_ln_scale"], zeros_h, eps)
        xn = (lp["is_first"] * x.astype(jnp.float32)
              + (1.0 - lp["is_first"]) * xn.astype(jnp.float32)).astype(dtype)

        qkv = jnp.dot(xn, lp["qkv_w"], preferred_element_type=jnp.float32)
        qkv = qkv.reshape(b, slen, 3, nh, hd)
        q = qkv[:, :, 0].astype(jnp.float32)
        k = qkv[:, :, 1].astype(jnp.float32)
        v = qkv[:, :, 2].astype(dtype)

        cos = g * cos_g + (1.0 - g) * cos_l  # [L, hd] f32
        sin = g * sin_g + (1.0 - g) * sin_l
        cos, sin = cos[None, :, None, :], sin[None, :, None, :]
        q = (q * cos + _rotate_half(q) * sin).astype(dtype)
        k = (k * cos + _rotate_half(k) * sin).astype(dtype)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        bias = g * pad_bias.astype(jnp.float32) \
            + (1.0 - g) * local_bias.astype(jnp.float32)
        scores = scores * inv_sqrt_hd + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)
        attn_out = jnp.dot(ctx.reshape(b, slen, h), lp["o_w"],
                           preferred_element_type=jnp.float32).astype(dtype)
        x = x + attn_out

        xn = _layer_norm(x, lp["mlp_ln_scale"], zeros_h, eps)
        wi = jnp.dot(xn, lp["wi_w"], preferred_element_type=jnp.float32)
        inner = wi.shape[-1] // 2
        gated = jax.nn.gelu(wi[..., :inner], approximate=False) * wi[..., inner:]
        ff = jnp.dot(gated.astype(dtype), lp["wo_w"],
                     preferred_element_type=jnp.float32).astype(dtype)
        x = x + ff
        return x, None

    x, _ = jax.lax.scan(layer_body, x, layers)
    x = _layer_norm(x.astype(jnp.float32), params["final_ln_scale"], zeros_h, eps)
    return x.astype(jnp.float32)


def encode(
    params: dict,
    input_ids: Array,
    attention_mask: Array,
    config: ModernBertConfig,
    normalize: bool = True,
) -> Array:
    """ids + mask -> sentence embeddings [B, H] (mask-weighted mean pool +
    optional L2 norm, same pipeline as BERT — candle_provider.rs:434-488)."""
    hidden = modernbert_forward(params, input_ids, attention_mask, config)
    return mean_pool_normalize(hidden, attention_mask, normalize)


# ---------------------------------------------------------------------------
# HF checkpoint loading (local path; zero-egress environment)
# ---------------------------------------------------------------------------


def load_hf_checkpoint(path: str | Path) -> tuple[dict, ModernBertConfig]:
    """Load a ModernBERT checkpoint from a local HF model directory
    (model.safetensors or pytorch_model.bin + config.json). Dense weights
    transpose to [in, out]; layer 0's missing attn_norm (Identity in HF)
    fills with ones (dead behind the is_first flag)."""
    path = Path(path)
    config = ModernBertConfig.from_json(path / "config.json")
    st = path / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        raw = load_file(str(st))
    else:
        import torch

        raw = {
            k: v.numpy()
            for k, v in torch.load(
                path / "pytorch_model.bin", map_location="cpu",
                weights_only=True,
            ).items()
        }
    raw = {k.removeprefix("model."): v for k, v in raw.items()}

    def get(name):
        return jnp.asarray(np.asarray(raw[name], dtype=np.float32))

    h = config.hidden_size
    L = config.num_hidden_layers
    ones_h = jnp.ones((h,), jnp.float32)

    def stack(fmt: str, transpose: bool) -> Array:
        mats = []
        for i in range(L):
            key = fmt.format(i=i)
            if key not in raw:  # layer 0 attn_norm is Identity
                mats.append(ones_h)
                continue
            m = get(key)
            mats.append(m.T if transpose else m)
        return jnp.stack(mats)

    params = {
        "embeddings": {
            "word": get("embeddings.tok_embeddings.weight"),
            "ln_scale": get("embeddings.norm.weight"),
        },
        "layers": {
            "qkv_w": stack("layers.{i}.attn.Wqkv.weight", True),
            "o_w": stack("layers.{i}.attn.Wo.weight", True),
            "attn_ln_scale": stack("layers.{i}.attn_norm.weight", False),
            "wi_w": stack("layers.{i}.mlp.Wi.weight", True),
            "wo_w": stack("layers.{i}.mlp.Wo.weight", True),
            "mlp_ln_scale": stack("layers.{i}.mlp_norm.weight", False),
        },
        "final_ln_scale": get("final_norm.weight"),
    }
    return params, config
