"""Text encoder facade: tokenization, length bucketing, batched TPU forward.

Reference surface: `EmbedderProvider` / `CandleEmbedder`
(src/core/embedding/provider.rs:39-277, candle_provider.rs:104-507) — model
presets with dimensions, `embed_texts` / `embed_texts_raw`, probed dimension,
mean pooling + L2 normalize. Cloud/ONNX backends (provider.rs:76-102) have no
TPU referent and are represented by the deterministic `HashEmbedder` (the
device-free stand-in, like the reference's test providers).

TPU-native differences:
- padding goes to static length BUCKETS (one XLA compilation per bucket, no
  per-batch dynamic shapes; the reference pads each batch to its own max,
  candle_provider.rs:374-402, which would retrace under jit);
- batches run through one jitted forward; no Mutex serialization
  (candle_provider.rs:212-225 serializes all inference).
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from islands_tpu.models import bert as bert_mod
from islands_tpu.models import modernbert as modernbert_mod

Array = jax.Array


class ModelArchitecture(str, enum.Enum):
    """Embedder architecture families (reference enum:
    src/core/embedding/provider.rs:39-73). BERT and ModernBERT have full
    on-TPU forward implementations (models/bert.py, models/modernbert.py);
    the remaining families are recognized (config surface parity) but raise
    until an implementation lands — the reference likewise only routes
    Bert/Jina through its Candle path and errors elsewhere."""

    BERT = "bert"
    MODERNBERT = "modernbert"
    JINA_BERT = "jina-bert"
    CLIP = "clip"
    COLBERT = "colbert"
    COLPALI = "colpali"
    SPLADE = "splade"

    @staticmethod
    def detect(name: str) -> "ModelArchitecture":
        """Name-based detection (reference: provider.rs name matching).
        `name` is a model id/path string; defaults to BERT like the
        reference's fallback."""
        n = name.lower()
        for pat, arch in (
            ("modernbert", ModelArchitecture.MODERNBERT),
            ("colpali", ModelArchitecture.COLPALI),
            ("colbert", ModelArchitecture.COLBERT),
            ("splade", ModelArchitecture.SPLADE),
            ("clip", ModelArchitecture.CLIP),
            ("jina", ModelArchitecture.JINA_BERT),
        ):
            if pat in n:
                return arch
        return ModelArchitecture.BERT


IMPLEMENTED_ARCHITECTURES = frozenset(
    {ModelArchitecture.BERT, ModelArchitecture.MODERNBERT}
)

#: Model presets: name -> (config factory, embedding dimension)
#: (reference presets: provider.rs:260-277, candle_provider.rs:41-117)
PRESETS = {
    "minilm-l6": (bert_mod.BertConfig.minilm_l6, 384),
    "minilm-l12": (bert_mod.BertConfig.minilm_l12, 384),
    "bge-small": (bert_mod.BertConfig.bge_small, 384),
    "bge-base": (bert_mod.BertConfig.bge_base, 768),
    "bge-large": (bert_mod.BertConfig.bge_large, 1024),
    "tiny-test": (bert_mod.BertConfig.tiny_test, 64),
    "modernbert-base": (modernbert_mod.ModernBertConfig.modernbert_base, 768),
    "modernbert-large": (modernbert_mod.ModernBertConfig.modernbert_large, 1024),
    "modernbert-tiny-test": (modernbert_mod.ModernBertConfig.tiny_test, 64),
}

#: Static sequence-length buckets (max matches the reference's
#: max_seq_length=256, Cargo.toml:40).
DEFAULT_BUCKETS = (32, 64, 128, 256)


class SimpleTokenizer:
    """Deterministic hash tokenizer: lowercase whitespace/punct split, token
    -> stable hash bucket in [reserved, vocab). No external files — the
    test/bench tokenizer (a real deployment points TextEncoder at a local HF
    tokenizer)."""

    CLS, SEP, PAD = 101, 102, 0
    _RESERVED = 999

    def __init__(self, vocab_size: int = 30522):
        self.vocab_size = vocab_size

    def _token_id(self, token: str) -> int:
        h = int.from_bytes(hashlib.md5(token.encode()).digest()[:4], "little")
        return self._RESERVED + h % (self.vocab_size - self._RESERVED)

    def encode(self, text: str, max_length: int) -> list[int]:
        out = [self.CLS]
        word = []
        for ch in text.lower():
            if ch.isalnum():
                word.append(ch)
            else:
                if word:
                    out.append(self._token_id("".join(word)))
                    word = []
                if not ch.isspace() and ch != "":
                    out.append(self._token_id(ch))
            if len(out) >= max_length - 1:
                break
        if word and len(out) < max_length - 1:
            out.append(self._token_id("".join(word)))
        out.append(self.SEP)
        return out[:max_length]


class HfTokenizer:
    """Local HuggingFace tokenizer wrapper (zero-egress: path only)."""

    def __init__(self, path: str | Path):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(str(path), local_files_only=True)
        self.vocab_size = self._tok.vocab_size

    def encode(self, text: str, max_length: int) -> list[int]:
        return self._tok.encode(text, truncation=True, max_length=max_length)


@dataclasses.dataclass
class EncoderConfig:
    """Encoding-behavior knobs (reference TextEmbedConfig surface,
    provider.rs:104-199): batch size, max length, normalization, chunking."""

    max_seq_length: int = 256
    batch_size: int = 64
    normalize: bool = True
    buckets: tuple[int, ...] = DEFAULT_BUCKETS


class TextEncoder:
    """Batched sentence encoder on TPU.

    `TextEncoder.from_preset("minilm-l6")` gives a random-init model (tests,
    benches); `TextEncoder.from_pretrained(path)` loads local HF weights.
    """

    def __init__(
        self,
        params: dict,
        model_config,
        tokenizer=None,
        config: EncoderConfig | None = None,
    ):
        self.params = params
        self.model_config = model_config
        # Architecture dispatch on the config type (BertConfig vs
        # ModernBertConfig) — the reference's ModelArchitecture routing
        # (provider.rs:39-73) resolved at construction.
        arch = (modernbert_mod
                if isinstance(model_config, modernbert_mod.ModernBertConfig)
                else bert_mod)
        self.architecture = (ModelArchitecture.MODERNBERT
                             if arch is modernbert_mod else ModelArchitecture.BERT)
        self.config = config or EncoderConfig()
        self.tokenizer = tokenizer or SimpleTokenizer(model_config.vocab_size)
        self.config = dataclasses.replace(
            self.config,
            max_seq_length=min(
                self.config.max_seq_length, model_config.max_position_embeddings
            ),
            buckets=tuple(
                b for b in self.config.buckets
                if b <= model_config.max_position_embeddings
            ) or (model_config.max_position_embeddings,),
        )
        self._jitted = jax.jit(
            lambda ids, mask: arch.encode(
                self.params, ids, mask, self.model_config, self.config.normalize
            )
        )

    # -- constructors ------------------------------------------------------

    @staticmethod
    def from_preset(
        name: str, seed: int = 0, config: EncoderConfig | None = None
    ) -> "TextEncoder":
        if name not in PRESETS:
            raise ValueError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
        factory, _ = PRESETS[name]
        mc = factory()
        mod = (modernbert_mod
               if isinstance(mc, modernbert_mod.ModernBertConfig) else bert_mod)
        return TextEncoder(mod.init_params(mc, seed), mc, config=config)

    @staticmethod
    def from_pretrained(
        path: str | Path, config: EncoderConfig | None = None
    ) -> "TextEncoder":
        """Load a local HF checkpoint directory; the architecture comes from
        config.json's model_type (falling back to path-name detection —
        reference: provider.rs:39-73). Unimplemented architectures raise."""
        path = Path(path)
        model_type = ""
        cfg_path = path / "config.json"
        if cfg_path.exists():
            model_type = json.loads(cfg_path.read_text()).get("model_type", "")
        arch = ModelArchitecture.detect(model_type or str(path))
        if arch not in IMPLEMENTED_ARCHITECTURES:
            raise NotImplementedError(
                f"architecture {arch.value!r} is recognized but has no TPU "
                f"forward yet; implemented: "
                f"{sorted(a.value for a in IMPLEMENTED_ARCHITECTURES)}"
            )
        mod = modernbert_mod if arch is ModelArchitecture.MODERNBERT else bert_mod
        params, mc = mod.load_hf_checkpoint(path)
        try:
            tok = HfTokenizer(path)
        except Exception:  # weights-only checkpoint dir: deterministic fallback
            tok = SimpleTokenizer(mc.vocab_size)
        return TextEncoder(params, mc, tokenizer=tok, config=config)

    # -- properties --------------------------------------------------------

    @property
    def dimension(self) -> int:
        """Embedding dimension. The reference probes this by embedding "test"
        (provider.rs:422-443); here it is the architecture's hidden size."""
        return self.model_config.hidden_size

    # -- tokenization ------------------------------------------------------

    def _bucket_for(self, length: int) -> int:
        for b in self.config.buckets:
            if length <= b:
                return b
        return self.config.buckets[-1]

    def tokenize(
        self, texts: list[str], pad_to: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Encode + pad a batch to a static bucket length. Returns
        (ids [B, L], mask [B, L]) int32."""
        seqs = [self.tokenizer.encode(t, self.config.max_seq_length) for t in texts]
        max_len = max((len(s) for s in seqs), default=1)
        L = pad_to or self._bucket_for(max_len)
        ids = np.zeros((len(texts), L), dtype=np.int32)
        mask = np.zeros((len(texts), L), dtype=np.int32)
        for i, s in enumerate(seqs):
            s = s[:L]
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return ids, mask

    # -- encoding ----------------------------------------------------------

    def encode_tokens(self, ids: Array, mask: Array) -> Array:
        return self._jitted(jnp.asarray(ids), jnp.asarray(mask))

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        """Batch-encode texts -> [n, dim] float32 (reference:
        embed_texts_raw, provider.rs:312-359). Batches are grouped by length
        bucket to avoid padding waste, then re-ordered to input order."""
        if not texts:
            return np.zeros((0, self.dimension), dtype=np.float32)
        seqs = [self.tokenizer.encode(t, self.config.max_seq_length) for t in texts]
        order = sorted(range(len(texts)), key=lambda i: len(seqs[i]))
        out = np.zeros((len(texts), self.dimension), dtype=np.float32)
        bs = self.config.batch_size
        for s in range(0, len(order), bs):
            idxs = order[s : s + bs]
            bucket = self._bucket_for(max(len(seqs[i]) for i in idxs))
            ids = np.zeros((len(idxs), bucket), dtype=np.int32)
            mask = np.zeros((len(idxs), bucket), dtype=np.int32)
            for row, i in enumerate(idxs):
                sq = seqs[i][:bucket]
                ids[row, : len(sq)] = sq
                mask[row, : len(sq)] = 1
            # Pad the batch dim to the full batch size for a single jit shape.
            if len(idxs) < bs:
                pad = bs - len(idxs)
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
                mask[len(idxs):, 0] = 1  # avoid all-zero mask rows
            emb = np.asarray(self.encode_tokens(ids, mask))
            out[idxs] = emb[: len(idxs)]
        return out

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]


class HashEmbedder:
    """Deterministic text -> vector embedder with no model at all: stable
    feature hashing + L2 norm. Fills the role of the reference's cloud/test
    embedding backends (provider.rs:76-102) in a zero-egress environment and
    keeps indexer/MCP tests device-free."""

    def __init__(self, dimension: int = 384, seed: int = 0):
        self._dimension = dimension
        self._seed = seed

    @property
    def dimension(self) -> int:
        return self._dimension

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self._dimension), dtype=np.float32)
        for i, t in enumerate(texts):
            for word in t.lower().split():
                h = hashlib.md5(f"{self._seed}:{word}".encode()).digest()
                idx = int.from_bytes(h[:4], "little") % self._dimension
                sign = 1.0 if h[4] % 2 == 0 else -1.0
                out[i, idx] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]
