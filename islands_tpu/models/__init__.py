"""On-TPU encoder models: BERT-family sentence encoders and the
encoder-backed embedding provider (recompute fused into search)."""

from islands_tpu.models.bert import BertConfig, bert_forward, encode, init_params
from islands_tpu.models.encoder import (
    PRESETS,
    EncoderConfig,
    HashEmbedder,
    SimpleTokenizer,
    TextEncoder,
)
from islands_tpu.models.provider import EncoderEmbeddingProvider

__all__ = [
    "BertConfig",
    "EncoderConfig",
    "EncoderEmbeddingProvider",
    "HashEmbedder",
    "PRESETS",
    "SimpleTokenizer",
    "TextEncoder",
    "bert_forward",
    "encode",
    "init_params",
]
