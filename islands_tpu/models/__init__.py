"""On-TPU encoder models: BERT-family + ModernBERT sentence encoders and the
encoder-backed embedding provider (recompute fused into search)."""

from islands_tpu.models.bert import BertConfig, bert_forward, encode, init_params
from islands_tpu.models.encoder import (
    IMPLEMENTED_ARCHITECTURES,
    PRESETS,
    EncoderConfig,
    HashEmbedder,
    ModelArchitecture,
    SimpleTokenizer,
    TextEncoder,
)
from islands_tpu.models.modernbert import ModernBertConfig, modernbert_forward
from islands_tpu.models.provider import EncoderEmbeddingProvider

__all__ = [
    "BertConfig",
    "EncoderConfig",
    "EncoderEmbeddingProvider",
    "HashEmbedder",
    "IMPLEMENTED_ARCHITECTURES",
    "ModelArchitecture",
    "ModernBertConfig",
    "PRESETS",
    "SimpleTokenizer",
    "TextEncoder",
    "bert_forward",
    "encode",
    "init_params",
    "modernbert_forward",
]
