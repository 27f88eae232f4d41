"""islands-tpu: a TPU-native vector index-and-query engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of panbanda/islands'
LEANN core (reference: /root/reference, surveyed in SURVEY.md):

- HNSW-style proximity-graph construction with high-degree-preserving pruning,
  reformulated as a wave-batched device pipeline (reference builds one node at a
  time on CPU: src/core/leann.rs:560-631).
- Query-time search as fixed-width batched best-first traversal with masked
  early exit (reference: heap+hashset loop, src/core/leann.rs:899-988).
- Product quantization with ADC tables gating exact recompute-and-rerank
  (reference: src/core/pq.rs; spec Algorithm 2 in docs/leann-specification.md).
- On-the-fly embedding recomputation by an on-device encoder (reference:
  src/core/embedding/candle_provider.rs), preserving LEANN's O(n*M) graph-only
  storage.
- Sharded "archipelago" search over a jax.sharding.Mesh for multi-million-chunk
  corpora (new; reference is single-process).
"""

__version__ = "0.1.0"

from islands_tpu.core.config import (
    DistanceMetric,
    LeannConfig,
    PQConfig,
    SearchConfig,
)
from islands_tpu.core.csr import CsrGraph

__all__ = [
    "CsrGraph",
    "DistanceMetric",
    "LeannConfig",
    "PQConfig",
    "SearchConfig",
    "__version__",
]
