"""islands-tpu: a TPU-native codebase-indexing and vector-search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of panbanda/islands
(reference surveyed in SURVEY.md), designed TPU-first:

Core engine (`islands_tpu.core`):
- Wave-batched proximity-graph construction with high-degree-preserving +
  RNG-diversity pruning (the reference builds one node at a time on CPU,
  src/core/leann.rs:560-631).
- Fixed-width batched best-first search with scatter-free visited handling
  (reference: heap+hashset loop, src/core/leann.rs:899-988).
- Product quantization (vmapped k-means++/Lloyd on the MXU) and two-level
  PQ-gated search with on-the-fly embedding recomputation — the combination
  the reference specifies but never wires (docs/leann-specification.md).
- Multi-layer HNSW with stored embeddings, Searcher/MultiIndexSearcher API.
- Tagged-chunk on-disk format: true-CSR graph + PQ codebook/codes.

Models (`islands_tpu.models`): pure-JAX BERT-family encoders (bf16 on the
MXU), text encoder with static length buckets, and the encoder-backed
embedding provider that fuses recompute into the search loop.

Host layers: indexer service (native C++ data loader, chunking, persistence,
workspaces, sync), git providers (GitHub/GitLab/Bitbucket/Gitea), MCP stdio
server, RAG agent, CLI.

Parallel (`islands_tpu.parallel`): sharded "archipelago" index over a
jax.sharding.Mesh — per-shard construction and search with all-gather top-k
merges over ICI.
"""

__version__ = "0.1.0"

from islands_tpu.core.config import (
    DistanceMetric,
    HnswConfig,
    LeannConfig,
    PQConfig,
    SearchConfig,
)
from islands_tpu.core.csr import CsrGraph

__all__ = [
    "CsrGraph",
    "DistanceMetric",
    "HnswConfig",
    "LeannConfig",
    "PQConfig",
    "SearchConfig",
    "__version__",
]


def __getattr__(name):
    """Lazy heavyweight imports: `islands_tpu.LeannIndex` etc. without paying
    model/indexer import costs at package import."""
    lazy = {
        "LeannIndex": ("islands_tpu.core.leann", "LeannIndex"),
        "HnswIndex": ("islands_tpu.core.hnsw", "HnswIndex"),
        "ProductQuantizer": ("islands_tpu.core.pq", "ProductQuantizer"),
        "StoredSearcher": ("islands_tpu.core.search", "StoredSearcher"),
        "InMemoryEmbeddingProvider": (
            "islands_tpu.core.embedding", "InMemoryEmbeddingProvider"
        ),
        "save_index": ("islands_tpu.core.storage", "save_index"),
        "load_index": ("islands_tpu.core.storage", "load_index"),
        "IndexerService": ("islands_tpu.indexer.service", "IndexerService"),
        "TextEncoder": ("islands_tpu.models.encoder", "TextEncoder"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'islands_tpu' has no attribute {name!r}")
