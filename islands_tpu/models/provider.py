"""Encoder-backed embedding provider: the id -> text -> embedding bridge.

The reference declares `impl EmbeddingProvider for EmbedderProvider` but it
*intentionally errors* ("requires text lookup... Use
EmbeddingProviderWithStorage", src/core/embedding/provider.rs:450-472) — the
id->text bridge is never implemented. This module implements it the TPU way:
texts are tokenized ONCE into a device-resident [N, L] token table, and the
provider's `batch_fn` is `ids -> encoder(tokens[ids])` — a pure jittable
function, so LEANN's per-hop recompute fuses into the search loop with no
host round-trip (SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from islands_tpu.models import bert as bert_mod
from islands_tpu.models.encoder import TextEncoder

Array = jax.Array


def _encoder_embed(ctx, ids: Array, *, config, normalize: bool) -> Array:
    """Static embed_fn: ctx = (params, token_ids, token_mask). Gathers token
    rows and runs the BERT forward — the recompute stage fused into search."""
    params, token_ids, token_mask = ctx
    n = max(token_ids.shape[0], 1)
    safe = jnp.clip(ids, 0, n - 1)
    return bert_mod.encode(params, token_ids[safe], token_mask[safe], config, normalize)


class EncoderEmbeddingProvider:
    """EmbeddingProvider over (encoder, token table).

    `from_texts` tokenizes the corpus up front (host, once) and keeps only
    int32 token ids on device — for the reference's MiniLM max_seq_length 256
    that is 1 KB/chunk, still far below storing d-dim float embeddings, and
    it is what makes recompute-at-search-time possible on-device.
    """

    def __init__(self, encoder: TextEncoder, token_ids: Array, token_mask: Array):
        self.encoder = encoder
        self.token_ids = jnp.asarray(token_ids, dtype=jnp.int32)
        self.token_mask = jnp.asarray(token_mask, dtype=jnp.int32)
        self._n = int(self.token_ids.shape[0])
        # per-instance stable partial over hashable config -> shared jit cache
        self._embed_fn = functools.partial(
            _encoder_embed,
            config=encoder.model_config,
            normalize=encoder.config.normalize,
        )

    @property
    def embed_fn(self):
        return self._embed_fn

    @property
    def embed_ctx(self):
        return (self.encoder.params, self.token_ids, self.token_mask)

    @staticmethod
    def from_texts(
        encoder: TextEncoder, texts: list[str], pad_to: int | None = None
    ) -> "EncoderEmbeddingProvider":
        L = pad_to or encoder.config.max_seq_length
        ids, mask = encoder.tokenize(texts, pad_to=L)
        return EncoderEmbeddingProvider(encoder, ids, mask)

    @property
    def dimension(self) -> int:
        return self.encoder.dimension

    @property
    def num_items(self) -> int:
        return self._n

    def batch_fn(self):
        """Jittable ids -> [E, d]: gather token rows, run the encoder."""
        token_ids = self.token_ids
        token_mask = self.token_mask
        params = self.encoder.params
        mc = self.encoder.model_config
        normalize = self.encoder.config.normalize
        n = max(self._n, 1)

        def fn(ids: Array) -> Array:
            safe = jnp.clip(ids, 0, n - 1)
            return bert_mod.encode(
                params, token_ids[safe], token_mask[safe], mc, normalize
            )

        return fn

    def compute_embedding(self, item_id: int) -> np.ndarray:
        return np.asarray(self.batch_fn()(jnp.asarray([item_id], jnp.int32))[0])

    def compute_embeddings_batch(self, ids) -> np.ndarray:
        return np.asarray(self.batch_fn()(jnp.asarray(ids, jnp.int32)))
