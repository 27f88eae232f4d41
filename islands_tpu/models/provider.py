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
    """Static embed_fn: ctx = (params, token_ids, token_mask, center).
    Gathers token rows and runs the BERT forward — the recompute stage fused
    into search. `center` is subtracted from the pooled output (zeros when
    centering is off): transformer sentence embeddings are anisotropic (a
    shared dominant component compresses cosine contrast — measured 0.985
    mean pairwise sim on a random-init MiniLM, with same/cross-cluster
    separation recovered from 0.992/0.985 to 0.48/-0.03 by mean-centering);
    callers enable it via with_center()."""
    params, token_ids, token_mask, center = ctx
    n = max(token_ids.shape[0], 1)
    safe = jnp.clip(ids, 0, n - 1)
    emb = bert_mod.encode(
        params, token_ids[safe], token_mask[safe], config, normalize
    )
    return emb - center


class EncoderEmbeddingProvider:
    """EmbeddingProvider over (encoder, token table).

    `from_texts` tokenizes the corpus up front (host, once) and keeps only
    int32 token ids on device — for the reference's MiniLM max_seq_length 256
    that is 1 KB/chunk, still far below storing d-dim float embeddings, and
    it is what makes recompute-at-search-time possible on-device.
    """

    def __init__(
        self,
        encoder: TextEncoder,
        token_ids: Array,
        token_mask: Array,
        center: Array | None = None,
    ):
        self.encoder = encoder
        self.token_ids = jnp.asarray(token_ids, dtype=jnp.int32)
        self.token_mask = jnp.asarray(token_mask, dtype=jnp.int32)
        self._n = int(self.token_ids.shape[0])
        self.center = (
            jnp.asarray(center, jnp.float32)
            if center is not None
            else jnp.zeros((encoder.dimension,), jnp.float32)
        )
        # Centered providers skip the in-encode L2 norm: centering must act
        # on the raw pooled output, and the metric prep (prep_corpus)
        # re-normalizes for cosine.
        self._centered = center is not None
        # per-instance stable partial over hashable config -> shared jit cache
        self._embed_fn = functools.partial(
            _encoder_embed,
            config=encoder.model_config,
            normalize=encoder.config.normalize and not self._centered,
        )

    def with_center(self, sample: int = 8192, batch: int = 256) -> "EncoderEmbeddingProvider":
        """Provider with the corpus-mean subtracted from every embedding —
        the standard anisotropy correction (see _encoder_embed). The mean is
        computed over the raw (un-normalized) pooled outputs of up to
        `sample` items."""
        n = max(self._n, 1)
        take = min(sample, n)
        fn = functools.partial(
            _encoder_embed,
            config=self.encoder.model_config,
            normalize=False,
        )
        zeros = jnp.zeros((self.encoder.dimension,), jnp.float32)
        ctx = (self.encoder.params, self.token_ids, self.token_mask, zeros)
        acc = jnp.zeros((self.encoder.dimension,), jnp.float32)
        for s in range(0, take, batch):
            ids = jnp.arange(s, min(s + batch, take), dtype=jnp.int32)
            acc = acc + jnp.sum(fn(ctx, ids), axis=0)
        return EncoderEmbeddingProvider(
            self.encoder, self.token_ids, self.token_mask, center=acc / take
        )

    @property
    def embed_fn(self):
        return self._embed_fn

    @property
    def embed_ctx(self):
        return (self.encoder.params, self.token_ids, self.token_mask, self.center)

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
        embed_fn = self._embed_fn
        ctx = self.embed_ctx

        def fn(ids: Array) -> Array:
            return embed_fn(ctx, jnp.asarray(ids, jnp.int32))

        return fn

    def compute_embedding(self, item_id: int) -> np.ndarray:
        return np.asarray(self.batch_fn()(jnp.asarray([item_id], jnp.int32))[0])

    def compute_embeddings_batch(self, ids) -> np.ndarray:
        return np.asarray(self.batch_fn()(jnp.asarray(ids, jnp.int32)))
