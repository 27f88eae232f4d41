"""Product quantization: batched k-means training, encoding, and ADC tables.

TPU-native reformulation of the reference's per-subspace scalar k-means
(src/core/pq.rs:175-218 train, :221-271 encode/decode, :275-348 asymmetric
distance + ADC tables, :362-463 standalone kmeans): every step is a batched
array op vmapped over the subquantizer axis —

- assignment is an [n, k] distance-matrix argmin (one MXU matmul per Lloyd
  iteration per subspace, all subspaces in parallel);
- centroid update is a one-hot [k, n] x [n, sd] matmul (MXU again);
- k-means++ seeding is a `lax.fori_loop` over centroids with a running
  min-distance table and categorical sampling (pq.rs's weighted pick);
- empty clusters are reseeded deterministically to the points currently
  farthest from their assigned centroid (the reference reseeds to a random
  point, pq.rs:423-441 — farthest-point is deterministic and strictly better).

Distance semantics match the reference exactly: `asymmetric_distance` is
sqrt(sum over subspaces of subspace-L2²) (pq.rs:275-304); ADC tables store
*squared* per-subspace distances and `table_distance` is gather+sum+sqrt
(pq.rs:307-348).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from islands_tpu.core.config import ConfigError, PQConfig

Array = jax.Array


class PQError(ValueError):
    """Invalid PQ operation (reference: CoreError::PQError)."""


# ---------------------------------------------------------------------------
# k-means (per-subspace; vmapped over subquantizers)
# ---------------------------------------------------------------------------


def _sq_dists(pts: Array, centroids: Array) -> Array:
    """Squared L2 distances [n, k] via |p|^2 + |c|^2 - 2 p.c (MXU matmul)."""
    p2 = jnp.sum(pts * pts, axis=1)[:, None]
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]
    cross = jnp.dot(pts, centroids.T, preferred_element_type=jnp.float32)
    return jnp.maximum(p2 + c2 - 2.0 * cross, 0.0)


def _kmeans_pp_init(key: Array, pts: Array, k: int) -> Array:
    """k-means++ seeding (reference: pq.rs:371-401): first centroid uniform,
    subsequent ones sampled with probability proportional to the squared
    distance to the nearest already-chosen centroid."""
    n, sd = pts.shape
    key, k0 = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centroids = jnp.zeros((k, sd), dtype=jnp.float32).at[0].set(pts[first])
    mind = jnp.sum((pts - pts[first][None, :]) ** 2, axis=1)

    def body(i, state):
        centroids, mind, key = state
        key, sub = jax.random.split(key)
        # categorical over p ∝ mind; if all mass is zero (k > distinct points)
        # fall back to uniform.
        logits = jnp.where(
            jnp.max(mind) > 0.0, jnp.log(jnp.maximum(mind, 1e-30)), jnp.zeros_like(mind)
        )
        idx = jax.random.categorical(sub, logits)
        c = pts[idx]
        centroids = centroids.at[i].set(c)
        mind = jnp.minimum(mind, jnp.sum((pts - c[None, :]) ** 2, axis=1))
        return centroids, mind, key

    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids, mind, key))
    return centroids


def _lloyd_step(pts: Array, centroids: Array) -> Array:
    """One Lloyd iteration with deterministic empty-cluster reseeding."""
    n, sd = pts.shape
    k = centroids.shape[0]
    d2 = _sq_dists(pts, centroids)
    assign = jnp.argmin(d2, axis=1)
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [n, k]
    counts = jnp.sum(onehot, axis=0)  # [k]
    sums = jnp.dot(onehot.T, pts, preferred_element_type=jnp.float32)  # [k, sd]
    new = sums / jnp.maximum(counts, 1.0)[:, None]

    # Empty clusters -> points farthest from their assigned centroid
    # (deterministic replacement for pq.rs:423-441's random reseed).
    empty = counts == 0.0
    dmin = jnp.min(d2, axis=1)  # [n] distance to assigned centroid
    far_order = jnp.argsort(-dmin)  # farthest first
    empty_rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # rank among empties
    cand_idx = far_order[jnp.clip(empty_rank, 0, n - 1)]
    new = jnp.where(empty[:, None], pts[cand_idx], new)
    return new


@functools.partial(jax.jit, static_argnames=("k", "iterations"))
def kmeans(
    key: Array, pts: Array, k: int, iterations: int = 25
) -> tuple[Array, Array]:
    """k-means over `pts` [n, sd] -> (centroids [k, sd], assignments [n]).

    Standalone equivalent of the reference's `kmeans` (pq.rs:362-463).
    """
    centroids = _kmeans_pp_init(key, pts.astype(jnp.float32), k)
    centroids = jax.lax.fori_loop(
        0, iterations, lambda _, c: _lloyd_step(pts, c), centroids
    )
    assign = jnp.argmin(_sq_dists(pts, centroids), axis=1).astype(jnp.int32)
    return centroids, assign


# ---------------------------------------------------------------------------
# Product quantizer
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PQCodebook:
    """Trained codebooks: centroids [num_sq, num_centroids, sub_dim] float32
    (reference PQCodebook: pq.rs:67-106, one Vec<Vec<f32>> per subspace)."""

    centroids: Array

    def tree_flatten(self):
        return (self.centroids,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_subquantizers(self) -> int:
        return self.centroids.shape[0]

    @property
    def num_centroids(self) -> int:
        return self.centroids.shape[1]

    @property
    def sub_dim(self) -> int:
        return self.centroids.shape[2]

    @property
    def dimension(self) -> int:
        return self.num_subquantizers * self.sub_dim

    def find_nearest(self, sub_vectors: Array) -> Array:
        """Nearest centroid per subspace: [num_sq, sub_dim] -> [num_sq] int32
        (reference: pq.rs:86-106)."""
        d2 = jax.vmap(_sq_dists)(sub_vectors[:, None, :], self.centroids)
        return jnp.argmin(d2[:, 0, :], axis=-1).astype(jnp.int32)


def _split_subspaces(x: Array, num_sq: int) -> Array:
    """[n, d] -> [num_sq, n, sub_dim]."""
    n, d = x.shape
    return x.reshape(n, num_sq, d // num_sq).transpose(1, 0, 2)


class ProductQuantizer:
    """Product quantizer (reference ProductQuantizer: pq.rs:109-358).

    Usage: `pq = ProductQuantizer(config); pq.train(x); codes = pq.encode(x)`.
    Codes are uint8 for <=256 centroids, uint16 otherwise (pq.rs:57-64).
    """

    def __init__(self, config: PQConfig | None = None):
        self.config = config or PQConfig()
        self.codebook: PQCodebook | None = None
        self._dimension: int | None = None

    # -- training ----------------------------------------------------------

    @property
    def is_trained(self) -> bool:
        return self.codebook is not None

    @property
    def dimension(self) -> int | None:
        return self._dimension

    @property
    def code_dtype(self):
        return jnp.uint8 if self.config.num_centroids <= 256 else jnp.uint16

    def train(
        self, x: Array, max_train_points: int = 131072
    ) -> "ProductQuantizer":
        """Train per-subspace codebooks (reference: pq.rs:175-218).

        All subspaces train simultaneously (vmapped k-means). When `x` has
        more than `max_train_points` rows a deterministic stride-sample is
        used — k-means quality saturates well below 128k points for k=256
        and the assignment matrix stays in HBM budget.
        """
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim != 2:
            raise PQError("training data must be [n, d]")
        n, d = x.shape
        cfg = self.config
        cfg.validate(d)
        if n < cfg.num_centroids:
            raise PQError(
                f"need at least {cfg.num_centroids} training vectors, got {n}"
            )
        if n > max_train_points:
            stride = -(-n // max_train_points)  # ceil: sample the full range
            x = x[:: stride][:max_train_points]
        subs = _split_subspaces(x, cfg.num_subquantizers)
        seed = cfg.seed if cfg.seed is not None else 0
        keys = jax.random.split(
            jax.random.PRNGKey(seed), cfg.num_subquantizers
        )
        train_one = functools.partial(
            kmeans, k=cfg.num_centroids, iterations=cfg.training_iterations
        )
        centroids, _ = jax.vmap(train_one)(keys, subs)
        self.codebook = PQCodebook(centroids=centroids)
        self._dimension = d
        return self

    def _require_trained(self) -> PQCodebook:
        if self.codebook is None:
            raise PQError("quantizer is not trained")
        return self.codebook

    # -- encode / decode ---------------------------------------------------

    def encode(self, x: Array, chunk: int = 65536) -> Array:
        """[n, d] -> codes [n, num_sq] (argmin centroid per subspace;
        reference: pq.rs:221-246). Chunked over n to bound the [n, k]
        assignment intermediate."""
        cb = self._require_trained()
        x = jnp.asarray(x, dtype=jnp.float32)
        if x.ndim == 1:
            return self.encode(x[None, :], chunk)[0]
        if x.shape[1] != self._dimension:
            raise PQError(
                f"dimension mismatch: expected {self._dimension}, got {x.shape[1]}"
            )
        outs = []
        for s in range(0, x.shape[0], chunk):
            outs.append(_encode_chunk(x[s : s + chunk], cb.centroids, self.code_dtype))
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

    def decode(self, codes: Array) -> Array:
        """codes [n, num_sq] -> reconstruction [n, d] (reference:
        pq.rs:249-271)."""
        cb = self._require_trained()
        codes = jnp.asarray(codes)
        if codes.ndim == 1:
            return self.decode(codes[None, :])[0]
        return _decode(codes, cb.centroids)

    # -- distances ---------------------------------------------------------

    def asymmetric_distance(self, q: Array, codes: Array) -> Array:
        """Exact-query-to-code distance: sqrt(sum_s |q_s - c_{s,code}|²)
        (reference: pq.rs:275-304). q [d] or [B, d]; codes [num_sq] or
        [n, num_sq]; broadcasts to [B, n] (or fewer dims)."""
        cb = self._require_trained()
        q1 = jnp.atleast_2d(jnp.asarray(q, dtype=jnp.float32))
        c1 = jnp.atleast_2d(jnp.asarray(codes))
        tables = self.build_distance_tables(q1)  # [B, num_sq, k]
        d = _table_distance(tables, c1)  # [B, n]
        if jnp.ndim(q) == 1:
            d = d[0]
        if jnp.ndim(codes) == 1:
            d = d[..., 0]
        return d

    def build_distance_tables(self, q: Array) -> Array:
        """ADC tables: q [B, d] (or [d]) -> squared per-subspace distances
        [B, num_sq, num_centroids] (reference: pq.rs:307-338)."""
        cb = self._require_trained()
        q2 = jnp.atleast_2d(jnp.asarray(q, dtype=jnp.float32))
        t = _build_tables(q2, cb.centroids)
        return t if jnp.ndim(q) > 1 else t[0]

    def table_distance(self, tables: Array, codes: Array) -> Array:
        """Gather + sum + sqrt over precomputed tables (reference:
        pq.rs:341-348). tables [B, num_sq, k] or [num_sq, k]; codes
        [n, num_sq] or [num_sq]."""
        t = jnp.asarray(tables)
        c = jnp.asarray(codes)
        tb = t[None] if t.ndim == 2 else t
        cb_ = jnp.atleast_2d(c)
        d = _table_distance(tb, cb_)
        if t.ndim == 2:
            d = d[0]
        if c.ndim == 1:
            d = d[..., 0]
        return d

    # -- storage -----------------------------------------------------------

    def storage_bytes(self, num_vectors: int) -> int:
        """codes + codebook bytes (reference compression claim pq.rs:672-677)."""
        cb = self._require_trained()
        code_bytes = num_vectors * self.config.bytes_per_vector
        codebook_bytes = int(np.prod(cb.centroids.shape)) * 4
        return code_bytes + codebook_bytes


@functools.partial(jax.jit, static_argnames=("dtype",))
def _encode_chunk(x: Array, centroids: Array, dtype) -> Array:
    subs = _split_subspaces(x, centroids.shape[0])  # [S, n, sd]
    d2 = jax.vmap(_sq_dists)(subs, centroids)  # [S, n, k]
    return jnp.argmin(d2, axis=-1).T.astype(dtype)  # [n, S]


@jax.jit
def _decode(codes: Array, centroids: Array) -> Array:
    # per-subspace gather: [S, n, sd] where row = centroids[s][codes[:, s]]
    g = jax.vmap(lambda cb, c: cb[c])(centroids, codes.astype(jnp.int32).T)
    return g.transpose(1, 0, 2).reshape(codes.shape[0], -1)


@jax.jit
def _build_tables(q: Array, centroids: Array) -> Array:
    qs = _split_subspaces(q, centroids.shape[0])  # [S, B, sd]
    d2 = jax.vmap(_sq_dists)(qs, centroids)  # [S, B, k]
    return d2.transpose(1, 0, 2)  # [B, S, k]


@jax.jit
def _table_distance(tables: Array, codes: Array) -> Array:
    """tables [B, S, k], codes [n, S] -> [B, n]."""
    c = codes.astype(jnp.int32)  # [n, S]
    # gather: out[b, n, s] = tables[b, s, c[n, s]]
    g = jnp.take_along_axis(
        tables[:, None, :, :],  # [B, 1, S, k]
        c[None, :, :, None],  # [1, n, S, 1]
        axis=3,
    )[..., 0]  # [B, n, S]
    return jnp.sqrt(jnp.maximum(jnp.sum(g, axis=-1), 0.0))


def pq_scan(
    pq: ProductQuantizer, queries: Array, codes: Array, metric=None
) -> Array:
    """Brute-force ADC scan of ALL codes: queries [B, d] -> distances [B, n]
    on the exact metric's scale. Runs the Pallas one-hot-matmul kernel on TPU
    (ops/pallas_kernels.adc_scan) — the PQ-first-stage filter for two-level
    pipelines and the fast path for small corpora where a full scan beats
    graph traversal."""
    from islands_tpu.ops import distance as dist_ops
    from islands_tpu.ops.pallas_kernels import adc_scan

    cb = pq._require_trained()
    mname = getattr(metric, "value", str(metric)) if metric else "euclidean"
    q2 = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
    if mname == "cosine":  # tables are inner products; cosine needs |q| = 1
        q2 = dist_ops.normalize(q2)
    tables = _build_metric_tables(q2, cb.centroids, mname)
    sums = adc_scan(tables, jnp.asarray(codes))
    if mname == "cosine":
        return 1.0 + sums
    if mname == "euclidean":
        return jnp.sqrt(jnp.maximum(sums, 0.0))
    return sums


def make_pq_scorer(pq: ProductQuantizer, codes: Array):
    """Approximate scorer over PQ codes for the beam-search hop: the query is
    turned into ADC tables once (per search), then each hop is a pure
    gather+sum — no d-dim math. Returns (prep_fn, scorer) where
    `prep_fn(q) -> tables` and `scorer(tables, ids, valid) -> dists`."""
    codes = jnp.asarray(codes)
    n = codes.shape[0]

    def prep(q: Array) -> Array:
        return pq.build_distance_tables(q)

    def scorer(tables: Array, ids: Array, valid: Array) -> Array:
        rows = codes[jnp.clip(ids, 0, n - 1)]  # [E, S]
        d = _table_distance(tables[None], rows)[0]
        return jnp.where(valid, d, jnp.inf)

    return prep, scorer


# ---------------------------------------------------------------------------
# Metric-scale ADC for the two-level (PQ-gated) search
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric_name",))
def _build_metric_tables(q: Array, centroids: Array, metric_name: str) -> Array:
    """ADC tables whose gather+sum (+finalize) approximates the *search
    metric*, so approximate and exact distances are on the same scale and the
    two-level loop can compare across queues (spec Algorithm 2 uses
    pq_distance and exact_dist interchangeably in queue logic).

    - cosine / dotproduct: tables = -<q_s, c_{s,k}>  (sum = -q.recon)
    - euclidean:           tables = |q_s - c_{s,k}|^2 (reference pq.rs:307-338)
    - manhattan:           tables = |q_s - c_{s,k}|_1
    """
    qs = _split_subspaces(q, centroids.shape[0])  # [S, B, sd]
    if metric_name in ("cosine", "dotproduct"):
        t = -jax.vmap(
            lambda a, c: jnp.dot(a, c.T, preferred_element_type=jnp.float32)
        )(qs, centroids)
    elif metric_name == "euclidean":
        t = jax.vmap(_sq_dists)(qs, centroids)
    else:  # manhattan
        t = jax.vmap(
            lambda a, c: jnp.sum(jnp.abs(a[:, None, :] - c[None, :, :]), axis=-1)
        )(qs, centroids)
    return t.transpose(1, 0, 2)  # [B, S, k]


def build_inline_codes(neighbors: Array, codes: Array) -> Array:
    """Inline neighbor-code blocks: [N, m0] graph + [n, S] u8 codes ->
    [N, m0*S] u8, row i = the PQ codes of node i's neighbors, concatenated.

    The two-level hop previously gathered one [S] code row per CANDIDATE
    (expand_width * m0 per query per hop) — TPU gathers are count-bound at
    ~10 ns/row regardless of row size (CLAUDE.md facts 7-8), which made the
    ADC hop the config-4 wall. With inline blocks the hop gathers one
    m0*S-byte block per EXPANDED node (expand_width per hop, m0x fewer
    gathers), the same layout fix that took the sketch gate from 9.6k to
    38k QPS (docs/design.md §10). Derived from graph + codes at searcher
    setup (not persisted; rebuild cost is one [N*m0] row gather).

    Sentinel (-1) neighbor slots get node 0's codes; they are masked by
    the hop's nbr_valid before anything is scored.
    """
    n_codes = codes.shape[0]
    safe = jnp.clip(neighbors, 0, max(n_codes - 1, 0))
    blocks = jnp.asarray(codes, dtype=jnp.uint8)[safe]  # [N, m0, S]
    return blocks.reshape(neighbors.shape[0], -1)


def _gated_block_scorer(
    tables: Array, block_codes: Array, valid: Array, *, metric_name: str
) -> Array:
    """ADC over pre-gathered inline code blocks, one-hot-matmul form.

    tables [S, K] f32 (per-query, built by gated_prep_for), block_codes
    [E, S] u8, valid [E] -> dists [E] on the exact metric's scale.

    out[e] = finalize(sum_s tables[s, block_codes[e, s]]) — evaluated as
    einsum('esk,sk->e', onehot(codes), tables) so XLA lowers it to an MXU
    contraction instead of an element-serialized take_along_axis gather
    (~E*S serialized elements per query per hop otherwise; CLAUDE.md fact 2:
    TPU element gathers/scatters are ~ns-each, matmuls are free by
    comparison at these sizes)."""
    k = tables.shape[1]
    c = block_codes.astype(jnp.int32)
    onehot = (c[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2))
    # bf16 operands, f32 accumulation: the MXU runs bf16 at 2x f32 rate and
    # the ~0.4% relative rounding is far below PQ quantization error (the
    # tables gate triage only — the pool is driven by exact distances).
    s = jnp.einsum(
        "esk,sk->e", onehot.astype(jnp.bfloat16), tables.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.where(valid, _finalize_adc(s, metric_name), jnp.inf)


def _finalize_adc(s: Array, metric_name: str) -> Array:
    """ADC sums -> distances on the exact metric's scale."""
    if metric_name == "cosine":
        return 1.0 + s
    if metric_name == "euclidean":
        return jnp.sqrt(jnp.maximum(s, 0.0))
    return s  # dotproduct / manhattan: sums already on the metric scale


def _make_grouped_gated_scorer(metric_name: str):
    """Inline-block ADC scorer whose BATCHED form runs the Pallas
    grouped-dilution kernel (ops/pallas_kernels.gated_adc_sums).

    The two-level hop loop is written per-query and vmapped
    (search.batched_two_level_search); a pallas_call cannot appear inside
    the vmapped body directly, so the batch-level kernel is attached as a
    custom_vmap rule: tracing vmap(search) swaps in one whole-batch kernel
    call per hop. Unbatched calls (and non-TPU platforms, via the kernel's
    einsum fallback) produce bit-identical numerics to _gated_block_scorer.
    """
    from jax import custom_batching

    from islands_tpu.ops.pallas_kernels import gated_adc_sums

    @custom_batching.custom_vmap
    def scorer(tables, block_codes, valid):
        return _gated_block_scorer(tables, block_codes, valid,
                                   metric_name=metric_name)

    @scorer.def_vmap
    def _batched_rule(axis_size, in_batched, tables, block_codes, valid):
        tb, cb, vb = in_batched
        if not tb:
            tables = jnp.broadcast_to(tables[None], (axis_size,) + tables.shape)
        if not cb:
            block_codes = jnp.broadcast_to(
                block_codes[None], (axis_size,) + block_codes.shape)
        if not vb:
            valid = jnp.broadcast_to(valid[None], (axis_size,) + valid.shape)
        s = gated_adc_sums(tables, block_codes.astype(jnp.int32))
        d = _finalize_adc(s, metric_name)
        return jnp.where(valid, d, jnp.inf), True

    return scorer


_GATED_BLOCK_SCORERS: dict = {}


def gated_block_scorer_for(metric, impl: str = "grouped"):
    """Cached inline-block ADC scorer for the two-level search (see
    _gated_block_scorer). Partner of gated_prep_for.

    impl="grouped" (default): batched calls run the Pallas grouped-dilution
    kernel on TPU (16x MXU-utilization win over the einsum's per-query
    matvec lowering — benches/twolevel_ablate.py measured the einsum ADC at
    70% of the whole hop loop). impl="einsum": the round-4 XLA lowering
    (A/B baseline; also what the grouped path falls back to off-TPU)."""
    mname = getattr(metric, "value", str(metric))
    key = (mname, impl)
    if key not in _GATED_BLOCK_SCORERS:
        if impl == "grouped":
            _GATED_BLOCK_SCORERS[key] = _make_grouped_gated_scorer(mname)
        else:
            _GATED_BLOCK_SCORERS[key] = functools.partial(
                _gated_block_scorer, metric_name=mname
            )
    return _GATED_BLOCK_SCORERS[key]


def _gated_prep(ctx, qp: Array, *, metric_name: str) -> Array:
    """Per-query ADC tables: ctx = centroids [S, K, sd], qp [B, d] (prepped)
    -> tables [B, S, K]."""
    return _build_metric_tables(qp, ctx, metric_name)


_GATED_PREPS: dict = {}


def gated_prep_for(metric):
    """Cached table-prep fn `(centroids_ctx, qp) -> tables` for the two-level
    search."""
    mname = getattr(metric, "value", str(metric))
    if mname not in _GATED_PREPS:
        _GATED_PREPS[mname] = functools.partial(_gated_prep, metric_name=mname)
    return _GATED_PREPS[mname]
