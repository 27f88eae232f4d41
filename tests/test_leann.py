"""LeannIndex tests: recompute search, pruning strategies, two-level PQ
gating, recompute-efficiency metric, error paths.

Mirrors the reference's LEANN test strategy (src/core/leann.rs:1070-1572):
InMemoryEmbeddingProvider as the device-free fake, brute-force recall oracle,
seeded determinism — with tighter recall floors than the reference's 35%.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from islands_tpu.core.config import (
    DistanceMetric,
    LeannConfig,
    PQConfig,
    PruningStrategy,
)
from islands_tpu.core.embedding import EmbeddingError, InMemoryEmbeddingProvider
from islands_tpu.core.leann import DimensionMismatch, IndexNotBuilt, LeannIndex
from islands_tpu.ops import distance as dist_ops
from tests.conftest import make_vectors

N, DIM = 800, 48
SMALL_CFG = dict(
    m=12, m0=24, ef_construction=64, wave_size=128, intra_wave_k=8, reverse_slack=12
)


@pytest.fixture(scope="module")
def corpus():
    return make_vectors(N, DIM, seed=11)


@pytest.fixture(scope="module")
def provider(corpus):
    return InMemoryEmbeddingProvider(corpus)


@pytest.fixture(scope="module")
def built(corpus, provider):
    idx = LeannIndex(LeannConfig(**SMALL_CFG))
    idx.build(provider, with_pq=PQConfig(num_subquantizers=8, num_centroids=64,
                                         training_iterations=10, seed=0))
    return idx


def true_topk(queries, corpus, k, metric=DistanceMetric.COSINE):
    _, ids = dist_ops.brute_force_topk(jnp.asarray(queries), jnp.asarray(corpus), k, metric)
    return np.asarray(ids)


def mean_recall(ids, true_ids):
    k = true_ids.shape[1]
    return float(np.mean([
        len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / k
        for i in range(len(ids))
    ]))


class TestProviders:
    def test_in_memory_provider(self, corpus, provider):
        assert provider.dimension == DIM
        assert provider.num_items == N
        np.testing.assert_allclose(provider.compute_embedding(5), corpus[5], rtol=1e-6)
        batch = provider.compute_embeddings_batch([1, 3, 5])
        np.testing.assert_allclose(batch, corpus[[1, 3, 5]], rtol=1e-6)
        with pytest.raises(EmbeddingError):
            provider.compute_embedding(N)
        with pytest.raises(EmbeddingError):
            provider.compute_embeddings_batch([-1])

    def test_batch_fn_jittable(self, corpus, provider):
        import jax

        fn = jax.jit(provider.batch_fn())
        out = fn(jnp.asarray([0, 7], dtype=jnp.int32))
        np.testing.assert_allclose(np.asarray(out), corpus[[0, 7]], rtol=1e-6)


class TestBuild:
    def test_empty_build(self):
        idx = LeannIndex(LeannConfig(**SMALL_CFG))
        idx.build(InMemoryEmbeddingProvider(np.zeros((0, 8), np.float32)))
        assert idx.is_empty
        d, i = idx.search(np.zeros((2, 8), np.float32), k=5,
                          provider=InMemoryEmbeddingProvider(np.zeros((0, 8), np.float32)))
        assert d.shape == (2, 0) and i.shape == (2, 0)

    def test_search_before_build_raises(self):
        idx = LeannIndex(LeannConfig(**SMALL_CFG))
        with pytest.raises(IndexNotBuilt):
            idx.search(np.zeros((1, 8), np.float32), k=3, provider=None)

    def test_dimension_mismatch(self, built, provider):
        with pytest.raises(DimensionMismatch):
            built.search(np.zeros((1, DIM + 1), np.float32), k=3, provider=provider)

    def test_storage_is_graph_only(self, built, corpus):
        raw = corpus.nbytes
        # Graph + PQ codes << raw embeddings even at this tiny n.
        assert built.storage_bytes() < raw
        assert built.graph.max_degree == 24


class TestPqScanSearch:
    def test_pq_scan_recall_and_rerank(self, built, corpus, provider):
        q = make_vectors(32, DIM, seed=55)
        true_ids = true_topk(q, corpus, 10)
        d, ids = built.search_pq_scan(q, k=10, provider=provider, rerank=64)
        assert mean_recall(ids, true_ids) >= 0.9
        assert np.all(np.diff(d, axis=1) >= -1e-6)  # exact dists, ascending
        assert built.last_recompute_fraction == pytest.approx(64 / N)

    def test_pq_scan_requires_pq(self, corpus, provider):
        idx = LeannIndex(LeannConfig(**SMALL_CFG))
        idx.build(provider)  # no with_pq
        with pytest.raises(IndexNotBuilt):
            idx.search_pq_scan(np.zeros((1, DIM), np.float32), k=3,
                               provider=provider)


class TestExtend:
    @pytest.mark.slow
    def test_extend_recall_and_reachability(self, corpus, provider):
        idx = LeannIndex(LeannConfig(**SMALL_CFG))
        idx.build(provider, num_vectors=600)
        idx.extend(provider)  # append the remaining N-600 items
        assert idx.num_nodes == N
        q = make_vectors(32, DIM, seed=41)
        true_ids = true_topk(q, corpus, 10)
        _, ids = idx.search(q, k=10, provider=provider, ef=96)
        assert mean_recall(ids, true_ids) >= 0.9
        assert np.any(ids >= 600)  # appended region reachable
        idx.graph.validate()

    def test_extend_noop_and_empty(self, corpus, provider):
        idx = LeannIndex(LeannConfig(**SMALL_CFG))
        idx.build(provider)
        before = np.asarray(idx.graph.neighbors)
        idx.extend(provider)  # num_total == num_nodes: no-op
        np.testing.assert_array_equal(np.asarray(idx.graph.neighbors), before)


class TestRecomputeSearch:
    def test_recall_matches_stored_search(self, built, corpus, provider):
        q = make_vectors(32, DIM, seed=99)
        true_ids = true_topk(q, corpus, 10)
        d, ids = built.search(q, k=10, provider=provider, ef=96)
        r = mean_recall(ids, true_ids)
        assert r >= 0.9, r
        # Distances ascending
        assert np.all(np.diff(d, axis=1) >= -1e-6)

    def test_single_query_path(self, built, corpus, provider):
        q = make_vectors(1, DIM, seed=5)[0]
        d, ids = built.search(q, k=5, provider=provider, ef=64)
        assert d.shape == (5,) and ids.shape == (5,)

    def test_determinism(self, built, provider):
        q = make_vectors(8, DIM, seed=3)
        _, a = built.search(q, k=10, provider=provider, ef=64)
        _, b = built.search(q, k=10, provider=provider, ef=64)
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("strategy", [
        PruningStrategy.GLOBAL, PruningStrategy.LOCAL, PruningStrategy.PROPORTIONAL,
    ])
    @pytest.mark.slow
    def test_pruning_strategies_recall(self, corpus, provider, strategy):
        idx = LeannIndex(LeannConfig(
            **SMALL_CFG, prune_ratio=0.3, pruning_strategy=strategy,
        ))
        idx.build(provider)
        q = make_vectors(16, DIM, seed=7)
        true_ids = true_topk(q, corpus, 10)
        _, ids = idx.search(q, k=10, provider=provider, ef=96)
        r = mean_recall(ids, true_ids)
        # Pruning trades recall for fewer recomputes; floor well above the
        # reference's 35% assertion (leann.rs:1427-1432).
        assert r >= 0.6, (strategy, r)


class TestTwoLevelSearch:
    def test_requires_pq(self, corpus, provider):
        idx = LeannIndex(LeannConfig(**SMALL_CFG)).build(provider)
        with pytest.raises(IndexNotBuilt):
            idx.search_two_level(np.zeros((1, DIM), np.float32), k=3, provider=provider)

    def test_recall_and_efficiency(self, built, corpus, provider):
        q = make_vectors(32, DIM, seed=21)
        true_ids = true_topk(q, corpus, 10)
        d, ids = built.search_two_level(
            q, k=10, provider=provider, ef=96, rerank_ratio=0.15
        )
        r = mean_recall(ids, true_ids)
        assert r >= 0.8, r
        # The whole point: exact recomputes bounded well below scanning
        # every node.
        assert built.last_recompute_fraction is not None
        assert built.last_recompute_fraction < 0.8
        assert np.all(np.diff(d, axis=1) >= -1e-6)

    def test_routing_entries(self, built, corpus, provider):
        # Per-query routed entries (route_entries_embed): recall holds with
        # the approach phase shortcut and a capped iteration budget.
        q = make_vectors(32, DIM, seed=21)
        true_ids = true_topk(q, corpus, 10)
        _, ids = built.search_two_level(
            q, k=10, provider=provider, ef=96, rerank_ratio=0.15,
            routing_size=256,
        )
        assert mean_recall(ids, true_ids) >= 0.8

    def test_end_rerank_recall_and_exactness(self, built, corpus, provider):
        # Pure-ADC hop loop + one final ef-wide exact rescore (design.md
        # §16): recall holds and returned distances are still exact.
        q = make_vectors(32, DIM, seed=21)
        true_ids = true_topk(q, corpus, 10)
        d, ids = built.search_two_level(
            q, k=10, provider=provider, ef=96, rerank_ratio=0.15,
            end_rerank=True,
        )
        r = mean_recall(ids, true_ids)
        assert r >= 0.8, r
        # Exactly ef + 1 exact scores per query (entry + final rescore of
        # a full finite pool), far below the per-hop promotion budget.
        assert built.last_recompute_fraction is not None
        assert built.last_recompute_fraction <= (96 + 1) / built.num_nodes + 1e-9
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        for j in range(10):
            if ids[0, j] < 0:
                continue
            true_d = 1.0 - float(np.dot(qn[0], xn[ids[0, j]]))
            assert abs(d[0, j] - true_d) < 1e-4

    def test_final_rescore_recall_and_exactness(self, built, corpus, provider):
        # final_rescore (round-5 knob): one exact rescore of the AQ head
        # after the loop. At a narrow promote_width it must recover recall
        # (>= the un-rescored run), keep distances exact, and never
        # duplicate ids (AQ and pool are disjoint by construction).
        q = make_vectors(32, DIM, seed=21)
        true_ids = true_topk(q, corpus, 10)
        kw = dict(k=10, provider=provider, ef=64, promote_width=4, max_iters=8)
        _, ids_plain = built.search_two_level(q, **kw)
        d_fr, ids_fr = built.search_two_level(q, **kw, final_rescore=32)
        assert mean_recall(ids_fr, true_ids) >= mean_recall(ids_plain, true_ids) - 1e-9
        assert np.all(np.diff(d_fr, axis=1) >= -1e-6)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        for i in range(len(q)):
            valid = ids_fr[i][ids_fr[i] >= 0]
            assert len(set(valid.tolist())) == len(valid), (i, ids_fr[i])
            for j in range(10):
                if ids_fr[i, j] < 0:
                    continue
                true_d = 1.0 - float(np.dot(qn[i], xn[ids_fr[i, j]]))
                assert abs(d_fr[i, j] - true_d) < 1e-4

    def test_results_have_exact_distances(self, built, corpus, provider):
        # Returned distances must be exact (recomputed), not PQ-approximate.
        q = make_vectors(4, DIM, seed=33)
        d, ids = built.search_two_level(q, k=5, provider=provider, ef=64)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        for i in range(len(q)):
            for j in range(5):
                if ids[i, j] < 0:
                    continue
                true_d = 1.0 - float(np.dot(qn[i], xn[ids[i, j]]))
                assert abs(d[i, j] - true_d) < 1e-4

    @pytest.mark.parametrize("metric", [
        DistanceMetric.EUCLIDEAN, DistanceMetric.DOT_PRODUCT,
    ])
    @pytest.mark.slow
    def test_other_metrics(self, corpus, metric):
        prov = InMemoryEmbeddingProvider(corpus)
        idx = LeannIndex(LeannConfig(**SMALL_CFG, metric=metric))
        idx.build(prov, with_pq=PQConfig(num_subquantizers=8, num_centroids=64,
                                         training_iterations=10, seed=0))
        q = make_vectors(16, DIM, seed=13)
        true_ids = true_topk(q, corpus, 10, metric)
        _, ids = idx.search_two_level(q, k=10, provider=prov, ef=96, rerank_ratio=0.15)
        r = mean_recall(ids, true_ids)
        assert r >= 0.7, (metric, r)


class TestConfigOperatingPoint:
    def test_config_defaults_reach_search(self, corpus):
        """LeannConfig.promote_width / max_search_iters act as search
        defaults (design.md §13); per-call args still win."""
        prov = InMemoryEmbeddingProvider(corpus)
        cfg = LeannConfig(**SMALL_CFG, sketch_query=True, sketch_dims=16,
                          promote_width=16, max_search_iters=2)
        idx = LeannIndex(cfg)
        idx.build(prov)
        q = np.asarray(corpus[:16])
        idx.search(q, k=10, provider=prov, ef=32)
        rf_starved = idx.last_recompute_fraction
        # per-call override: a generous cap does more exact work than the
        # starved config default
        idx.search(q, k=10, provider=prov, ef=32, max_iters=64)
        rf_generous = idx.last_recompute_fraction
        assert rf_generous > rf_starved
        # and an un-set config keeps the conservative formula (more work
        # than the starved default)
        cfg2 = LeannConfig(**SMALL_CFG, sketch_query=True, sketch_dims=16)
        idx2 = LeannIndex(cfg2)
        idx2.build(prov)
        idx2.search(q, k=10, provider=prov, ef=32)
        assert idx2.last_recompute_fraction > rf_starved

    def test_validate_rejects_nonpositive(self):
        from islands_tpu.core.config import ConfigError

        with pytest.raises(ConfigError):
            LeannConfig(promote_width=0).validate()
        with pytest.raises(ConfigError):
            LeannConfig(max_search_iters=-1).validate()


class TestSmallCorpusEdges:
    @pytest.mark.slow
    def test_pq_scan_k_larger_than_corpus(self):
        """k > num_nodes: results pad with (inf, -1) instead of crashing."""
        from islands_tpu.core.config import PQConfig

        corpus = make_vectors(6, 16, seed=60)
        prov = InMemoryEmbeddingProvider(corpus)
        idx = LeannIndex(LeannConfig(
            m=2, m0=4, ef_construction=8, wave_size=8, intra_wave_k=2,
            reverse_slack=4,
        ))
        idx.build(prov, with_pq=PQConfig(
            num_subquantizers=4, num_centroids=4, training_iterations=4, seed=0
        ))
        d, ids = idx.search_pq_scan(
            np.asarray(corpus[:2]), k=10, provider=prov
        )
        assert d.shape == (2, 10) and ids.shape == (2, 10)
        assert np.all(ids[:, 6:] == -1)
        assert np.all(np.isinf(d[:, 6:]))

    @pytest.mark.slow
    def test_sketch_gate_tiny_degree(self):
        """promote_width wider than a hop's discoveries must not break the
        gated loop (it is clamped to expand_width * max_degree)."""
        from islands_tpu.core.search import StoredSearcher
        from islands_tpu.ops.proj import build_sketch_index

        corpus = jnp.asarray(make_vectors(300, 16, seed=61))
        idx = LeannIndex(LeannConfig(
            m=1, m0=2, ef_construction=8, wave_size=64, intra_wave_k=1,
            reverse_slack=2, sketch_build=False,
        ))
        idx.build_from_embeddings(corpus)
        sk = build_sketch_index(corpus, idx.graph.neighbors, proj_dims=8)
        s = StoredSearcher(idx.graph, corpus, idx.config.metric, sketch=sk)
        d, ids = s.search(corpus[:4], k=3, ef=16, expand_width=1, gate="sketch")
        assert ids.shape == (4, 3)
