"""HNSW + search-API tests.

Mirrors the reference's HNSW strategy (src/core/hnsw.rs:517-854): recall vs
brute force, config presets, incremental insertion (batched `extend` here),
plus Searcher/MultiIndexSearcher behaviors (search.rs tests).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from islands_tpu.core.config import (
    ConfigError,
    DistanceMetric,
    HnswConfig,
    SearchConfig,
)
from islands_tpu.core.hnsw import HnswIndex
from islands_tpu.core.searchapi import MultiIndexSearcher, Searcher, SearchResult
from islands_tpu.ops import distance as dist_ops
from tests.conftest import make_vectors

N, DIM = 600, 32
FAST = HnswConfig(
    m=8, m0=16, ef_construction=64, wave_size=128, intra_wave_k=8, reverse_slack=8
)


def mean_recall(ids, true_ids):
    k = true_ids.shape[1]
    return float(np.mean([
        len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / k
        for i in range(len(ids))
    ]))


@pytest.fixture(scope="module")
def corpus():
    return make_vectors(N, DIM, seed=17)


@pytest.fixture(scope="module")
def built(corpus):
    return HnswIndex(FAST).build(corpus)


class TestConfig:
    def test_presets(self):
        HnswConfig().validate()
        HnswConfig.fast().validate()
        HnswConfig.accurate().validate()
        assert HnswConfig.fast().m < HnswConfig.accurate().m

    def test_validation(self):
        with pytest.raises(ConfigError):
            HnswConfig(m=0).validate()
        with pytest.raises(ConfigError):
            HnswConfig(m=16, m0=8).validate()


class TestHnswIndex:
    def test_empty(self):
        idx = HnswIndex(FAST).build(np.zeros((0, 8), np.float32))
        assert idx.is_empty
        d, i = idx.search(np.zeros((3, 8), np.float32), k=5)
        assert d.shape == (3, 0)

    def test_layers_structure(self, built):
        assert built.num_nodes == N
        assert built.max_level == len(built.layers)
        # Each upper layer is a strict subset of the one below.
        sizes = [len(l.ids) for l in built.layers]
        assert all(a > b for a, b in zip([N] + sizes, sizes))
        assert built.levels[built.entry_point] == built.max_level

    def test_recall(self, built, corpus):
        q = make_vectors(32, DIM, seed=55)
        _, true_ids = dist_ops.brute_force_topk(
            jnp.asarray(q), jnp.asarray(corpus), 10, FAST.metric
        )
        _, ids = built.search(q, k=10, ef=100)
        r = mean_recall(ids, np.asarray(true_ids))
        assert r >= 0.9, r

    def test_single_query(self, built):
        q = make_vectors(1, DIM, seed=5)[0]
        d, i = built.search(q, k=5)
        assert d.shape == (5,) and i.shape == (5,)
        assert np.all(np.diff(d) >= -1e-6)

    def test_determinism(self, built):
        q = make_vectors(8, DIM, seed=3)
        _, a = built.search(q, k=10)
        _, b = built.search(q, k=10)
        np.testing.assert_array_equal(a, b)

    @pytest.mark.slow
    def test_extend_recall(self, corpus):
        idx = HnswIndex(FAST).build(corpus[:400])
        idx.extend(corpus[400:])
        assert idx.num_nodes == N
        q = make_vectors(16, DIM, seed=23)
        _, true_ids = dist_ops.brute_force_topk(
            jnp.asarray(q), jnp.asarray(corpus), 10, FAST.metric
        )
        _, ids = idx.search(q, k=10, ef=100)
        r = mean_recall(ids, np.asarray(true_ids))
        assert r >= 0.85, r
        # Extended region is reachable.
        assert np.any(ids >= 400)

    def test_extend_empty_index(self, corpus):
        idx = HnswIndex(FAST).extend(corpus[:100])
        assert idx.num_nodes == 100

    @pytest.mark.slow
    def test_extend_same_bucket_no_recompile(self, corpus):
        """Two successive extends inside one structural bucket must reuse the
        cached wave executables (round-1 weakness: every append compiled
        fresh; fixed by power-of-two bucketing in build.extend_graph)."""
        from islands_tpu.core import build as build_mod

        idx = HnswIndex(FAST).build(corpus[:300])
        idx.extend(corpus[300:340])  # compiles the bucket's executables
        before = build_mod.wave_step._cache_size()
        idx.extend(corpus[340:380])  # same n-bucket (512), same wave bucket
        idx.extend(corpus[380:420])
        assert build_mod.wave_step._cache_size() == before
        assert idx.num_nodes == 420

    @pytest.mark.slow
    def test_euclidean_metric(self, corpus):
        import dataclasses

        cfg = dataclasses.replace(FAST, metric=DistanceMetric.EUCLIDEAN)
        idx = HnswIndex(cfg).build(corpus)
        q = make_vectors(8, DIM, seed=31)
        _, true_ids = dist_ops.brute_force_topk(
            jnp.asarray(q), jnp.asarray(corpus), 10, DistanceMetric.EUCLIDEAN
        )
        _, ids = idx.search(q, k=10, ef=100)
        assert mean_recall(ids, np.asarray(true_ids)) >= 0.85


class TestSearchApi:
    def test_similarity_mapping(self):
        r = SearchResult(id=1, distance=0.0)
        assert r.similarity == 1.0
        assert SearchResult(id=1, distance=1.0).similarity == 0.5

    def test_searcher_builder(self, built, corpus):
        s = Searcher(built).with_top_k(5).with_ef(64).with_vectors()
        q = make_vectors(4, DIM, seed=41)
        out = s.search(q)
        assert len(out) == 4
        for hits in out:
            assert len(hits) <= 5
            assert all(h.vector is not None for h in hits)
            sims = [h.similarity for h in hits]
            assert sims == sorted(sims, reverse=True)

    def test_searcher_operating_point_knobs(self):
        """with_promote_width / with_max_iters forward to gated indexes
        (design.md §13); unset they are not passed at all, so plain HNSW
        keeps working (covered by every other Searcher test here)."""
        from islands_tpu.core.build import build_index_with_sketch
        from islands_tpu.core.config import ConfigError, LeannConfig
        from islands_tpu.core.search import StoredSearcher
        from islands_tpu.core.config import DistanceMetric

        metric = DistanceMetric.EUCLIDEAN
        x = make_vectors(400, 32, seed=71)
        cfg = LeannConfig(metric=metric, m=8, m0=16, reverse_slack=16,
                          wave_size=128, ef_construction=32, sketch_dims=16)
        graph, sk = build_index_with_sketch(x, cfg)
        idx = StoredSearcher(graph, x, metric, sketch=sk)
        q = make_vectors(4, 32, seed=72)
        out = (Searcher(idx).with_top_k(5).with_ef(32)
               .with_promote_width(16).with_max_iters(8).search(q))
        assert len(out) == 4 and all(len(h) <= 5 for h in out)
        with pytest.raises(ConfigError):
            Searcher(idx).with_max_iters(0)
        with pytest.raises(ConfigError):
            Searcher(idx).with_promote_width(-1)

    def test_min_similarity_filter(self, built):
        q = make_vectors(4, DIM, seed=41)
        all_hits = Searcher(built).with_top_k(10).search(q)
        filt = Searcher(built).with_top_k(10).with_min_similarity(0.99).search(q)
        for a, f in zip(all_hits, filt):
            assert len(f) <= len(a)
            assert all(h.similarity >= 0.99 for h in f)

    def test_single_query_shape(self, built):
        q = make_vectors(1, DIM, seed=2)[0]
        out = Searcher(built).search(q)
        assert len(out) == 1 and isinstance(out[0], list)

    def test_multi_index_merge(self, corpus):
        a = HnswIndex(FAST).build(corpus[:300])
        b = HnswIndex(FAST).build(corpus[300:])
        ms = MultiIndexSearcher(SearchConfig(top_k=10, ef=64))
        ms.add_index("a", a).add_index("b", b)
        q = make_vectors(4, DIM, seed=67)
        out = ms.search(q)
        assert len(out) == 4
        for hits in out:
            assert len(hits) <= 10
            names = {h.index_name for h in hits}
            assert names <= {"a", "b"}
            sims = [h.similarity for h in hits]
            assert sims == sorted(sims, reverse=True)
        # restricting to one index only returns that index
        only_a = ms.search(q, index_names=["a"])
        assert all(h.index_name == "a" for hits in only_a for h in hits)
        ms.remove_index("b")
        assert "b" not in ms.indexes
