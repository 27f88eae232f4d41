"""Cloud embedding backend wire-format tests (reference: CloudProvider
{OpenAI, Cohere}, src/core/embedding/provider.rs:84-102,403-404).

Zero-egress environment: the pure request-build / response-parse halves are
tested against canned payloads; no network is touched (same pattern as the
agent's OpenAI chat client tests)."""

import json

import numpy as np
import pytest

from islands_tpu.models.cloud import (
    KNOWN_DIMENSIONS,
    CloudEmbedder,
    CloudEmbeddingConfig,
    CloudEmbeddingError,
    CloudProvider,
    build_request,
    parse_response,
)


class TestRequestFormat:
    def test_openai_body_and_headers(self):
        cfg = CloudEmbeddingConfig(provider=CloudProvider.OPENAI)
        url, headers, body = build_request(cfg, ["a", "b"], api_key="sk-test")
        assert url == "https://api.openai.com/v1/embeddings"
        assert headers["Authorization"] == "Bearer sk-test"
        payload = json.loads(body)
        assert payload == {
            "model": "text-embedding-3-small",
            "input": ["a", "b"],
            "encoding_format": "float",
        }

    def test_cohere_body_and_headers(self):
        cfg = CloudEmbeddingConfig(provider=CloudProvider.COHERE,
                                   model="embed-english-light-v3.0")
        url, headers, body = build_request(cfg, ["x"], api_key="co-test")
        assert url == "https://api.cohere.com/v2/embed"
        assert headers["Authorization"] == "Bearer co-test"
        payload = json.loads(body)
        assert payload == {
            "model": "embed-english-light-v3.0",
            "texts": ["x"],
            "input_type": "search_document",
            "embedding_types": ["float"],
        }

    def test_base_url_override(self):
        cfg = CloudEmbeddingConfig(provider=CloudProvider.OPENAI,
                                   base_url="http://proxy:8080/v1/embeddings")
        url, _, _ = build_request(cfg, ["a"], api_key="k")
        assert url == "http://proxy:8080/v1/embeddings"


class TestResponseParse:
    def test_openai_index_sorted(self):
        raw = json.dumps({
            "data": [
                {"index": 1, "embedding": [3.0, 4.0]},
                {"index": 0, "embedding": [1.0, 2.0]},
            ],
            "model": "text-embedding-3-small",
        }).encode()
        out = parse_response(CloudProvider.OPENAI, raw, expected=2)
        np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, 4.0]])
        assert out.dtype == np.float32

    def test_cohere_float_block(self):
        raw = json.dumps({
            "embeddings": {"float": [[0.5, -0.5], [1.5, 2.5]]},
        }).encode()
        out = parse_response(CloudProvider.COHERE, raw, expected=2)
        np.testing.assert_array_equal(out, [[0.5, -0.5], [1.5, 2.5]])

    def test_count_mismatch_raises(self):
        raw = json.dumps({"data": [{"index": 0, "embedding": [1.0]}]}).encode()
        with pytest.raises(CloudEmbeddingError, match="expected 2"):
            parse_response(CloudProvider.OPENAI, raw, expected=2)

    def test_malformed_raises(self):
        with pytest.raises(CloudEmbeddingError):
            parse_response(CloudProvider.OPENAI, b"not json", expected=1)
        with pytest.raises(CloudEmbeddingError):
            parse_response(CloudProvider.COHERE, b'{"embeddings": 3}', expected=1)


class TestConfig:
    def test_key_from_env(self, monkeypatch):
        monkeypatch.setenv("COHERE_API_KEY", "env-key")
        cfg = CloudEmbeddingConfig(provider=CloudProvider.COHERE)
        assert cfg.resolved_key() == "env-key"

    def test_missing_key_raises(self, monkeypatch):
        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        with pytest.raises(CloudEmbeddingError, match="OPENAI_API_KEY"):
            CloudEmbeddingConfig(provider=CloudProvider.OPENAI).resolved_key()

    def test_known_dimensions(self):
        emb = CloudEmbedder(CloudEmbeddingConfig(
            provider=CloudProvider.OPENAI, model="text-embedding-3-large"))
        assert emb.dimension == KNOWN_DIMENSIONS["text-embedding-3-large"]

    def test_offline_batch_request_assembly(self, monkeypatch):
        """embed_texts batches through _call; stub the network half and check
        batching + concat semantics without egress."""
        emb = CloudEmbedder(CloudEmbeddingConfig(
            provider=CloudProvider.OPENAI, batch_size=2))
        calls = []

        def fake_call(texts):
            calls.append(list(texts))
            return np.full((len(texts), 3), float(len(calls)), np.float32)

        monkeypatch.setattr(emb, "_call", fake_call)
        out = emb.embed_texts(["a", "b", "c"])
        assert calls == [["a", "b"], ["c"]]
        assert out.shape == (3, 3)
        assert emb.dimension == 3

    def test_indexer_kind_constructs_cloud_embedder(self):
        from islands_tpu.indexer.service import EmbeddingConfig, IndexerService

        # Constructing the service with kind="cohere" must wire a
        # CloudEmbedder with the provider default model (lazy property).
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            svc = IndexerService.__new__(IndexerService)
            svc._embedder = None
            from islands_tpu.indexer.service import IndexerConfig

            svc.config = IndexerConfig(
                base_path=d,
                embedding=EmbeddingConfig(kind="cohere", batch_size=7),
            )
            emb = svc.embedder
            assert isinstance(emb, CloudEmbedder)
            assert emb.config.provider is CloudProvider.COHERE
            assert emb.config.resolved_model() == "embed-english-v3.0"
            assert emb.config.batch_size == 7
