"""Utils tests: tracing spans/metrics, JSON logging, persistent cache setup."""

import json
import logging

import pytest

from islands_tpu.utils.cache import enable_persistent_cache
from islands_tpu.utils.tracing import (
    JsonFormatter,
    Metrics,
    metrics,
    record_recompute_efficiency,
    span,
)


class TestMetrics:
    def test_counters_gauges_timings(self):
        m = Metrics()
        m.incr("queries")
        m.incr("queries", 4)
        m.gauge("recall", 0.95)
        m.record_timing("search", 0.5)
        m.record_timing("search", 1.5)
        snap = m.snapshot()
        assert snap["counters"]["queries"] == 5
        assert snap["gauges"]["recall"] == 0.95
        assert snap["timings"]["search"]["count"] == 2
        assert snap["timings"]["search"]["mean_s"] == pytest.approx(1.0)
        m.reset()
        assert m.snapshot() == {"counters": {}, "gauges": {}, "timings": {}}

    def test_thread_safety_smoke(self):
        import threading

        m = Metrics()
        threads = [
            threading.Thread(target=lambda: [m.incr("c") for _ in range(500)])
            for _ in range(4)
        ]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert m.snapshot()["counters"]["c"] == 2000


class TestSpan:
    def test_span_records_timing(self):
        metrics.reset()
        with span("unit-test-span"):
            pass
        snap = metrics.snapshot()
        assert snap["timings"]["unit-test-span"]["count"] == 1

    def test_span_blocks_on_device_work(self):
        import jax.numpy as jnp

        metrics.reset()
        x = jnp.ones((256, 256))
        with span("matmul", block_on=x):
            y = x @ x
        assert metrics.snapshot()["timings"]["matmul"]["count"] == 1

    def test_recompute_efficiency(self):
        frac = record_recompute_efficiency(250, 1000)
        assert frac == 0.25
        assert metrics.snapshot()["gauges"]["recompute_fraction"] == 0.25


class TestJsonLogging:
    def test_formatter_emits_json_lines(self):
        rec = logging.LogRecord(
            "islands_tpu.test", logging.INFO, __file__, 1, "hello %s", ("x",), None
        )
        out = json.loads(JsonFormatter().format(rec))
        assert out["message"] == "hello x"
        assert out["level"] == "info"
        assert out["target"] == "islands_tpu.test"


class TestPersistentCache:
    def test_enable_idempotent(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ISLANDS_TPU_CACHE", str(tmp_path / "xla"))
        # force re-enable in this process regardless of prior state
        import islands_tpu.utils.cache as c

        monkeypatch.setattr(c, "_ENABLED", False)
        d1 = enable_persistent_cache()
        d2 = enable_persistent_cache()
        assert d1 == d2
        from pathlib import Path

        assert Path(d1).exists()
