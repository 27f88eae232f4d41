"""Native C++ data-loader tests: build + exact parity with the Python
walker/chunker, and the service wiring."""

import numpy as np
import pytest

from islands_tpu.indexer.files import chunk_files, collect_files
from islands_tpu.indexer.native import collect_chunks_native, native_available

from tests.test_indexer import SAMPLE, make_tree

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native loader"
)


def test_parity_with_python_chunker(tmp_path):
    make_tree(tmp_path, SAMPLE)
    # a larger file to exercise multi-chunk + overlap paths
    (tmp_path / "src" / "big.py").write_text(
        "\n".join(f"def function_{i}(): return {i}" for i in range(200))
    )
    exts = ("py", "rs", "md")
    py_chunks = chunk_files(collect_files(tmp_path, exts), 256, 48)
    nat_chunks = collect_chunks_native(tmp_path, exts, 256, 48)
    assert nat_chunks is not None
    assert len(nat_chunks) == len(py_chunks)
    for a, b in zip(nat_chunks, py_chunks):
        assert (a.path, a.start_line, a.end_line) == (b.path, b.start_line, b.end_line)
        assert a.text == b.text


def test_skips_binary_and_hidden(tmp_path):
    make_tree(tmp_path, SAMPLE)
    (tmp_path / "bin.py").write_bytes(b"\x00\x01binary\x00")
    chunks = collect_chunks_native(tmp_path, ("py", "rs", "md"), 512, 64)
    paths = {c.path for c in chunks}
    assert "bin.py" not in paths
    assert not any(p.startswith(".hidden") or "node_modules" in p for p in paths)


def test_empty_dir(tmp_path):
    assert collect_chunks_native(tmp_path, ("py",), 512, 64) == []


def test_missing_dir_falls_back(tmp_path):
    assert collect_chunks_native(tmp_path / "ghost", ("py",), 512, 64) is None


def test_service_uses_native(tmp_path):
    from islands_tpu.indexer import IndexerConfig, IndexerService

    make_tree(tmp_path / "proj", SAMPLE)
    svc = IndexerService(IndexerConfig(base_path=str(tmp_path / "islands")))
    assert svc.config.use_native_loader
    info = svc.index_local_path(tmp_path / "proj", "proj")
    assert info.num_chunks > 0
    hits = svc.search("hello world", top_k=3)
    assert hits
