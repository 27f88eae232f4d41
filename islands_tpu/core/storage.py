"""On-disk index storage: tagged-chunk container with CSR + PQ payloads.

Container framing follows the reference's IndexWriter/IndexReader
(src/core/storage.rs:94-174): each chunk is `4-byte ASCII tag + u64 LE length
+ payload`. The reference only ever implements the META chunk; the graph and
PQ payloads here honor the *specified* binary semantics
(docs/leann-specification.md:969-1027 — header + row_ptr + edges for the
graph, "PQCB" codebook, "PQCD" packed codes) so the on-disk cost stays
4 bytes/edge + codes, with no padded copies (SURVEY.md §7 hard-part #5:
padding exists only in the in-memory device layout).

Also provides `IndexMetadata` and the `StorageBackend`/`FileSystemStorage`
key-value layer (reference: storage.rs:15-92).
"""

from __future__ import annotations

import dataclasses
import io
import json
import struct
import time
from pathlib import Path
from typing import BinaryIO, Protocol

import numpy as np

FORMAT_VERSION = 1

_METRIC_CODES = {"euclidean": 0, "cosine": 1, "dotproduct": 2, "manhattan": 3}
_METRIC_NAMES = {v: k for k, v in _METRIC_CODES.items()}


class StorageError(IOError):
    """Corrupt or unreadable index file (reference: CoreError::Deserialization)."""


# ---------------------------------------------------------------------------
# Metadata + backend (reference: storage.rs:15-92)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class IndexMetadata:
    """Index metadata chunk (reference IndexMetadata: storage.rs:15-48)."""

    version: int = FORMAT_VERSION
    num_vectors: int = 0
    dimension: int = 0
    metric: str = "cosine"
    created_at: float = 0.0
    updated_at: float = 0.0
    extra: dict = dataclasses.field(default_factory=dict)

    @staticmethod
    def new(num_vectors: int, dimension: int, metric: str = "cosine") -> "IndexMetadata":
        now = time.time()
        return IndexMetadata(
            num_vectors=num_vectors, dimension=dimension, metric=metric,
            created_at=now, updated_at=now,
        )

    def touch(self) -> None:
        self.updated_at = time.time()

    def to_json(self) -> bytes:
        return json.dumps(dataclasses.asdict(self)).encode()

    @staticmethod
    def from_json(data: bytes) -> "IndexMetadata":
        return IndexMetadata(**json.loads(data))


class StorageBackend(Protocol):
    """Key-value blob storage (reference StorageBackend trait: storage.rs:51-60)."""

    def save(self, key: str, data: bytes) -> None: ...
    def load(self, key: str) -> bytes: ...
    def exists(self, key: str) -> bool: ...
    def delete(self, key: str) -> None: ...


class FileSystemStorage:
    """Directory-backed storage (reference FileSystemStorage: storage.rs:63-92)."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, key: str) -> Path:
        p = (self.root / key).resolve()
        if self.root.resolve() not in p.parents and p != self.root.resolve():
            raise StorageError(f"key escapes storage root: {key}")
        return p

    def save(self, key: str, data: bytes) -> None:
        p = self._path(key)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(p.suffix + ".tmp")
        tmp.write_bytes(data)
        tmp.replace(p)  # atomic on POSIX

    def load(self, key: str) -> bytes:
        p = self._path(key)
        if not p.exists():
            raise StorageError(f"key not found: {key}")
        return p.read_bytes()

    def exists(self, key: str) -> bool:
        return self._path(key).exists()

    def delete(self, key: str) -> None:
        p = self._path(key)
        if p.exists():
            p.unlink()


# ---------------------------------------------------------------------------
# Tagged-chunk container (reference: storage.rs:94-174)
# ---------------------------------------------------------------------------


class IndexWriter:
    """Chunked writer: tag(4) + u64-LE length + payload per chunk."""

    def __init__(self, stream: BinaryIO):
        self._stream = stream

    def write_chunk(self, tag: bytes, data: bytes) -> None:
        if len(tag) != 4:
            raise StorageError(f"tag must be 4 bytes, got {tag!r}")
        self._stream.write(tag)
        self._stream.write(struct.pack("<Q", len(data)))
        self._stream.write(data)

    def write_metadata(self, metadata: IndexMetadata) -> None:
        self.write_chunk(b"META", metadata.to_json())


class IndexReader:
    """Chunked reader; `read_all` returns {tag: payload} in file order."""

    def __init__(self, stream: BinaryIO):
        self._stream = stream

    def read_chunk(self) -> tuple[bytes, bytes] | None:
        tag = self._stream.read(4)
        if len(tag) == 0:
            return None
        if len(tag) != 4:
            raise StorageError("truncated chunk tag")
        len_bytes = self._stream.read(8)
        if len(len_bytes) != 8:
            raise StorageError("truncated chunk length")
        (length,) = struct.unpack("<Q", len_bytes)
        data = self._stream.read(length)
        if len(data) != length:
            raise StorageError(f"truncated chunk payload for {tag!r}")
        return tag, data

    def read_all(self) -> dict[bytes, bytes]:
        chunks: dict[bytes, bytes] = {}
        while (c := self.read_chunk()) is not None:
            chunks[c[0]] = c[1]
        return chunks

    def read_metadata(self) -> IndexMetadata:
        c = self.read_chunk()
        if c is None or c[0] != b"META":
            raise StorageError("expected META chunk")
        return IndexMetadata.from_json(c[1])


# ---------------------------------------------------------------------------
# Payload codecs (spec file formats: docs/leann-specification.md:969-1027)
# ---------------------------------------------------------------------------

_GRPH_HEADER = struct.Struct("<4sIQIiiBI")  # magic, ver, n, max_deg, entry, max_level, metric, dim


def encode_graph(graph, metric: str, dimension: int) -> bytes:
    """CsrGraph -> true-CSR bytes: header + row_ptr u64 + edges i32 + levels i32.

    4 bytes/edge on disk (reference storage claim leann.rs:180-191); the
    padded [N, M] device layout is never serialized.
    """
    offsets, flat, levels = graph.to_csr_arrays()
    buf = io.BytesIO()
    buf.write(
        _GRPH_HEADER.pack(
            b"LEGR", FORMAT_VERSION, graph.num_nodes, graph.max_degree,
            int(graph.entry_point), int(graph.max_level),
            _METRIC_CODES.get(metric, 1), dimension,
        )
    )
    buf.write(np.ascontiguousarray(offsets, dtype="<u8").tobytes())
    buf.write(np.ascontiguousarray(flat, dtype="<i4").tobytes())
    buf.write(np.ascontiguousarray(levels, dtype="<i4").tobytes())
    return buf.getvalue()


def decode_graph(data: bytes):
    from islands_tpu.core.csr import CsrGraph

    magic, ver, n, max_deg, entry, max_level, metric_code, dim = _GRPH_HEADER.unpack_from(data)
    if magic != b"LEGR":
        raise StorageError(f"bad graph magic {magic!r}")
    if ver != FORMAT_VERSION:
        raise StorageError(f"unsupported graph version {ver}")
    off = _GRPH_HEADER.size
    offsets = np.frombuffer(data, dtype="<u8", count=n + 1, offset=off).astype(np.int64)
    off += (n + 1) * 8
    num_edges = int(offsets[-1]) if n > 0 else 0
    flat = np.frombuffer(data, dtype="<i4", count=num_edges, offset=off)
    off += num_edges * 4
    levels = np.frombuffer(data, dtype="<i4", count=n, offset=off)
    graph = CsrGraph.from_csr_arrays(
        offsets, flat, levels, entry_point=entry, max_level=max_level,
        max_degree=max_deg,
    )
    return graph, _METRIC_NAMES.get(metric_code, "cosine"), dim


_PQCB_HEADER = struct.Struct("<4sIIIH")  # magic, ver, num_sq, num_centroids, sub_dim


def encode_pq_codebook(centroids: np.ndarray) -> bytes:
    """[S, K, sd] f32 -> "PQCB" payload (spec: .pq format)."""
    s, k, sd = centroids.shape
    buf = io.BytesIO()
    buf.write(_PQCB_HEADER.pack(b"PQCB", FORMAT_VERSION, s, k, sd))
    buf.write(np.ascontiguousarray(centroids, dtype="<f4").tobytes())
    return buf.getvalue()


def decode_pq_codebook(data: bytes) -> np.ndarray:
    magic, ver, s, k, sd = _PQCB_HEADER.unpack_from(data)
    if magic != b"PQCB":
        raise StorageError(f"bad codebook magic {magic!r}")
    arr = np.frombuffer(data, dtype="<f4", count=s * k * sd, offset=_PQCB_HEADER.size)
    return arr.reshape(s, k, sd).copy()


_PQCD_HEADER = struct.Struct("<4sIQIB")  # magic, ver, num_vectors, num_sq, code_bytes


def encode_pq_codes(codes: np.ndarray) -> bytes:
    """[n, S] u8/u16 -> "PQCD" payload, packed row-major (spec: .codes)."""
    n, s = codes.shape
    code_bytes = codes.dtype.itemsize
    buf = io.BytesIO()
    buf.write(_PQCD_HEADER.pack(b"PQCD", FORMAT_VERSION, n, s, code_bytes))
    dt = "<u1" if code_bytes == 1 else "<u2"
    buf.write(np.ascontiguousarray(codes, dtype=dt).tobytes())
    return buf.getvalue()


def decode_pq_codes(data: bytes) -> np.ndarray:
    magic, ver, n, s, code_bytes = _PQCD_HEADER.unpack_from(data)
    if magic != b"PQCD":
        raise StorageError(f"bad codes magic {magic!r}")
    dt = "<u1" if code_bytes == 1 else "<u2"
    arr = np.frombuffer(data, dtype=dt, count=n * s, offset=_PQCD_HEADER.size)
    return arr.reshape(n, s).copy()


_SKCH_HEADER = struct.Struct("<4sIQII")  # magic, ver, n, dim, proj_dims


def encode_sketch(sketch) -> bytes:
    """SketchIndex -> "SKCH" payload: scale f32 + W f32 [dim, P] + per-node
    packed sketches i32 [n, P/4]. The inline neighbor blocks are NOT stored —
    they are derived from (node_sketch, graph.neighbors) at load time, so the
    on-disk sketch cost is P bytes/vector."""
    w = np.asarray(sketch.w, dtype=np.float32)
    node = np.asarray(sketch.node_sketch, dtype=np.int32)
    dim, p = w.shape
    buf = io.BytesIO()
    buf.write(_SKCH_HEADER.pack(b"SKCH", FORMAT_VERSION, node.shape[0], dim, p))
    buf.write(struct.pack("<f", float(sketch.scale)))
    buf.write(np.ascontiguousarray(w, dtype="<f4").tobytes())
    buf.write(np.ascontiguousarray(node, dtype="<i4").tobytes())
    return buf.getvalue()


def decode_sketch(data: bytes, neighbors):
    """-> SketchIndex with inline neighbor blocks rebuilt row-aligned with
    `neighbors` (int32 [n, m] device array)."""
    import jax.numpy as jnp

    from islands_tpu.ops.proj import PACK, SketchIndex

    magic, ver, n, dim, p = _SKCH_HEADER.unpack_from(data)
    if magic != b"SKCH":
        raise StorageError(f"bad sketch magic {magic!r}")
    if ver != FORMAT_VERSION:
        raise StorageError(f"unsupported sketch format version {ver}")
    off = _SKCH_HEADER.size
    (scale,) = struct.unpack_from("<f", data, off)
    off += 4
    w = np.frombuffer(data, dtype="<f4", count=dim * p, offset=off).reshape(dim, p)
    off += dim * p * 4
    node = np.frombuffer(data, dtype="<i4", count=n * (p // PACK), offset=off)
    node = node.reshape(n, p // PACK)
    node_dev = jnp.asarray(node)
    nbr = node_dev[jnp.clip(neighbors, 0, max(n - 1, 0))].reshape(
        neighbors.shape[0], -1
    )
    return SketchIndex(
        w=jnp.asarray(w.copy()),
        scale=jnp.float32(scale),
        node_sketch=node_dev,
        nbr_sketch=nbr,
    )


# ---------------------------------------------------------------------------
# High-level LeannIndex save/load
# ---------------------------------------------------------------------------


def save_index(index, path: str | Path, persist_sketch: bool = True) -> int:
    """Serialize a LeannIndex (graph + optional PQ + config) to `path`.
    Returns bytes written — the real on-disk size (the 'index bytes/vector'
    metric charges this file).

    `persist_sketch=False` is storage-parity mode: the SKCH chunk is
    skipped, bringing the file to the reference's CSR-only layout
    (leann.rs:180-191, ~4 B/edge). The sketch is deterministically
    re-derivable at load from stored embeddings + the loaded graph via
    `ops.proj.build_sketch_index(x_prepped, graph.neighbors, proj_dims,
    seed)` — the construction-time sketch uses the identical recipe
    (build.py:686-695: make_projection(config.seed) -> fit_scale over the
    corpus -> quantize_pack), so the re-derived gate searches the same
    index (tests/test_storage.py::test_storage_parity_sketch_rederivation).
    """
    import dataclasses as dc

    from islands_tpu.core.config import LeannConfig

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    graph = index.graph
    if graph is None:
        raise StorageError("index is not built")
    metric = getattr(index.config.metric, "value", str(index.config.metric))
    meta = IndexMetadata.new(graph.num_nodes, index.dimension or 0, metric)
    cfg = dc.asdict(index.config)
    cfg["metric"] = metric
    cfg["pruning_strategy"] = getattr(
        index.config.pruning_strategy, "value", str(index.config.pruning_strategy)
    )
    meta.extra["config"] = cfg

    buf = io.BytesIO()
    w = IndexWriter(buf)
    w.write_metadata(meta)
    w.write_chunk(b"GRPH", encode_graph(graph, metric, index.dimension or 0))
    if index.pq is not None and index.pq_codes is not None:
        w.write_chunk(b"PQCB", encode_pq_codebook(np.asarray(index.pq.codebook.centroids)))
        w.write_chunk(b"PQCD", encode_pq_codes(np.asarray(index.pq_codes)))
    if persist_sketch and getattr(index, "sketch", None) is not None:
        w.write_chunk(b"SKCH", encode_sketch(index.sketch))
    data = buf.getvalue()
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)
    return len(data)


def load_index(path: str | Path):
    """Load a LeannIndex saved by `save_index` (round-trip tested)."""
    import jax.numpy as jnp

    from islands_tpu.core.config import (
        DistanceMetric,
        LeannConfig,
        PQConfig,
        PruningStrategy,
    )
    from islands_tpu.core.leann import LeannIndex
    from islands_tpu.core.pq import PQCodebook, ProductQuantizer

    data = Path(path).read_bytes()
    chunks = IndexReader(io.BytesIO(data)).read_all()
    if b"META" not in chunks or b"GRPH" not in chunks:
        raise StorageError("missing META/GRPH chunk")
    meta = IndexMetadata.from_json(chunks[b"META"])

    cfg_dict = dict(meta.extra.get("config", {}))
    if cfg_dict:
        cfg_dict["metric"] = DistanceMetric(cfg_dict.get("metric", "cosine"))
        cfg_dict["pruning_strategy"] = PruningStrategy(
            cfg_dict.get("pruning_strategy", "global")
        )
        # Forward compatibility: ignore config keys from older format
        # revisions (e.g. round 1's pq_build flags).
        import dataclasses as _dc

        known = {f.name for f in _dc.fields(LeannConfig)}
        config = LeannConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    else:
        config = LeannConfig()
    index = LeannIndex(config)
    graph, metric_name, dim = decode_graph(chunks[b"GRPH"])
    index.graph = graph
    index.dimension = dim or meta.dimension or None

    if b"PQCB" in chunks and b"PQCD" in chunks:
        centroids = decode_pq_codebook(chunks[b"PQCB"])
        codes = decode_pq_codes(chunks[b"PQCD"])
        s, k, sd = centroids.shape
        pq = ProductQuantizer(PQConfig(num_subquantizers=s, num_centroids=k))
        pq.codebook = PQCodebook(centroids=jnp.asarray(centroids))
        pq._dimension = s * sd
        index.pq = pq
        index.pq_codes = jnp.asarray(codes)
    if b"SKCH" in chunks:
        index.sketch = decode_sketch(chunks[b"SKCH"], graph.neighbors)
        index._init_routing()
    return index


# ---------------------------------------------------------------------------
# HnswIndex save/load (reference serializes HnswGraph whole, hnsw.rs:507-514;
# here the container gets one GRPH chunk per layer plus the stored vectors —
# HNSW's storage contract keeps full embeddings, unlike LEANN)
# ---------------------------------------------------------------------------


def save_hnsw(index, path: str | Path) -> int:
    """Serialize an HnswIndex (embeddings + layer 0 + upper layers + config).
    Returns bytes written."""
    import dataclasses as dc

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if index.layer0 is None:
        raise StorageError("index is not built")
    metric = getattr(index.config.metric, "value", str(index.config.metric))
    meta = IndexMetadata.new(index.num_nodes, index.dimension or 0, metric)
    cfg = dc.asdict(index.config)
    cfg["metric"] = metric
    meta.extra["config"] = cfg
    meta.extra["num_upper_layers"] = len(index.layers)

    buf = io.BytesIO()
    w = IndexWriter(buf)
    w.write_metadata(meta)
    # layer0 is built with all-zero levels (to keep the flat sub-build from
    # recursing); serialize it with the INDEX-level levels/entry so the
    # loaded graph carries the true hierarchy metadata.
    import jax.numpy as jnp

    from islands_tpu.core.csr import CsrGraph as _CsrGraph

    g0 = _CsrGraph(
        neighbors=index.layer0.neighbors,
        degrees=index.layer0.degrees,
        levels=jnp.asarray(index.levels),
        entry_point=jnp.int32(index.entry_point),
        max_level=jnp.int32(index.max_level),
    )
    w.write_chunk(b"GRPH", encode_graph(g0, metric, index.dimension or 0))
    # Stored vectors (prepped corpus): HNSW answers queries from these.
    w.write_chunk(
        b"EMBS", np.ascontiguousarray(np.asarray(index.x), dtype="<f4").tobytes()
    )
    for li, layer in enumerate(index.layers):
        lbuf = io.BytesIO()
        ids = np.asarray(layer.ids, dtype="<i4")
        nbrs = np.asarray(layer.neighbors, dtype="<i4")
        lbuf.write(struct.pack("<QI", ids.shape[0], nbrs.shape[1]))
        lbuf.write(ids.tobytes())
        lbuf.write(np.ascontiguousarray(nbrs).tobytes())
        w.write_chunk(b"HL%02d" % li, lbuf.getvalue())
    data = buf.getvalue()
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)
    return len(data)


def load_hnsw(path: str | Path):
    """Load an HnswIndex saved by `save_hnsw` (round-trip tested)."""
    import jax.numpy as jnp

    from islands_tpu.core.config import DistanceMetric, HnswConfig
    from islands_tpu.core.csr import SENTINEL
    from islands_tpu.core.hnsw import HnswIndex, HnswLayer

    data = Path(path).read_bytes()
    chunks = IndexReader(io.BytesIO(data)).read_all()
    if b"META" not in chunks or b"GRPH" not in chunks or b"EMBS" not in chunks:
        raise StorageError("missing META/GRPH/EMBS chunk")
    meta = IndexMetadata.from_json(chunks[b"META"])
    cfg_dict = dict(meta.extra.get("config", {}))
    if cfg_dict:
        cfg_dict["metric"] = DistanceMetric(cfg_dict.get("metric", "cosine"))
        import dataclasses as _dc

        known = {f.name for f in _dc.fields(HnswConfig)}
        config = HnswConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    else:
        config = HnswConfig()
    index = HnswIndex(config)
    graph, metric_name, dim = decode_graph(chunks[b"GRPH"])
    n = graph.num_nodes
    x = np.frombuffer(chunks[b"EMBS"], dtype="<f4").reshape(n, dim)
    index.x = jnp.asarray(x.copy())
    index.dimension = dim
    index.layer0 = graph
    index.levels = np.asarray(graph.levels)
    index.max_level = int(graph.max_level)
    index.entry_point = int(graph.entry_point)
    index.layers = []
    for li in range(int(meta.extra.get("num_upper_layers", 0))):
        payload = chunks[b"HL%02d" % li]
        n_l, m_l = struct.unpack_from("<QI", payload)
        off = struct.calcsize("<QI")
        ids = np.frombuffer(payload, dtype="<i4", count=n_l, offset=off).copy()
        off += n_l * 4
        nbrs = np.frombuffer(
            payload, dtype="<i4", count=n_l * m_l, offset=off
        ).reshape(n_l, m_l)
        g2l = np.full(n, SENTINEL, dtype=np.int32)
        g2l[ids] = np.arange(n_l, dtype=np.int32)
        x_local = index.x[jnp.asarray(ids)]
        index.layers.append(
            HnswLayer(ids, jnp.asarray(nbrs.copy()), g2l, x_local)
        )
    return index
