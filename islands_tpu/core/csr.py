"""Proximity-graph storage: padded fixed-degree device layout + true CSR.

The reference stores the graph as ragged CSR (node_offsets/neighbors,
src/core/leann.rs:192-308). Ragged rows are hostile to XLA's static shapes, so
on device we keep a padded [N, M] int32 neighbor matrix with sentinel -1 —
construction already bounds degree at m0, so padding costs at most
(m0 - avg_degree) * 4 bytes/node in HBM and nothing on disk: serialization
converts back to true CSR (4 bytes/edge, matching the reference's storage
claim at leann.rs:180-191).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = -1


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CsrGraph:
    """Device-resident proximity graph.

    Fields (reference CsrGraph: leann.rs:192-208):
    - neighbors: int32 [N, max_degree], row i = neighbor ids of node i,
      padded with SENTINEL (-1).
    - degrees:   int32 [N], valid entries per row (degree_counts in reference).
    - levels:    int32 [N], HNSW level per node. The LEANN search is flat
      (leann.rs:899-988 never consults levels); levels only determine the
      entry point (max level wins, leann.rs:610-613).
    - entry_point: int32 scalar, SENTINEL if empty.
    - max_level: int32 scalar.
    """

    neighbors: jax.Array
    degrees: jax.Array
    levels: jax.Array
    entry_point: jax.Array
    max_level: jax.Array

    # -- pytree protocol --
    def tree_flatten(self):
        children = (self.neighbors, self.degrees, self.levels, self.entry_point, self.max_level)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors --
    @staticmethod
    def empty(num_nodes: int, max_degree: int) -> "CsrGraph":
        return CsrGraph(
            neighbors=jnp.full((num_nodes, max_degree), SENTINEL, dtype=jnp.int32),
            degrees=jnp.zeros((num_nodes,), dtype=jnp.int32),
            levels=jnp.zeros((num_nodes,), dtype=jnp.int32),
            entry_point=jnp.int32(SENTINEL),
            max_level=jnp.int32(0),
        )

    @staticmethod
    def from_adjacency(
        adjacency: Sequence[Sequence[int]],
        levels: Sequence[int] | None = None,
        max_degree: int | None = None,
    ) -> "CsrGraph":
        """Build from a host adjacency list (test/interop path)."""
        n = len(adjacency)
        if max_degree is None:
            max_degree = max((len(a) for a in adjacency), default=0)
        max_degree = max(max_degree, 1)
        nbrs = np.full((n, max_degree), SENTINEL, dtype=np.int32)
        degs = np.zeros((n,), dtype=np.int32)
        for i, row in enumerate(adjacency):
            row = list(row)[:max_degree]
            nbrs[i, : len(row)] = row
            degs[i] = len(row)
        lvls = np.asarray(levels if levels is not None else np.zeros(n), dtype=np.int32)
        if n > 0:
            max_level = int(lvls.max())
            # First node with the max level (matches insertion-order update
            # rule `level > max_level` at leann.rs:610-613).
            entry = int(np.argmax(lvls == max_level))
        else:
            max_level, entry = 0, SENTINEL
        return CsrGraph(
            neighbors=jnp.asarray(nbrs),
            degrees=jnp.asarray(degs),
            levels=jnp.asarray(lvls),
            entry_point=jnp.int32(entry),
            max_level=jnp.int32(max_level),
        )

    # -- properties --
    @property
    def num_nodes(self) -> int:
        return self.neighbors.shape[0]

    @property
    def max_degree(self) -> int:
        return self.neighbors.shape[1]

    def get_neighbors(self, node_id: int) -> np.ndarray:
        """Host-side neighbor fetch (reference: leann.rs:225-233)."""
        row = np.asarray(self.neighbors[node_id])
        return row[row != SENTINEL]

    def validate(self) -> None:
        """Structural invariant checks (the sanitizer role — the reference
        relies on Rust's type system; here invariants are explicit):
        ids in range, no self-loops, degrees consistent with sentinel layout,
        entry point valid. Raises ValueError on violation."""
        nbrs = np.asarray(self.neighbors)
        degs = np.asarray(self.degrees)
        n, md = nbrs.shape
        if n == 0:
            return
        valid_mask = np.arange(md)[None, :] < degs[:, None]
        vals = nbrs[valid_mask]
        if vals.size and (vals.min() < 0 or vals.max() >= n):
            raise ValueError("neighbor id out of range")
        if np.any(nbrs[~valid_mask] != SENTINEL):
            raise ValueError("non-sentinel entry beyond row degree")
        rows, cols = np.nonzero(nbrs == np.arange(n)[:, None])
        if rows.size:
            raise ValueError(f"self-loop at node {rows[0]}")
        ep = int(self.entry_point)
        if not 0 <= ep < n:
            raise ValueError(f"entry point {ep} out of range")

    def storage_bytes(self) -> int:
        """True CSR storage cost: 4 bytes/edge + offsets + levels
        (reference: leann.rs:295-301, but with int32 not usize/u64)."""
        num_edges = int(jnp.sum(self.degrees))
        return 4 * num_edges + 4 * (self.num_nodes + 1) + 4 * self.num_nodes

    # -- true-CSR interop (the on-disk layout; see core/storage.py) --
    def to_csr_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (node_offsets [N+1] int64, flat_neighbors [E] int32,
        levels [N] int32) — the reference's ragged layout. Vectorized mask
        select (row-major order == per-row valid prefixes)."""
        nbrs = np.asarray(self.neighbors)
        degs = np.asarray(self.degrees)
        offsets = np.zeros(self.num_nodes + 1, dtype=np.int64)
        np.cumsum(degs, out=offsets[1:])
        valid = np.arange(self.max_degree)[None, :] < degs[:, None]
        flat = nbrs[valid].astype(np.int32)
        return offsets, flat, np.asarray(self.levels)

    @staticmethod
    def from_csr_arrays(
        offsets: np.ndarray,
        flat_neighbors: np.ndarray,
        levels: np.ndarray,
        entry_point: int,
        max_level: int,
        max_degree: int | None = None,
    ) -> "CsrGraph":
        n = len(offsets) - 1
        degs = np.diff(offsets).astype(np.int32)
        md = int(degs.max()) if (max_degree is None and n > 0) else (max_degree or 1)
        md = max(md, 1)
        nbrs = np.full((n, md), SENTINEL, dtype=np.int32)
        valid = np.arange(md)[None, :] < degs[:, None]
        nbrs[valid] = np.asarray(flat_neighbors, dtype=np.int32)
        return CsrGraph(
            neighbors=jnp.asarray(nbrs),
            degrees=jnp.asarray(degs),
            levels=jnp.asarray(levels, dtype=jnp.int32),
            entry_point=jnp.int32(entry_point),
            max_level=jnp.int32(max_level),
        )
