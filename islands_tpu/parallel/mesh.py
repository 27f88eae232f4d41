"""Device mesh helpers.

The reference is a single-process tokio app with no distributed compute
(SURVEY.md §2.7); multi-chip scale here is native jax.sharding — shard-by-id
partitioning of the corpus over a mesh axis ("shards") with an optional
data-parallel axis over queries ("dp"). Collectives ride ICI via shard_map.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_shards: int | None = None,
    n_dp: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Create a (shards, dp) mesh. Defaults to all devices on the shard axis."""
    devices = devices if devices is not None else jax.devices()
    if n_shards is None:
        n_shards = len(devices) // n_dp
    used = n_shards * n_dp
    if used > len(devices):
        raise ValueError(
            f"mesh needs {used} devices, only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:used]).reshape(n_shards, n_dp)
    return Mesh(dev_array, axis_names=("shards", "dp"))


def make_multislice_mesh(
    n_slices: int,
    shards_per_slice: int | None = None,
    n_dp: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Create a (slice, shards, dp) mesh for multi-slice deployments.

    The 'slice' axis is the DCN boundary: within a slice, collectives ride
    ICI; across slices they cross the datacenter network. The archipelago
    searcher merges hierarchically — per-shard top-k all-gathered over
    'shards' (ICI) first, then only the per-slice top-k crosses 'slice'
    (DCN), so cross-slice traffic is k results per query rather than the
    full candidate traffic. Axis order follows jax's convention of putting
    the slowest (DCN) axis first so contiguous device blocks share a slice.
    """
    devices = devices if devices is not None else jax.devices()
    if shards_per_slice is None:
        shards_per_slice = len(devices) // (n_slices * n_dp)
    used = n_slices * shards_per_slice * n_dp
    if used > len(devices) or shards_per_slice < 1:
        raise ValueError(
            f"mesh needs {used} devices, only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:used]).reshape(
        n_slices, shards_per_slice, n_dp
    )
    return Mesh(dev_array, axis_names=("slice", "shards", "dp"))
