"""Multi-chip parallelism: device meshes and the sharded archipelago index."""

from islands_tpu.parallel.mesh import make_mesh
from islands_tpu.parallel.sharded import ArchipelagoSearcher, ShardedIndex, build_sharded

__all__ = ["ArchipelagoSearcher", "ShardedIndex", "build_sharded", "make_mesh"]
