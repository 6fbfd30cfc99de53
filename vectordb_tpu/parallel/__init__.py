"""Multi-chip scaling: device meshes, sharded storage, distributed top-k.

The reference is single-process/single-node (SURVEY §2 parallelism
checklist); this package is the TPU-native scaling story: the packed
database's row axis is sharded across a jax.sharding.Mesh, each chip runs
the local fused scan, and a k-sized merge rides the ICI — the psum-free
distributed top-k.
"""

from .mesh import make_mesh  # noqa: F401
from .distributed import (DistributedFlatIndex, make_sharded_search,  # noqa: F401
                          make_sharded_search_coarse, shard_rows)
from .hnsw_shards import ShardedHnswIndex  # noqa: F401
