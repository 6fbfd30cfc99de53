"""vectordb_tpu — a TPU-native vector database framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
the reference Rust implementation (Ricoledan/vectordb-from-scratch): packed
device-resident vector storage, exact flat scan on the MXU, HNSW approximate
search, metadata filters compiled to device masks, WAL + snapshot
durability, an HTTP API, a CLI, and multi-chip sharded search via
jax.sharding meshes.

Public surface mirrors the reference crate root (src/lib.rs:30-47).
"""

from .distance import (DistanceMetric, cosine_distance, dot_product,  # noqa: F401
                       euclidean_distance)
from .errors import (DimensionMismatchError, IndexOpError,  # noqa: F401
                     InvalidVectorError, SerializationError, StorageError,
                     VdbIoError, VectorDbError, VectorNotFoundError)
from .index import (FlatIndex, HnswIndex, HnswParams, Index,  # noqa: F401
                    IvfFlatIndex, IvfPqIndex, PqFlatIndex)
from .metadata import Metadata, MetadataFilter  # noqa: F401
from .metrics import MetricsCollector  # noqa: F401
from .store import BatchInsertItem, SearchResult, VectorStore  # noqa: F401
from .vector import Vector  # noqa: F401

__version__ = "0.1.0"
