"""Index layer: pluggable ANN backends over integer internal IDs.

Parity with the reference index layer (src/index.rs, src/flat_index.rs,
src/hnsw/): an abstract ``Index`` contract plus ``FlatIndex`` (exact,
device flat scan) and ``HnswIndex`` (approximate, graph traversal).
"""

from .base import Index  # noqa: F401
from .flat import FlatIndex  # noqa: F401
from .hnsw import HnswIndex, HnswParams  # noqa: F401
