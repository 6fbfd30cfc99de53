"""Index layer: pluggable ANN backends over integer internal IDs.

Parity with the reference index layer (src/index.rs, src/flat_index.rs,
src/hnsw/): an abstract ``Index`` contract plus ``FlatIndex`` (exact,
device flat scan) and ``HnswIndex`` (approximate, graph traversal).
``IvfFlatIndex`` goes beyond the reference: a TPU-native inverted-file
index whose k-means build runs on the MXU (seconds for a million rows)
with exact per-candidate refine at search. ``PqFlatIndex`` goes further
on capacity: product-quantized codes on device (1 byte/subspace, decoded
in VMEM by one-hot MXU matmuls) + exact host re-rank — tens of millions
of rows on one chip. ``IvfPqIndex`` composes the two: IVF's cluster
layout + PQ codes over the RESIDUALS, restoring recall on clustered data
where raw-row codes tie.
"""

from .base import Index  # noqa: F401
from .flat import FlatIndex  # noqa: F401
from .hnsw import HnswIndex, HnswParams  # noqa: F401
from .ivf import IvfFlatIndex  # noqa: F401
from .ivfpq import IvfPqIndex  # noqa: F401
from .pq import PqFlatIndex  # noqa: F401
