"""Device-side array ops: fused distance + top-k flat scan, scatter updates.

This package is the TPU compute path of the framework. The reference's hot
loop (src/flat_index.rs:52-65 — per-row scalar distance + full sort) is
re-expressed here as MXU matmuls with fused masked top-k, and in-place
packed-buffer maintenance via donated scatter updates.
"""

from .topk import flat_search, flat_search_batched, next_pow2  # noqa: F401
from .update import scatter_rows, scatter_values  # noqa: F401
