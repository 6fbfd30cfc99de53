"""Donated in-place scatter updates for device-resident packed buffers.

Insert/delete against the packed ``f32[capacity, d]`` database never
re-uploads the whole matrix: host bookkeeping queues dirty slots and these
jitted, buffer-donating scatters patch the device copy in place
(XLA turns ``.at[idx].set`` with a donated operand into an in-place
dynamic-update). This is the TPU-native answer to the reference's
HashMap insert/remove (src/flat_index.rs:38-50).
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.jit, donate_argnums=(0,))
def scatter_rows(buf, idx, rows):
    """buf (N, d) <- rows (m, d) at row positions idx (m,). Donates buf."""
    return buf.at[idx].set(rows)


@functools.partial(jax.jit, donate_argnums=(0,))
def scatter_values(buf, idx, values):
    """buf (N,) <- values (m,) at positions idx (m,). Donates buf."""
    return buf.at[idx].set(values)


# Non-donating variants: used while concurrent readers may still hold the
# old buffers (donation would invalidate them mid-flight). Costs one device
# copy of the buffer.
@jax.jit
def scatter_rows_copy(buf, idx, rows):
    return buf.at[idx].set(rows)


@jax.jit
def scatter_values_copy(buf, idx, values):
    return buf.at[idx].set(values)


__all__ = ["scatter_rows", "scatter_values", "scatter_rows_copy",
           "scatter_values_copy"]
