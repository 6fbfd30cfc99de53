"""Fused flat-scan distance + top-k on device.

Replaces the reference's brute-force scan (src/flat_index.rs:52-65: distance
to every row, full O(n log n) sort, truncate to k) with a single jitted XLA
program per (capacity, d, Q, k, metric) signature:

    (Q, d) @ (d, N) matmul on the MXU
    -> norm corrections fused on the VPU
    -> invalid/filtered slots masked to +inf
    -> jax.lax.top_k   (O(n k) on device, no host round-trip)

Shapes are bucketed to powers of two so the jit cache stays small while
arbitrary Q / k keep working. A Pallas streaming kernel for very large N
lives in ops/flat_kernel.py; this module is the portable XLA path and the
dispatch point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..distance import DistanceMetric, pairwise_distances


def next_pow2(n: int, floor: int = 1) -> int:
    n = max(int(n), floor)
    return 1 << (n - 1).bit_length()


# "highest" = exact f32 accumulation on the MXU (bf16x6 passes on TPU).
# The flat index's contract is exactness, so this is the default; swap to
# "default" for a ~3x faster approximate scan.
MATMUL_PRECISION = "highest"


@functools.partial(jax.jit, static_argnames=("metric_name", "k"))
def _flat_search_jit(queries, db, db_sq_norms, db_norms, valid, metric_name, k):
    """queries (Q, d), db (N, d), valid bool (N,) -> (dists (Q,k) asc, idx (Q,k))."""
    metric = DistanceMetric(metric_name)
    dists = pairwise_distances(
        jnp, queries, db, metric, db_sq_norms=db_sq_norms, db_norms=db_norms,
        precision=MATMUL_PRECISION,
    )
    dists = jnp.where(valid[None, :], dists, jnp.inf)
    neg_vals, idx = jax.lax.top_k(-dists, k)
    return -neg_vals, idx


def flat_search(queries, db, db_sq_norms, db_norms, valid,
                metric: DistanceMetric, k: int):
    """Single fused search call. All array args device-resident (or numpy).

    ``k`` must be <= db.shape[0]; invalid slots come back with distance +inf
    and must be dropped by the caller.
    """
    return _flat_search_jit(queries, db, db_sq_norms, db_norms, valid,
                            metric.value, int(k))


def flat_search_batched(queries_np: np.ndarray, device_state: dict,
                        metric: DistanceMetric, k: int):
    """Bucketed entry point used by FlatIndex.

    Pads Q up to a power of two and buckets k to bound jit recompiles, then
    returns host numpy (dists, idx) trimmed back to the true Q. Entries with
    dist == +inf are "missing" (fewer than k live rows).
    """
    capacity = int(device_state["db"].shape[0])
    q = queries_np.shape[0]
    q_pad = next_pow2(q, floor=1)
    if q_pad != q:
        queries_np = np.concatenate(
            [queries_np, np.zeros((q_pad - q, queries_np.shape[1]),
                                  dtype=queries_np.dtype)], axis=0)
    k_eff = min(next_pow2(k, floor=1), capacity)
    dists, idx = flat_search(
        jnp.asarray(queries_np), device_state["db"], device_state["sq_norms"],
        device_state["norms"], device_state["valid"], metric, k_eff)
    dists = np.asarray(dists)[:q]
    idx = np.asarray(idx)[:q]
    return dists, idx


__all__ = ["flat_search", "flat_search_batched", "next_pow2"]
