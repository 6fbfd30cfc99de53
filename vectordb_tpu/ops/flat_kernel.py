"""Pallas two-phase exact flat search: streamed tile-min scan + refine.

The XLA path (ops/topk.py) materializes the full (Q, N) distance matrix in
HBM before top-k — an extra 2*Q*N*4 bytes of traffic at large N. This
module replaces it with an exact two-phase algorithm built around a Pallas
kernel:

Phase A (Pallas): stream the packed database through VMEM in row tiles;
  for each tile compute the (Q, TN) distance block on the MXU and reduce it
  to a per-tile minimum — only (Q, T) minima ever leave the kernel
  (T = N/TN), so HBM traffic is one read of the database, full stop.

Phase B (XLA): take each query's k best tiles by minimum. Claim: the true
  top-k rows live in those tiles. Proof: if a row r with distance d(r) sits
  in a tile outside the chosen k, then all k chosen tiles have minima
  <= d(r), i.e. each contains at least one row at distance <= d(r) —
  k rows beat r, so r is not in the top-k. Gather those k*TN rows per
  query, recompute exact distances, and run a small exact top-k.

Cosine is reduced to the dot mode: 1 - q.x/(|q||x|) is a monotonic
transform of -(q/|q|).x for fixed q, so ranking (and the refine) uses
normalized dots and the final distances are recovered at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..distance import DistanceMetric

# Penalty added to invalid slots: large enough to push them past any real
# distance, small enough to stay far from f32 inf arithmetic.
_INVALID_PENALTY = 1e30

DEFAULT_TILE_ROWS = 512


def _scan_min_kernel(q_ref, qsq_ref, db_ref, sq_ref, invalid_ref, out_ref,
                     *, mode: str):
    """One grid step: distances of all queries to one row tile -> tile min.

    q_ref: (Q, d) queries (same block every step)
    qsq_ref: (Q, 1) query squared norms (euclidean) or norms (cosine)
    db_ref: (TN, d) row tile
    sq_ref: (TN, 1) row squared norms (euclidean) or norms (cosine)
    invalid_ref: (TN, 1) 0.0 for live rows, 1.0 for dead/padded rows
    out_ref: (T, Q) minima, resident in VMEM across the whole grid; each
             step writes its own row (Mosaic requires lane-aligned output
             blocks, so a (Q, 1) per-step block is not expressible).
    """
    dots = jax.lax.dot_general(
        q_ref[:], db_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, TN)
    penalty = invalid_ref[:].reshape(1, -1) * _INVALID_PENALTY
    if mode == "euclidean":
        d2 = qsq_ref[:] + sq_ref[:].reshape(1, -1) - 2.0 * dots
        dists = jnp.maximum(d2, 0.0) + penalty
    elif mode == "dot":
        dists = -dots + penalty
    else:  # cosine: sq_ref/qsq_ref carry *norms*; invalid handled by penalty
        denom = qsq_ref[:] * sq_ref[:].reshape(1, -1)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        dists = -(dots / denom) + penalty
    i = pl.program_id(0)
    out_ref[pl.ds(i, 1), :] = jnp.min(dists, axis=1, keepdims=True).T


def tile_minima(queries, qaux, db, raux, invalidf, mode: str,
                tile_rows: int = DEFAULT_TILE_ROWS, interpret: bool = False):
    """Phase A: (Q, T) per-tile distance minima via the Pallas scan."""
    q, d = queries.shape
    n = db.shape[0]
    assert n % tile_rows == 0, "capacity must be a multiple of the tile size"
    t = n // tile_rows

    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        # minima stay VMEM-resident across all grid steps (t*q*4 bytes)
        out_specs=pl.BlockSpec((t, q), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_scan_min_kernel, mode=mode)
    minima_tq = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, q), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=n * d * 4 + q * d * 4 + q * t * 4,
            transcendentals=0,
        ),
    )(queries, qaux.reshape(q, 1), db, raux.reshape(n, 1),
      invalidf.reshape(n, 1))
    return minima_tq.T


@functools.partial(jax.jit,
                   static_argnames=("metric_name", "k", "tile_rows",
                                    "interpret"))
def two_phase_search(queries, db, db_sq_norms, db_norms, valid,
                     metric_name: str, k: int,
                     tile_rows: int = DEFAULT_TILE_ROWS,
                     interpret: bool = False):
    """Exact (dists, idx) top-k via tile-min filter + refine.

    Same contract as ops.topk.flat_search: ascending distances, +inf for
    missing rows (fewer than k live rows).
    """
    metric = DistanceMetric(metric_name)
    q, d = queries.shape
    n = db.shape[0]
    t = n // tile_rows
    invalidf = 1.0 - valid.astype(jnp.float32)

    if metric is DistanceMetric.EUCLIDEAN:
        mode = "euclidean"
        qaux = jnp.sum(queries * queries, axis=1)
        raux = db_sq_norms
    elif metric is DistanceMetric.DOT_PRODUCT:
        mode = "dot"
        qaux = jnp.zeros((q,), jnp.float32)
        raux = jnp.zeros((n,), jnp.float32)
    else:
        mode = "cosine"
        qaux = jnp.sqrt(jnp.sum(queries * queries, axis=1))
        raux = db_norms

    minima = tile_minima(queries, qaux, db, raux, invalidf, mode,
                         tile_rows, interpret)  # (Q, T)

    # Phase B: k best tiles per query provably contain the exact top-k.
    kt = min(k, t)
    _, tile_idx = jax.lax.top_k(-minima, kt)          # (Q, kt)
    row_offsets = jnp.arange(tile_rows, dtype=jnp.int32)
    cand_rows_all = (tile_idx[:, :, None] * tile_rows
                     + row_offsets[None, None, :]).reshape(q, kt * tile_rows)
    k_eff = min(k, kt * tile_rows)

    def refine_chunk(args):
        """Exact re-rank for one query chunk — chunked so the candidate
        gather stays O(chunk * k * tile_rows * d) instead of Q-sized."""
        queries_c, qaux_c, cand_rows = args
        cand_db = db[cand_rows]                        # (C, kc, d)
        # highest precision: default MXU passes are bf16-grade, which would
        # break the exact-distance contract of the refine (see ops/topk.py)
        cand_dots = jnp.einsum("qcd,qd->qc", cand_db, queries_c,
                               preferred_element_type=jnp.float32,
                               precision="highest")
        cand_penalty = invalidf[cand_rows] * _INVALID_PENALTY
        if mode == "euclidean":
            cand_d = (qaux_c[:, None] + db_sq_norms[cand_rows]
                      - 2.0 * cand_dots)
            cand_d = jnp.maximum(cand_d, 0.0) + cand_penalty
        elif mode == "dot":
            cand_d = -cand_dots + cand_penalty
        else:
            denom = qaux_c[:, None] * db_norms[cand_rows]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            cand_d = -(cand_dots / denom) + cand_penalty
        neg_best, pos = jax.lax.top_k(-cand_d, k_eff)
        return -neg_best, jnp.take_along_axis(cand_rows, pos, axis=1)

    chunk = min(q, 128)
    if q % chunk == 0 and q > chunk:
        best, idx = jax.lax.map(refine_chunk, (
            queries.reshape(q // chunk, chunk, d),
            qaux.reshape(q // chunk, chunk),
            cand_rows_all.reshape(q // chunk, chunk, kt * tile_rows)))
        best = best.reshape(q, k_eff)
        idx = idx.reshape(q, k_eff)
    else:
        best, idx = refine_chunk((queries, qaux, cand_rows_all))

    # restore true distance values + inf for dead entries
    dead = best >= _INVALID_PENALTY * 0.5
    if mode == "euclidean":
        final = jnp.sqrt(jnp.maximum(best, 0.0))
    elif mode == "dot":
        final = best
    else:
        # best = -similarity; clamp like the scalar path (distance.rs:61)
        final = 1.0 + jnp.clip(best, -1.0, 1.0)
    final = jnp.where(dead, jnp.inf, final)
    return final, idx


__all__ = ["two_phase_search", "tile_minima", "DEFAULT_TILE_ROWS"]
