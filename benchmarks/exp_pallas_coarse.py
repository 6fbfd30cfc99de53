"""Experiment 3: fused Pallas coarse kernel on a pre-transposed bf16 hi/lo
database.

Phase 1 (Pallas): grid over column tiles of dbT (d, N); each step does
1 or 3 bf16 MXU passes (hi-only = fast; hi*hi + hi*lo + lo*hi = bf16x3,
f32-grade) + d2 + subtile(16-row)-min, writing only (Q, N/16) minima.
No (Q, N) materialization, no Mosaic transpose copies (layout is already
(d, TN) = natural MXU rhs).

Phase 2 (XLA): top-k tiles + exact f32 refine; for the 3-pass variant a
rigorous rounding-error margin certifies exactness per query.

Run:  python benchmarks/exp_pallas_coarse.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import os
N, D, Q, K = 1 << 20, 768, int(os.environ.get("VDB_Q", 1024)), 10
SUB = 16               # candidate-tile granularity (rows per refine tile)
TN = 512               # db columns per grid step
ITERS = 5
PENALTY = 1e30


def timeit(fn, qbase, iters=ITERS):
    np.asarray(jax.tree_util.tree_leaves(fn(qbase))[0])
    times = []
    for i in range(iters):
        q = qbase + np.float32(i + 1)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(q))[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def _coarse_kernel(qhi_ref, qlo_ref, qsq_ref, hi_ref, lo_ref, sq_ref,
                   inv_ref, out_ref, *, passes: int):
    """Transposed orientation: db tiles are the MXU lhs (TN, d) and the
    queries arrive pre-transposed (d, Q) — both operands sit in their
    natural (M, K) / (K, N) layouts, so Mosaic inserts no layout copies.
    The subtile min then reduces over the SUBLANE dim (a supported split),
    and the output block is already (TN//SUB, Q)."""
    dots = jax.lax.dot_general(
        hi_ref[:], qhi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TN, Q)
    if passes == 3:
        dots += jax.lax.dot_general(
            lo_ref[:], qhi_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dots += jax.lax.dot_general(
            hi_ref[:], qlo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    d2 = sq_ref[:] + qsq_ref[:] - 2.0 * dots + inv_ref[:] * PENALTY
    q = d2.shape[1]
    out_ref[:] = d2.reshape(TN // SUB, SUB, q).min(axis=1)


@functools.partial(jax.jit, static_argnames=("passes",))
def coarse_minima(qThi, qTlo, qsq_row, db_hi, db_lo, sq_col, inv_col, passes):
    """qThi/qTlo: (d, Q) bf16. db_hi/db_lo: (N, d) bf16 row-major.
    qsq_row: (1, Q) f32. sq_col/inv_col: (N, 1) f32. -> (Q, N//SUB) minima."""
    t = N // TN
    grid_spec = pl.GridSpec(
        grid=(t,),
        in_specs=[
            pl.BlockSpec((D, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN // SUB, Q), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    minima_tq = pl.pallas_call(
        functools.partial(_coarse_kernel, passes=passes),
        out_shape=jax.ShapeDtypeStruct((N // SUB, Q), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * N * D * passes,
            bytes_accessed=N * D * 2 * (2 if passes == 3 else 1)
            + Q * D * 4 + Q * (N // SUB) * 4,
            transcendentals=0,
        ),
    )(qThi, qTlo, qsq_row, db_hi, db_lo, sq_col, inv_col)
    # The barrier is load-bearing: without it XLA fuses the lazy transpose
    # into top_k as strided reads over the T axis (~80 ms); materializing
    # the Q-major layout costs ~0.2 ms.
    return jax.lax.optimization_barrier(minima_tq.T)


@functools.partial(jax.jit, static_argnames=("passes", "m_tiles", "variant"))
def full_search(queries, db, db_hi, db_lo, db_sq, sq_col, inv_col, xmax,
                passes, m_tiles, variant="arrays"):
    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qTlo = (qT - qThi.astype(jnp.float32)).astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1, keepdims=True)
    minima = coarse_minima(qThi, qTlo, qsq.T, db_hi, db_lo, sq_col, inv_col,
                           passes)
    neg_min, tile_idx = jax.lax.top_k(-minima, m_tiles)
    offs = jnp.arange(SUB, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * SUB + offs[None, None, :]).reshape(
        Q, m_tiles * SUB)
    cand_rows = db[cand]
    dots = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                      preferred_element_type=jnp.float32, precision="highest")
    exact = jnp.sqrt(jnp.maximum(qsq + db_sq[cand] - 2.0 * dots, 0.0))
    neg2, pos = jax.lax.top_k(-exact, K)
    out_d = -neg2
    out_i = jnp.take_along_axis(cand, pos, axis=1)
    if variant == "no_cert":
        return out_d.sum() + out_i.sum()
    # certification (meaningful for passes=3): rigorous bf16x3 + f32-accum
    # error bound on the coarse d2 values
    qn = jnp.sqrt(qsq[:, 0])
    if variant == "cert_constmax":
        err = (2.0 ** -17 + D * 2.0 ** -24) * qn * 35.0
    else:
        err = (2.0 ** -17 + D * 2.0 ** -24) * qn * xmax   # |dot error| bound
    margin = 4.0 * err                                 # d2 err (2x) + safety
    dk2 = out_d[:, K - 1] ** 2
    if variant.startswith("cert_exact"):
        # boundary from the refined exact distances of the m-th best tile:
        # coarse_min(tile_m) >= w - margin and non-selected tiles are >=
        # coarse_min(tile_m), so true min outside >= w - 2*margin. Avoids
        # consuming top_k's VALUES over the 256 MB minima (slow codegen).
        w = jnp.min(exact[:, (m_tiles - 1) * SUB:] ** 2, axis=1)
        certified = dk2 <= w - 2.0 * margin
        return out_d.sum() + out_i.sum() + certified.sum()
    certified = dk2 <= (-neg_min[:, -1]) - margin
    if variant in ("cert_constmax", "cert_sum"):
        return out_d.sum() + out_i.sum() + certified.sum()
    if variant == "sums":
        return out_d.sum() + out_i.sum() + certified.sum()
    if variant == "no_tail":
        return out_d, cand, certified
    return out_d, out_i, certified


def agreement(ids_a, ids_b):
    hits = 0
    for ra, rb in zip(np.asarray(ids_a), np.asarray(ids_b)):
        hits += len(set(ra.tolist()) & set(rb.tolist()))
    return hits / ids_a.shape[0] / ids_a.shape[1]


def main():
    from vectordb_tpu.cli import enable_persistent_jit_cache
    enable_persistent_jit_cache()
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    db_sq = jnp.sum(db * db, axis=1)
    qbase = jax.random.normal(kq, (Q, D), dtype=jnp.float32)

    # ground truth from the production exact path — run BEFORE building the
    # hi/lo copies so the (Q, N) intermediate fits in HBM
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.ops.topk import flat_search_exact_tiled
    valid = jnp.ones((N,), bool)
    ref = flat_search_exact_tiled(qbase, db, db_sq, jnp.sqrt(db_sq), valid,
                                  DistanceMetric.EUCLIDEAN, K)
    ref_ids = np.asarray(ref[1])
    del ref

    @jax.jit
    def split_hi_lo(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    db_hi, db_lo = split_hi_lo(db)
    sq_col = db_sq.reshape(N, 1)
    inv_col = jnp.zeros((N, 1), jnp.float32)
    xmax = jnp.sqrt(db_sq.max())
    np.asarray(jnp.sum(db_hi.astype(jnp.float32)) + jnp.sum(db))

    # kernel-only timings
    @functools.partial(jax.jit, static_argnames=("p",))
    def krn(q, dhi, dlo, sqc, invc, p):
        qT = q.T
        qThi = qT.astype(jnp.bfloat16)
        qTlo = (qT - qThi.astype(jnp.float32)).astype(jnp.bfloat16)
        qsq_row = jnp.sum(q * q, axis=1)[None, :]
        return coarse_minima(qThi, qTlo, qsq_row, dhi, dlo, sqc, invc, p).sum()

    for passes in (1, 3):
        t = timeit(lambda q, p=passes: krn(q, db_hi, db_lo, sq_col,
                                           inv_col, p), qbase)
        print(f"coarse kernel passes={passes}: {t*1e3:7.1f} ms")

    # probe-style pipeline (returns scalars only) for comparison
    @jax.jit
    def probe_e(queries, db, db_hi, db_lo, db_sq, sq_col, inv_col):
        qT = queries.T
        qThi = qT.astype(jnp.bfloat16)
        qTlo = (qT - qThi.astype(jnp.float32)).astype(jnp.bfloat16)
        qsq = jnp.sum(queries * queries, axis=1, keepdims=True)
        minima = coarse_minima(qThi, qTlo, qsq.T, db_hi, db_lo, sq_col,
                               inv_col, 1)
        neg_min, tile_idx = jax.lax.top_k(-minima, 16)
        offs = jnp.arange(SUB, dtype=jnp.int32)
        cand = (tile_idx[:, :, None] * SUB + offs[None, None, :]).reshape(
            Q, 16 * SUB)
        cand_rows = db[cand]
        dots = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        exact = jnp.sqrt(jnp.maximum(qsq + db_sq[cand] - 2.0 * dots, 0.0))
        neg2, pos = jax.lax.top_k(-exact, K)
        return neg2.sum() + pos.sum()

    t = timeit(lambda q: probe_e(q, db, db_hi, db_lo, db_sq, sq_col,
                                 inv_col), qbase)
    print(f"probe-style full (scalar outs): {t*1e3:7.1f} ms")

    for variant in ("no_cert", "cert_exact", "cert_sum"):
        fn = lambda q, v=variant: full_search(q, db, db_hi, db_lo, db_sq,
                                              sq_col, inv_col, xmax, 1, 16, v)
        t = timeit(fn, qbase)
        print(f"full variant={variant:8s}: {t*1e3:7.1f} ms")

    for passes, m_tiles in ((1, 16), (3, 16)):
        fn = lambda q, p=passes, m=m_tiles: full_search(
            q, db, db_hi, db_lo, db_sq, sq_col, inv_col, xmax, p, m)
        t = timeit(fn, qbase)
        d_, i_, cert = fn(qbase)
        agr = agreement(np.asarray(i_), ref_ids)
        cr = float(np.mean(np.asarray(cert)))
        print(f"full passes={passes} m={m_tiles:3d}: {t*1e3:7.1f} ms "
              f"({Q/t:7.0f} qps)  agree={agr:.4f}  certified={cr:.4f}")


if __name__ == "__main__":
    main()
