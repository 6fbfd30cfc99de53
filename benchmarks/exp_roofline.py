"""Roofline decomposition of the 1-pass certified exact path.

Times each pipeline stage as its own jit at the headline shape and prints
a roofline table (flops / bytes / % of v5e peaks), plus a query-block
(_QB_MAX) sweep: at QB=1024 the db hi mirror streams Q/QB times per
batch; a bigger block streams it once at the cost of more VMEM.

VERDICT.md round-1 items 6 (raise MFU / substantiate the bandwidth story).
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

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.ops import coarse_kernel as ck  # noqa: E402

N, D, Q, K = 1 << 20, 768, 4096, 10
ITERS = 6
BF16_PEAK = 197e12      # v5e MXU bf16
HBM_PEAK = 819e9        # v5e


def timed(label, fn, staged, flops=None, byts=None):
    jax.device_get(fn(staged[-1]))          # compile + warm
    start = time.perf_counter()
    outs = [fn(staged[i]) for i in range(ITERS)]
    jax.device_get(outs)
    per = (time.perf_counter() - start) / ITERS
    extra = ""
    if flops:
        extra += f"  {flops / per / 1e12:6.1f} TF/s ({flops / per / BF16_PEAK * 100:4.1f}% MXU)"
    if byts:
        extra += f"  {byts / per / 1e9:6.1f} GB/s ({byts / per / HBM_PEAK * 100:4.1f}% HBM)"
    print(f"{label:42s} {per * 1e3:8.2f} ms{extra}", flush=True)
    return per


@functools.partial(jax.jit, static_argnames=("m2", "m"))
def upto_selection(queries, hi, sqn, inv_col, m2, m):
    """Production (fused-super) selection: kernel emits tile + super
    minima; only the small super array is transposed/top_k'd."""
    qp = queries.shape[0]
    n = hi.shape[0]
    t_all = n // ck.SUB
    qThi = queries.T.astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)
    tile_tq, sup_tq = ck._minima_1p_sup(
        qThi, qsq[None, :], hi, sqn.reshape(1, n), inv_col,
        "euclidean", False, "mirrors")
    minima2 = jax.lax.optimization_barrier(sup_tq.T)
    neg_sup, sup_idx = jax.lax.top_k(-minima2, m2)
    m3_tq = tile_tq.reshape(t_all // ck.SUPER, ck.SUPER, qp)
    sel = m3_tq[sup_idx, :, jnp.arange(qp)[:, None]]
    sel = sel.reshape(qp, m2 * ck.SUPER)
    neg_t, loc = jax.lax.top_k(-sel, m)
    sup_of = jnp.take_along_axis(sup_idx, loc // ck.SUPER, axis=1)
    tile_idx = sup_of * ck.SUPER + (loc % ck.SUPER)
    return tile_idx.sum(dtype=jnp.int32)


@jax.jit
def minima_sup_only(queries, hi, sqn, inv_col):
    n = hi.shape[0]
    qThi = queries.T.astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)
    tile_tq, sup_tq = ck._minima_1p_sup(
        qThi, qsq[None, :], hi, sqn.reshape(1, n), inv_col,
        "euclidean", False, "mirrors")
    return tile_tq[::512, ::64].sum() + sup_tq[::64, ::512].sum()


@jax.jit
def minima_only(queries, hi, sqn, inv_col):
    n = hi.shape[0]
    qThi = queries.T.astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)
    minima = ck._coarse_minima_1p(qThi, qsq[None, :], hi,
                                  sqn.reshape(1, n), inv_col,
                                  "euclidean", False)
    return minima[::64, ::512].sum()        # forces the kernel, tiny read


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    hi, lo = ck.split_hi_lo(db)
    valid = jnp.ones((N,), bool)
    inv_col = (1.0 - valid.astype(jnp.float32)).reshape(1, N)
    elo = ck.residual_max_norm(db, hi)
    norms = jnp.sqrt(sq)
    qbase = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    staged = []
    for i in range(ITERS + 1):
        b = qbase + np.float32(i + 1)
        b.block_until_ready()
        staged.append(b)
    m2, m = ck._exact1p_pool(K, N // ck.SUB)
    print(f"shape: N=2^20 d={D} Q={Q} k={K}  pool m2={m2} m={m}")

    # dispatch floor
    tiny = jax.jit(lambda x: x[0, 0] + 1.0)
    t0 = timed("dispatch floor (tiny jit)", tiny, staged)

    flops1 = 2.0 * Q * N * D
    bytes1 = N * D * 2 * (Q // 1024) + Q * (N // ck.SUB) * 4
    t1 = timed("S1 coarse minima (1 bf16 pass)",
               lambda q: minima_only(q, hi, sq, inv_col),
               staged, flops=flops1, byts=bytes1)
    t1b = timed("S1b fused tile+super minima kernel",
                lambda q: minima_sup_only(q, hi, sq, inv_col),
                staged, flops=flops1, byts=bytes1)
    t2 = timed("S2 minima + hierarchical selection",
               lambda q: upto_selection(q, hi, sq, inv_col, m2, m), staged)
    jax.device_get(ck.coarse_search_1p(staged[-1], db, sq, norms, valid,
                                       hi, elo, DistanceMetric.EUCLIDEAN,
                                       K)[2].sum())
    start = time.perf_counter()
    outs = []
    for i in range(ITERS):
        d_, i_, c_ = ck.coarse_search_1p(staged[i], db, sq, norms, valid,
                                         hi, elo, DistanceMetric.EUCLIDEAN, K)
        outs.append((d_, i_, c_))
    jax.device_get(outs)
    t3 = (time.perf_counter() - start) / ITERS
    print(f"{'S3 full 1p pipeline':42s} {t3 * 1e3:8.2f} ms"
          f"  -> refine+cert = {(t3 - t2) * 1e3:.2f} ms", flush=True)
    refine_bytes = Q * m * ck.SUB * D * 4
    print(f"   selection = {(t2 - t1) * 1e3:.2f} ms;"
          f" refine gather moves {refine_bytes / 1e9:.2f} GB"
          f" (x2 if materialized) -> {refine_bytes / (t3 - t2) / 1e9:.0f}"
          f" GB/s effective")

    # query-block sweep: stream the db once per batch instead of Q/QB times
    for qb in (2048, 4096):
        ck._QB_MAX, ck._VMEM_BUDGET = qb, 80 * 1024 * 1024
        minima_only.clear_cache()
        ck._coarse_minima_1p.clear_cache()
        bytes_qb = N * D * 2 * max(1, Q // qb) + Q * (N // ck.SUB) * 4
        timed(f"S1 coarse minima QB={qb}",
              lambda q: minima_only(q, hi, sq, inv_col), staged,
              flops=flops1, byts=bytes_qb)
    ck._QB_MAX, ck._VMEM_BUDGET = 1024, 12 * 1024 * 1024


if __name__ == "__main__":
    main()
