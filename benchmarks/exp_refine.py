"""Refine-stage variants at the headline shape: the decomposition
(exp_overhead.py) showed refine costs ~45 ms of the ~107 ms fast /
~175 ms exact device pipeline. Candidates:

  R0 current: db[cand] gather + einsum precision="highest" (bf16x6 MXU
     with N=1 -> 127/128 columns wasted)
  R1 VPU refine: gather + jnp.sum(rows * q, axis=-1) — f32 multiply,
     f32 accumulation on the VPU, no MXU involvement
  R2 VPU refine computing row sq-norms in-kernel (drops the db_sq[cand]
     gather)
  T1 approx_min_k tile selection instead of exact top_k (fast mode only —
     the exactness certificate needs true top-m tiles)

Accuracy: max |R1 - R0| over the refined scores is printed — the exact
path's contract is distances equal to the f32-highest oracle, so R1 is
only adoptable if the difference is ~1 ulp and the parity tests still
pass (they use allclose, see tests/test_coarse_kernel.py).
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
from vectordb_tpu.ops import coarse_kernel as ck  # noqa: E402

N, D, Q, K = 1 << 20, 768, 4096, 10
ITERS = 6
M_TILES = 16


@jax.jit
def _tiny(x):
    return x.ravel()[0] + 0.0


def drain(anchor):
    jax.device_get(_tiny(anchor))


def timed(label, fn, *args, **kw):
    jax.device_get(fn(jnp.float32(0), *args, **kw))
    drain(args[0])
    start = time.perf_counter()
    outs = [fn(jnp.float32(i + 1), *args, **kw) for i in range(ITERS)]
    jax.device_get(outs)
    per = (time.perf_counter() - start) / ITERS
    print(f"{label:55s} {per * 1e3:9.2f} ms", flush=True)
    return per


def _cand(tile_idx):
    offs = jnp.arange(ck.SUB, dtype=jnp.int32)
    return (tile_idx[:, :, None] * ck.SUB + offs[None, None, :]).reshape(
        tile_idx.shape[0], -1)


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    valid = jnp.ones((N,), bool)
    hi, lo = ck.split_hi_lo(db)
    queries = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qTlo = (qT - qThi.astype(jnp.float32)).astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)
    qrow = qsq[None, :]
    col = sq.reshape(1, N)
    inv_col = jnp.zeros((1, N), jnp.float32)
    minima = ck._coarse_minima(qThi, qTlo, qrow, hi, lo, col, inv_col, 1,
                               "euclidean", False)
    tile_idx = jax.lax.top_k(-minima, M_TILES)[1]
    drain(tile_idx)

    # --- R0: current einsum-highest refine ---
    @jax.jit
    def r0(off, queries, tile_idx, db, sqn, valid):
        qq = queries + off
        cand = _cand(tile_idx)
        rows = db[cand]
        dots = jnp.einsum("qcd,qd->qc", rows, qq,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        score2 = (jnp.sum(qq * qq, axis=1)[:, None] + sqn[cand] - 2.0 * dots)
        score2 = jnp.where(valid[cand], score2, jnp.inf)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.sum(neg) + jnp.sum(pos).astype(jnp.float32)

    # --- R1: VPU multiply-reduce refine ---
    @jax.jit
    def r1(off, queries, tile_idx, db, sqn, valid):
        qq = queries + off
        cand = _cand(tile_idx)
        rows = db[cand]
        dots = jnp.sum(rows * qq[:, None, :], axis=-1)
        score2 = (jnp.sum(qq * qq, axis=1)[:, None] + sqn[cand] - 2.0 * dots)
        score2 = jnp.where(valid[cand], score2, jnp.inf)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.sum(neg) + jnp.sum(pos).astype(jnp.float32)

    # --- R2: VPU refine, sq-norms computed from the gathered rows ---
    @jax.jit
    def r2(off, queries, tile_idx, db, valid):
        qq = queries + off
        cand = _cand(tile_idx)
        rows = db[cand]
        dots = jnp.sum(rows * qq[:, None, :], axis=-1)
        rsq = jnp.sum(rows * rows, axis=-1)
        score2 = jnp.sum(qq * qq, axis=1)[:, None] + rsq - 2.0 * dots
        score2 = jnp.where(valid[cand], score2, jnp.inf)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.sum(neg) + jnp.sum(pos).astype(jnp.float32)

    # --- R3: VPU refine via (x - q)^2 directly (no norms at all) ---
    @jax.jit
    def r3(off, queries, tile_idx, db, valid):
        qq = queries + off
        cand = _cand(tile_idx)
        rows = db[cand]
        diff = rows - qq[:, None, :]
        score2 = jnp.sum(diff * diff, axis=-1)
        score2 = jnp.where(valid[cand], score2, jnp.inf)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.sum(neg) + jnp.sum(pos).astype(jnp.float32)

    t0 = timed("R0 einsum-highest refine (current)", r0, queries, tile_idx,
               db, sq, valid)
    t1 = timed("R1 VPU multiply-reduce refine", r1, queries, tile_idx, db,
               sq, valid)
    t2 = timed("R2 VPU refine + in-flight row sq-norms", r2, queries,
               tile_idx, db, valid)
    t3 = timed("R3 VPU refine via (x-q)^2", r3, queries, tile_idx, db, valid)

    # --- T: tile selection variants ---
    @jax.jit
    def t_exact(off, minima):
        return jnp.sum(jax.lax.top_k(-(minima + off), M_TILES)[1])

    @jax.jit
    def t_approx(off, minima):
        return jnp.sum(jax.lax.approx_min_k(minima + off, M_TILES)[1])

    tt0 = timed("T0 exact tile top_k", t_exact, minima)
    tt1 = timed("T1 approx_min_k tile selection", t_approx, minima)

    # --- R4: tile-granular gather (contiguous (SUB, d) blocks) ---
    db_tiles = db.reshape(N // ck.SUB, ck.SUB, D)
    drain(db_tiles)

    @jax.jit
    def r4(off, queries, tile_idx, db_tiles, valid):
        qq = queries + off
        rows = db_tiles[tile_idx].reshape(Q, M_TILES * ck.SUB, D)
        dots = jnp.sum(rows * qq[:, None, :], axis=-1)
        rsq = jnp.sum(rows * rows, axis=-1)
        score2 = jnp.sum(qq * qq, axis=1)[:, None] + rsq - 2.0 * dots
        score2 = jnp.where(valid[_cand(tile_idx)], score2, jnp.inf)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.sum(neg) + jnp.sum(pos).astype(jnp.float32)

    t4 = timed("R4 tile-granular gather + VPU refine", r4, queries,
               tile_idx, db_tiles, valid)

    # --- R5: tile gather + MXU-highest einsum (R0's math, R4's gather) ---
    @jax.jit
    def r5(off, queries, tile_idx, db_tiles, valid):
        qq = queries + off
        rows = db_tiles[tile_idx].reshape(Q, M_TILES * ck.SUB, D)
        dots = jnp.einsum("qcd,qd->qc", rows, qq,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        rsq = jnp.sum(rows * rows, axis=-1)
        score2 = jnp.sum(qq * qq, axis=1)[:, None] + rsq - 2.0 * dots
        score2 = jnp.where(valid[_cand(tile_idx)], score2, jnp.inf)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.sum(neg) + jnp.sum(pos).astype(jnp.float32)

    t5 = timed("R5 tile-granular gather + MXU-highest", r5, queries,
               tile_idx, db_tiles, valid)

    # --- accuracy: R1 vs R0 refined distances ---
    @functools.partial(jax.jit, static_argnames=("how",))
    def scores(queries, tile_idx, db, sqn, how):
        cand = _cand(tile_idx)
        rows = db[cand]
        if how == "mxu":
            dots = jnp.einsum("qcd,qd->qc", rows, queries,
                              preferred_element_type=jnp.float32,
                              precision="highest")
        else:
            dots = jnp.sum(rows * queries[:, None, :], axis=-1)
        return (jnp.sum(queries * queries, axis=1)[:, None] + sqn[cand]
                - 2.0 * dots)

    s_mxu = scores(queries, tile_idx, db, sq, "mxu")
    s_vpu = scores(queries, tile_idx, db, sq, "vpu")
    diff = jnp.max(jnp.abs(s_mxu - s_vpu))
    rel = jnp.max(jnp.abs(s_mxu - s_vpu) / jnp.maximum(jnp.abs(s_mxu), 1e-6))
    print(f"\nmax |mxu - vpu| score2 diff: {float(diff):.3e} "
          f"(rel {float(rel):.3e})")

    # agreement of final top-k ids: R1-selected vs R0-selected
    @functools.partial(jax.jit, static_argnames=("how",))
    def topk_ids(queries, tile_idx, db, sqn, valid, how):
        s = scores(queries, tile_idx, db, sqn, how)
        s = jnp.where(valid[_cand(tile_idx)], s, jnp.inf)
        return jnp.take_along_axis(_cand(tile_idx),
                                   jax.lax.top_k(-s, K)[1], axis=1)
    ids_m = np.asarray(topk_ids(queries, tile_idx, db, sq, valid, "mxu"))
    ids_v = np.asarray(topk_ids(queries, tile_idx, db, sq, valid, "vpu"))
    agree = (ids_m == ids_v).mean()
    print(f"top-{K} id agreement mxu vs vpu refine: {agree:.6f}")
    print(f"\nspeedups vs R0: R1 {t0 / t1:.2f}x R2 {t0 / t2:.2f}x "
          f"R3 {t0 / t3:.2f}x R4 {t0 / t4:.2f}x R5 {t0 / t5:.2f}x; "
          f"tile topk approx {tt0 / tt1:.2f}x")


if __name__ == "__main__":
    main()
