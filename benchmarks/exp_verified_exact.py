"""Experiment 2: (a) is the refine einsum f32-accurate on the MXU?
(b) component timing of the exact tiled path; (c) margin-verified exact
scheme: coarse pass at default/high precision + rigorous rounding bound +
on-device verification scalar (fallback to highest only when it trips).

Run:  python benchmarks/exp_verified_exact.py
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

N, D, Q, K = 1 << 20, 768, 1024, 10
TILE = 16
T = N // TILE
ITERS = 5


def timeit(fn, qbase, iters=ITERS):
    np.asarray(jax.tree_util.tree_leaves(fn(qbase))[0])
    times = []
    for i in range(iters):
        q = qbase + np.float32(i + 1)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(q))[0])
        times.append(time.perf_counter() - t0)
    return min(times)


# -- (a) refine precision probe --------------------------------------------

@jax.jit
def refine_dots_default(cand_rows, queries):
    return jnp.einsum("qcd,qd->qc", cand_rows, queries,
                      preferred_element_type=jnp.float32)


@jax.jit
def refine_dots_highest(cand_rows, queries):
    return jnp.einsum("qcd,qd->qc", cand_rows, queries,
                      preferred_element_type=jnp.float32,
                      precision="highest")


# -- (b)/(c) building blocks -----------------------------------------------

@functools.partial(jax.jit, static_argnames=("precision", "stage"))
def staged(queries, db, db_sq, precision, stage):
    """stage 1: matmul+d2+tile-min only; 2: +top_k tiles; 3: full refine."""
    p = None if precision == "default" else precision
    dots = jnp.matmul(queries, db.T, precision=p)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    d2 = jnp.maximum(q_sq + db_sq[None, :] - 2.0 * dots, 0.0)
    minima = d2.reshape(Q, T, TILE).min(axis=-1)
    if stage == 1:
        return minima.sum()
    neg, tile_idx = jax.lax.top_k(-minima, K)
    if stage == 2:
        return neg.sum()
    offs = jnp.arange(TILE, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * TILE + offs[None, None, :]).reshape(Q, K * TILE)
    cand_rows = db[cand]
    dots2 = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                       preferred_element_type=jnp.float32, precision="highest")
    exact = jnp.sqrt(jnp.maximum(q_sq + db_sq[cand] - 2.0 * dots2, 0.0))
    neg2, pos = jax.lax.top_k(-exact, K)
    return (-neg2), jnp.take_along_axis(cand, pos, axis=1)


# hierarchical tile selection: top_k over supertile minima (T/16), then an
# exact small top_k over the k best supertiles' member tiles
@functools.partial(jax.jit, static_argnames=("precision",))
def hier(queries, db, db_sq, precision):
    p = None if precision == "default" else precision
    dots = jnp.matmul(queries, db.T, precision=p)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    d2 = jnp.maximum(q_sq + db_sq[None, :] - 2.0 * dots, 0.0)
    minima = d2.reshape(Q, T, TILE).min(axis=-1)          # (Q, T)
    S = 16
    sup = minima.reshape(Q, T // S, S)
    sup_min = sup.min(axis=-1)                             # (Q, T/S)
    _, sup_idx = jax.lax.top_k(-sup_min, K)                # (Q, K)
    # gather the K supertiles' tile minima: (Q, K, S)
    member = jnp.take_along_axis(sup, sup_idx[:, :, None], axis=1)
    flat = member.reshape(Q, K * S)
    _, loc = jax.lax.top_k(-flat, K)
    tile_idx = sup_idx[jnp.arange(Q)[:, None], loc // S] * S + (loc % S)
    offs = jnp.arange(TILE, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * TILE + offs[None, None, :]).reshape(Q, K * TILE)
    cand_rows = db[cand]
    dots2 = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                       preferred_element_type=jnp.float32, precision="highest")
    exact = jnp.sqrt(jnp.maximum(q_sq + db_sq[cand] - 2.0 * dots2, 0.0))
    neg2, pos = jax.lax.top_k(-exact, K)
    return (-neg2), jnp.take_along_axis(cand, pos, axis=1)


# verified-exact: coarse at low precision, margin = rigorous rounding bound,
# returns results + a bool "certified" per query
@functools.partial(jax.jit, static_argnames=("precision", "m_tiles", "err_pow"))
def verified(queries, db, db_sq, db_norms_max_tile, precision, m_tiles, err_pow):
    p = None if precision == "default" else precision
    dots = jnp.matmul(queries, db.T, precision=p)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    d2 = jnp.maximum(q_sq + db_sq[None, :] - 2.0 * dots, 0.0)
    minima = d2.reshape(Q, T, TILE).min(axis=-1)
    neg_min, tile_idx = jax.lax.top_k(-minima, m_tiles)
    # exact refine of m_tiles*TILE candidates
    offs = jnp.arange(TILE, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * TILE + offs[None, None, :]).reshape(
        Q, m_tiles * TILE)
    cand_rows = db[cand]
    dots2 = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                       preferred_element_type=jnp.float32, precision="highest")
    exact = jnp.sqrt(jnp.maximum(q_sq + db_sq[cand] - 2.0 * dots2, 0.0))
    neg2, pos = jax.lax.top_k(-exact, K)
    out_d = -neg2
    out_i = jnp.take_along_axis(cand, pos, axis=1)
    # verification: smallest coarse tile-min among NON-selected tiles.
    # top_k returned the m best minima; the (m)-th one's value bounds the rest
    worst_sel = -neg_min[:, -1]                      # (Q,), m-th best tile min
    # rigorous error: |d2_coarse - d2_true| <= 2*|dot err| <= 2*eps*|q|*|x|
    qn = jnp.sqrt(jnp.sum(queries * queries, axis=1))        # (Q,)
    margin = 2.0 * (2.0 ** err_pow) * qn * db_norms_max_tile  # scalar max |x|
    dk = out_d[:, K - 1] ** 2
    certified = dk <= worst_sel - margin
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
    np.asarray(jnp.sum(db))

    # (a) refine precision probe on a small slice
    cand_rows = db[:160][None].repeat(8, axis=0)  # (8, 160, d)
    qs = qbase[:8]
    d_def = np.asarray(refine_dots_default(cand_rows, qs))
    d_hi = np.asarray(refine_dots_highest(cand_rows, qs))
    oracle = np.einsum("qcd,qd->qc", np.asarray(cand_rows, np.float64),
                       np.asarray(qs, np.float64))
    print(f"refine einsum err vs f64: default={np.abs(d_def-oracle).max():.3e} "
          f"highest={np.abs(d_hi-oracle).max():.3e}")

    # (b) staged timing at highest
    for prec in ("highest", "default"):
        for stage in (1, 2, 3):
            t = timeit(lambda q, s=stage, p=prec: staged(q, db, db_sq, p, s), qbase)
            print(f"staged {prec:8s} stage={stage}: {t*1e3:7.1f} ms")

    ref = staged(qbase, db, db_sq, "highest", 3)
    ref_ids = np.asarray(ref[1])

    for prec in ("highest", "default"):
        t = timeit(lambda q, p=prec: hier(q, db, db_sq, p), qbase)
        ids = np.asarray(hier(qbase, db, db_sq, prec)[1])
        print(f"hier {prec:8s}: {t*1e3:7.1f} ms ({Q/t:7.0f} qps) "
              f"agree={agreement(ids, ref_ids):.4f}")

    # (c) verified-exact sweeps
    xnmax = float(jnp.sqrt(db_sq.max()))
    for prec, err_pow in (("default", -8.0), ("high", -16.0)):
        for m_tiles in (16, 32):
            fn = lambda q, p=prec, m=m_tiles, e=err_pow: verified(
                q, db, db_sq, xnmax, p, m, e)
            t = timeit(fn, qbase)
            d_, i_, cert = fn(qbase)
            ids = np.asarray(i_)
            cr = float(np.mean(np.asarray(cert)))
            print(f"verified {prec:7s} m={m_tiles:3d}: {t*1e3:7.1f} ms "
                  f"({Q/t:7.0f} qps) certified={cr:.4f} "
                  f"agree={agreement(ids, ref_ids):.4f}")


if __name__ == "__main__":
    main()
