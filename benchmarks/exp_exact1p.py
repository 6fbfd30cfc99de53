"""Can a SINGLE bf16 pass carry a rigorous exactness certificate?

The bf16x3 certified path burns 3 MXU passes so its margin can be
~2^-17-relative. A 1-pass scan has worst-case dot error 2^-7|q||x| — too
wide — but the *computed* residual norms give a much tighter rigorous
per-instance bound:

    |x.q - hi(x).hi(q)| <= |xlo||hi(q)| + |x||qlo| + d 2^-24 |hi x||hi q|

with |xlo| <= elo_max (a scalar max over rows, computed once at split
time) and |qlo| computed exactly per query batch. This measures, on iid
gaussian data (worst case for order-statistic gaps), what fraction of
queries certify as a function of the tile pool m, and what the pipeline
costs end-to-end on device."""

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


@jax.jit
def _tiny(x):
    return x.ravel()[0] + 0.0


def timed(label, fn, *args, **kw):
    jax.device_get(fn(jnp.float32(0), *args, **kw))
    jax.device_get(_tiny(args[0]))
    start = time.perf_counter()
    outs = [fn(jnp.float32(i + 1), *args, **kw) for i in range(ITERS)]
    jax.device_get(outs)
    per = (time.perf_counter() - start) / ITERS
    print(f"{label:52s} {per * 1e3:9.2f} ms  ({Q / per:,.0f} qps dev-only)",
          flush=True)
    return per


@functools.partial(jax.jit, static_argnames=("m",))
def exact1p(queries, db, sqn, norms, valid, hi, elo_max, m):
    """1-pass coarse -> exact top_k over minima -> f32 refine -> certify."""
    qp, d = queries.shape
    n = db.shape[0]
    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)
    qn = jnp.sqrt(qsq)
    qlo = qT - qThi.astype(jnp.float32)
    qlo_n = jnp.sqrt(jnp.sum(qlo * qlo, axis=0))        # (Qp,) exact
    minima = ck._coarse_minima_1p(
        qThi, qsq[None, :], hi, sqn.reshape(1, n),
        (1.0 - valid.astype(jnp.float32)).reshape(1, n), "euclidean", False)
    tile_idx = jax.lax.top_k(-minima, m)[1]
    offs = jnp.arange(ck.SUB, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * ck.SUB + offs[None, None, :]).reshape(
        qp, m * ck.SUB)
    t_all = n // ck.SUB
    rows = db.reshape(t_all, ck.SUB, d)[tile_idx].reshape(qp, m * ck.SUB, d)
    dots = jnp.einsum("qcd,qd->qc", rows, queries,
                      preferred_element_type=jnp.float32,
                      precision="highest")
    rsq = sqn.reshape(t_all, ck.SUB)[tile_idx].reshape(qp, m * ck.SUB)
    score2 = qsq[:, None] + rsq - 2.0 * dots
    vld = valid.reshape(t_all, ck.SUB)[tile_idx].reshape(qp, m * ck.SUB)
    score2 = jnp.where(vld, score2, jnp.inf)
    neg, pos = jax.lax.top_k(-score2, K)
    sk = -neg
    idx = jnp.take_along_axis(cand, pos, axis=1)
    # rigorous per-query margin from computed residual norms
    xmax = jnp.sqrt(jnp.max(jnp.where(valid, sqn, 0.0)))
    err_dot = (elo_max * (qn + qlo_n) + xmax * qlo_n
               + d * 2.0 ** -24 * (xmax + elo_max) * (qn + qlo_n))
    margin = 8.0 * err_dot                              # d2 err x2, safety x4
    w = jnp.min(score2[:, (m - 1) * ck.SUB:], axis=1)
    last = sk[:, -1]
    certified = jnp.where(jnp.isfinite(last), last <= w - margin, True)
    return sk, idx, certified, margin, w - last


@functools.partial(jax.jit, static_argnames=("m",))
def exact1p_scalar(off, queries, db, sqn, norms, valid, hi, elo_max, m):
    sk, idx, cert, _, _ = exact1p(queries + off, db, sqn, norms, valid, hi,
                                  elo_max, m)
    return jnp.sum(idx, dtype=jnp.int32), jnp.sum(cert)


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    norms = jnp.sqrt(sq)
    valid = jnp.ones((N,), bool)
    hi, lo = ck.split_hi_lo(db)
    resid = db - hi.astype(jnp.float32)
    elo_max = jnp.sqrt(jnp.max(jnp.sum(resid * resid, axis=1)))
    queries = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    print(f"elo_max={float(elo_max):.5f}  "
          f"(worst-case bound {2.0**-8 * float(jnp.max(norms)):.5f})")
    jax.device_get(_tiny(queries))

    # ground truth from the production certified path
    qs = queries[:512]
    d_x, i_x, c_x = ck._coarse_search_jit(
        qs, db, sq, norms, valid, hi, lo, "euclidean", K, 16, 3, False,
        True, "mirrors")
    d_x, i_x = jax.device_get((d_x, i_x))

    for m in (32, 48, 64, 96):
        sk, idx, cert, margin, gap = exact1p(qs, db, sq, norms, valid, hi,
                                             elo_max, m)
        sk, idx, cert, margin, gap = jax.device_get(
            (sk, idx, cert, margin, gap))
        frac = cert.mean()
        certified_match = np.all(idx[cert] == i_x[cert])
        d2_match = np.allclose(np.sqrt(np.maximum(sk[cert], 0.0)),
                               d_x[cert], rtol=0, atol=1e-5)
        print(f"m={m:3d}: certified {frac:8.5f}  margin median "
              f"{np.median(margin):7.3f}  boundary-gap median "
              f"{np.median(gap):7.3f}  certified ids exact: "
              f"{certified_match}  dists exact: {d2_match}")
        timed(f"exact1p m={m} (device-only)", exact1p_scalar, queries, db,
              sq, norms, valid, hi, elo_max, m=m)


if __name__ == "__main__":
    main()
