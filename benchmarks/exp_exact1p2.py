"""1-pass certified exact, v2: hierarchical tile selection + chunked refine.

v1 (exp_exact1p.py) showed m=48 certifies 100% on iid gaussian with
bit-exact results, but exact top_k over the (Q, 65536) minima plus an
unchunked (Q, m*16, 768) refine gather cost 102+ ms and OOM at m=48.

v2 selects tiles hierarchically: reduce minima to super-tile minima
(16 tiles each -> (Q, 4096)), exact top_k m2 supers there (16x cheaper),
gather the selected supers' tile minima (tiny), pick the m best tiles
inside them. The certificate gains a second boundary: non-selected supers
are bounded by the m2-th super minimum. Refine runs in query chunks via
lax.map to bound the gather's peak memory."""

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
SUPER = 16          # tiles per super-tile
REFINE_CHUNK = 1024


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


@functools.partial(jax.jit, static_argnames=("m2", "m"))
def exact1p_h(queries, db, sqn, valid, hi, elo_max, m2, m):
    qp, d = queries.shape
    n = db.shape[0]
    t_all = n // ck.SUB
    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)
    qn = jnp.sqrt(qsq)
    qlo = qT - qThi.astype(jnp.float32)
    qlo_n = jnp.sqrt(jnp.sum(qlo * qlo, axis=0))
    minima = ck._coarse_minima_1p(
        qThi, qsq[None, :], hi, sqn.reshape(1, n),
        (1.0 - valid.astype(jnp.float32)).reshape(1, n), "euclidean", False)
    # hierarchical selection
    minima3 = minima.reshape(qp, t_all // SUPER, SUPER)
    minima2 = minima3.min(axis=-1)                       # (Qp, T/16)
    neg_sup, sup_idx = jax.lax.top_k(-minima2, m2)       # (Qp, m2)
    sup_boundary = -neg_sup[:, -1]                       # m2-th super min
    sel = jnp.take_along_axis(minima3, sup_idx[:, :, None], axis=1)
    sel = sel.reshape(qp, m2 * SUPER)                    # selected tile minima
    neg_t, loc = jax.lax.top_k(-sel, m)                  # m best tiles
    tile_boundary = -neg_t[:, -1]
    sup_of = jnp.take_along_axis(
        sup_idx, loc // SUPER, axis=1)                   # (Qp, m)
    tile_idx = sup_of * SUPER + (loc % SUPER)            # global tile ids

    # everything NOT refined has coarse min >= b
    b = jnp.minimum(sup_boundary, tile_boundary)

    offs = jnp.arange(ck.SUB, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * ck.SUB + offs[None, None, :]).reshape(
        qp, m * ck.SUB)

    db3 = db.reshape(t_all, ck.SUB, d)
    sq2 = sqn.reshape(t_all, ck.SUB)
    vld2 = valid.reshape(t_all, ck.SUB)

    def refine_chunk(args):
        t_i, q_i, qs_i = args                            # (c,m),(c,d),(c,)
        rows = db3[t_i].reshape(-1, m * ck.SUB, d)
        dots = jnp.einsum("qcd,qd->qc", rows, q_i,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        s2 = qs_i[:, None] + sq2[t_i].reshape(-1, m * ck.SUB) - 2.0 * dots
        s2 = jnp.where(vld2[t_i].reshape(-1, m * ck.SUB), s2, jnp.inf)
        neg, pos = jax.lax.top_k(-s2, K)
        return -neg, pos

    if qp > REFINE_CHUNK:
        c = REFINE_CHUNK
        sk, pos = jax.lax.map(refine_chunk,
                              (tile_idx.reshape(qp // c, c, m),
                               queries.reshape(qp // c, c, d),
                               qsq.reshape(qp // c, c)))
        sk = sk.reshape(qp, K)
        pos = pos.reshape(qp, K)
    else:
        sk, pos = refine_chunk((tile_idx, queries, qsq))
    idx = jnp.take_along_axis(cand, pos, axis=1)

    xmax = jnp.sqrt(jnp.max(jnp.where(valid, sqn, 0.0)))
    err_dot = (elo_max * (qn + qlo_n) + xmax * qlo_n
               + d * 2.0 ** -24 * (xmax + elo_max) * (qn + qlo_n))
    margin = 8.0 * err_dot
    last = sk[:, -1]
    certified = jnp.where(jnp.isfinite(last), last <= b - margin, True)
    return sk, idx, certified, margin, b - last


@functools.partial(jax.jit, static_argnames=("m2", "m"))
def exact1p_h_scalar(off, queries, db, sqn, valid, hi, elo_max, m2, m):
    sk, idx, cert, _, _ = exact1p_h(queries + off, db, sqn, valid, hi,
                                    elo_max, m2, m)
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
    jax.device_get(_tiny(queries))

    qs = queries[:512]
    d_x, i_x, c_x = ck._coarse_search_jit(
        qs, db, sq, norms, valid, hi, lo, "euclidean", K, 16, 3, False,
        True, "mirrors")
    d_x, i_x = jax.device_get((d_x, i_x))

    for m2, m in ((24, 24), (32, 32), (48, 48), (32, 48), (64, 64)):
        sk, idx, cert, margin, gap = jax.device_get(
            exact1p_h(qs, db, sq, valid, hi, elo_max, m2, m))
        frac = cert.mean()
        ok_i = np.all(idx[cert] == i_x[cert])
        ok_d = np.allclose(np.sqrt(np.maximum(sk[cert], 0.0)), d_x[cert],
                           rtol=0, atol=1e-5)
        err_dot = margin / 8.0
        rates = {s: float((gap > s * err_dot).mean()) for s in (2.5, 3, 4, 6, 8)}
        print(f"m2={m2:3d} m={m:3d}: cert@scale " +
              " ".join(f"{s}:{rates[s]:.4f}" for s in (2.5, 3, 4, 6, 8)) +
              f"  gap med {np.median(gap):7.3f} err_dot {np.median(err_dot):.3f}"
              f"  ids: {ok_i}  dists: {ok_d}")
        timed(f"exact1p_h m2={m2} m={m}", exact1p_h_scalar, queries, db,
              sq, valid, hi, elo_max, m2=m2, m=m)


if __name__ == "__main__":
    main()
