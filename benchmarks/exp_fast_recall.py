"""Fast-mode knobs: approx_min_k recall_target vs agreement/latency, and
the 4M x 768 f32-source path after the refine overhaul."""

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


def drain(anchor):
    jax.device_get(_tiny(anchor))


def timed(label, fn, *args, **kw):
    jax.device_get(fn(jnp.float32(0), *args, **kw))
    drain(args[0])
    start = time.perf_counter()
    outs = [fn(jnp.float32(i + 1), *args, **kw) for i in range(ITERS)]
    jax.device_get(outs)
    per = (time.perf_counter() - start) / ITERS
    print(f"{label:55s} {per * 1e3:9.2f} ms  ({Q / per:,.0f} qps dev-only)",
          flush=True)
    return per


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    norms = jnp.sqrt(sq)
    valid = jnp.ones((N,), bool)
    hi, lo = ck.split_hi_lo(db)
    queries = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    drain(queries)
    m_tiles = min(max(16, K + 6), N // ck.SUB)

    # exact ids for agreement measurement (certified path)
    qs = queries[:512]
    d_x, i_x, _ = ck._coarse_search_jit(
        qs, db, sq, norms, valid, hi, lo, "euclidean", K, m_tiles, 3, False,
        True, "mirrors")
    i_x = np.asarray(jax.device_get(i_x))

    # recall_target sweep via a local variant of the tile selection
    @functools.partial(jax.jit, static_argnames=("rt", "m"))
    def fast_ids(queries, db, sqn, valid, hi, rt, m):
        qp, d = queries.shape
        qT = queries.T
        qThi = qT.astype(jnp.bfloat16)
        qsq = jnp.sum(queries * queries, axis=1)
        minima = ck._coarse_minima_1p(qThi, qsq[None, :],
                                      hi, sqn.reshape(1, -1),
                                      jnp.zeros((1, db.shape[0]),
                                                jnp.float32),
                                      "euclidean", False)
        if rt is None:
            tile_idx = jax.lax.top_k(-minima, m)[1]
        else:
            tile_idx = jax.lax.approx_min_k(minima, m, recall_target=rt)[1]
        t_all = db.shape[0] // ck.SUB
        rows = db.reshape(t_all, ck.SUB, d)[tile_idx].reshape(
            qp, m * ck.SUB, d)
        dots = jnp.einsum("qcd,qd->qc", rows, queries,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        rsq = sqn.reshape(t_all, ck.SUB)[tile_idx].reshape(qp, m * ck.SUB)
        score2 = qsq[:, None] + rsq - 2.0 * dots
        vld = valid.reshape(t_all, ck.SUB)[tile_idx].reshape(qp, m * ck.SUB)
        score2 = jnp.where(vld, score2, jnp.inf)
        offs = jnp.arange(ck.SUB, dtype=jnp.int32)
        cand = (tile_idx[:, :, None] * ck.SUB
                + offs[None, None, :]).reshape(qp, m * ck.SUB)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.take_along_axis(cand, pos, axis=1)

    @functools.partial(jax.jit, static_argnames=("rt", "m"))
    def fast_scalar(off, queries, db, sqn, valid, hi, rt, m):
        ids = fast_ids(queries + off, db, sqn, valid, hi, rt, m)
        return jnp.sum(ids, dtype=jnp.int32)

    for rt, m in ((0.95, 16), (0.99, 16), (0.999, 16), (None, 16),
                  (0.95, 24), (0.99, 12)):
        label = f"fast rt={rt} m_tiles={m}"
        t = timed(label, fast_scalar, queries, db, sq, valid, hi, rt=rt, m=m)
        ids = np.asarray(jax.device_get(
            fast_ids(qs, db, sq, valid, hi, rt, m)))
        overlap = np.mean([len(set(a) & set(b)) / K
                           for a, b in zip(ids, i_x)])
        print(f"    -> set overlap vs exact: {overlap:.6f}")


if __name__ == "__main__":
    main()
