"""Decompose the coarse-kernel search pipeline's per-batch device time at
the headline shape (N=2^20, d=768, Q=4096, k=10).

Measurement hygiene for the relay platform (see DEVELOPMENT.md):
  * block_until_ready does NOT block through the relay — every stage is
    wrapped in a jit that reduces its outputs to scalars, and the scalars
    are fetched (one device_get per stage) to force execution;
  * scalar-only outputs mean queued iterations don't pin GB-scale result
    buffers (which thrashes HBM: db + mirrors already hold 8 GB);
  * a drain() fetch separates stages so queued work can't contaminate the
    next stage's clock;
  * inputs vary per iteration (a traced scalar offset folded into the
    query operand) so the relay can't serve cached results.
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
from vectordb_tpu.ops.topk import flat_search_batched  # noqa: E402

N, D, Q, K = 1 << 20, 768, 4096, 10
ITERS = 6


@jax.jit
def _tiny(x):
    return x.ravel()[0] + 0.0


def drain(anchor):
    """Stream barrier: a fresh tiny computation queued after everything
    else, fetched to host."""
    jax.device_get(_tiny(anchor))


def timed(label, fn, *args, **kw):
    """fn must return scalars (or tiny arrays). Launch ITERS distinct-input
    iterations back-to-back, force with one fetch, report total/ITERS."""
    jax.device_get(fn(jnp.float32(0), *args, **kw))  # compile/warm
    drain(args[0])
    start = time.perf_counter()
    outs = [fn(jnp.float32(i + 1), *args, **kw) for i in range(ITERS)]
    jax.device_get(outs)
    per = (time.perf_counter() - start) / ITERS
    print(f"{label:55s} {per * 1e3:9.2f} ms", flush=True)
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

    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qTlo = (qT - qThi.astype(jnp.float32)).astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1)
    qrow = qsq[None, :]
    col = sq.reshape(1, N)
    inv_col = jnp.zeros((1, N), jnp.float32)
    m_tiles = min(max(16, K + 6), N // ck.SUB)
    minima = ck._coarse_minima(qThi, qTlo, qrow, hi, lo, col, inv_col, 1,
                               "euclidean", False)
    tile_idx = jax.lax.top_k(-minima, m_tiles)[1]
    drain(tile_idx)

    # --- A: coarse minima kernel (incl. the barrier transpose) ---
    @functools.partial(jax.jit, static_argnames=("passes",))
    def stage_a(off, qThi, qTlo, qrow, hi, lo, col, inv_col, passes):
        m = ck._coarse_minima(qThi + off.astype(jnp.bfloat16), qTlo, qrow,
                              hi, lo, col, inv_col, passes, "euclidean",
                              False)
        return m.ravel()[0]

    t_a1 = timed("A1 coarse minima passes=1 (fast scan)", stage_a, qThi,
                 qTlo, qrow, hi, lo, col, inv_col, passes=1)
    t_a3 = timed("A3 coarse minima passes=3 (exact scan)", stage_a, qThi,
                 qTlo, qrow, hi, lo, col, inv_col, passes=3)

    # --- B: tile top_k over the materialized minima ---
    @jax.jit
    def stage_b(off, minima):
        ti = jax.lax.top_k(-(minima + off), m_tiles)[1]
        return jnp.sum(ti, dtype=jnp.int32)

    @jax.jit
    def stage_b0(off, minima):
        return jnp.sum(minima + off)  # the +off add alone, for subtraction

    t_badd = timed("B0 minima+off add alone (measurement tax)", stage_b0,
                   minima)
    t_b = timed(f"B  tile top_k m={m_tiles} (incl. B0 tax)", stage_b, minima)

    # --- C: refine (gather + f32-highest einsum + topk) ---
    @jax.jit
    def stage_c_gather(off, queries, tile_idx, db):
        offs = jnp.arange(ck.SUB, dtype=jnp.int32)
        cand = (tile_idx[:, :, None] * ck.SUB + offs[None, None, :]).reshape(
            Q, m_tiles * ck.SUB)
        rows = db[cand]
        return jnp.sum(rows) + off

    @jax.jit
    def stage_c(off, queries, tile_idx, db, sqn, valid):
        qq = queries + off
        offs = jnp.arange(ck.SUB, dtype=jnp.int32)
        cand = (tile_idx[:, :, None] * ck.SUB + offs[None, None, :]).reshape(
            Q, m_tiles * ck.SUB)
        rows = db[cand]
        dots = jnp.einsum("qcd,qd->qc", rows, qq,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        qsq2 = jnp.sum(qq * qq, axis=1)
        score2 = qsq2[:, None] + sqn[cand] - 2.0 * dots
        score2 = jnp.where(valid[cand], score2, jnp.inf)
        neg, pos = jax.lax.top_k(-score2, K)
        return jnp.sum(neg) + jnp.sum(pos, dtype=jnp.int32).astype(jnp.float32)

    t_cg = timed("C1 refine row gather alone (+sum)", stage_c_gather,
                 queries, tile_idx, db)
    t_c = timed("C  refine full (gather+einsum+topk)", stage_c, queries,
                tile_idx, db, sq, valid)

    # --- D: full pipeline, device in / scalar out ---
    @functools.partial(jax.jit, static_argnames=("passes", "cert"))
    def stage_d(off, queries, db, sqn, norms, valid, hi, lo, passes, cert):
        d_, i_, c_ = ck._coarse_search_jit(
            queries + off, db, sqn, norms, valid, hi, lo, "euclidean", K,
            m_tiles, passes, False, cert, "mirrors")
        return jnp.sum(d_), jnp.sum(i_, dtype=jnp.int32), jnp.sum(c_)

    t_d1 = timed("D1 full pipeline fast (scalar out)", stage_d, queries, db,
                 sq, norms, valid, hi, lo, passes=1, cert=False)
    t_d3 = timed("D3 full pipeline exact+cert (scalar out)", stage_d,
                 queries, db, sq, norms, valid, hi, lo, passes=3, cert=True)

    # --- E: transfers and the production wrapper (synchronous each) ---
    qnp = np.asarray(queries)
    state = {"db": db, "sq_norms": sq, "norms": norms, "valid": valid,
             "hi": hi, "lo": lo}

    def sync_timed(label, fn):
        fn(qnp)  # warm
        drain(queries)
        times = []
        for i in range(ITERS):
            x = qnp + np.float32(i + 1)
            start = time.perf_counter()
            fn(x)
            times.append(time.perf_counter() - start)
        best = min(times)
        print(f"{label:55s} {best * 1e3:9.2f} ms", flush=True)
        return best

    t_h2d = sync_timed("E1 H2D queries upload + tiny fetch",
                       lambda x: jax.device_get(_tiny(jnp.asarray(x))))
    d_out, i_out, cert = ck._coarse_search_jit(
        queries, db, sq, norms, valid, hi, lo, "euclidean", K, m_tiles, 3,
        False, True, "mirrors")
    drain(queries)
    start = time.perf_counter()
    jax.device_get((d_out, i_out, cert))
    t_d2h = time.perf_counter() - start
    print(f"{'E2 D2H fetch of (dists, idx, cert)':55s} {t_d2h * 1e3:9.2f} ms",
          flush=True)

    t_pf = sync_timed(
        "E4 production flat_search_batched fast",
        lambda x: flat_search_batched(x, state, DistanceMetric.EUCLIDEAN, K,
                                      mode="fast"))
    t_pe = sync_timed(
        "E5 production flat_search_batched exact",
        lambda x: flat_search_batched(x, state, DistanceMetric.EUCLIDEAN, K,
                                      mode="exact"))

    print()
    print(f"A1+B+C = {(t_a1 + t_b - t_badd + t_c) * 1e3:.1f} ms "
          f"vs D1 {t_d1 * 1e3:.1f} ms")
    print(f"A3+B+C = {(t_a3 + t_b - t_badd + t_c) * 1e3:.1f} ms "
          f"vs D3 {t_d3 * 1e3:.1f} ms")
    print(f"E4-D1 (dispatch+H2D+D2H+host) = {(t_pf - t_d1) * 1e3:.1f} ms; "
          f"E5-D3 = {(t_pe - t_d3) * 1e3:.1f} ms")
    ideal1 = 2 * Q * N * D / 197e12 * 1e3
    print(f"MXU ideal {ideal1:.1f} ms/pass -> A1 eff {ideal1 / t_a1 / 1e3:.0%}"
          f", A3 eff {3 * ideal1 / t_a3 / 1e3:.0%}")


if __name__ == "__main__":
    main()
