"""Experiment: where does the exact-path time go, and what's faster?

Sweeps, on the real chip at the headline workload (N=2^20, d=768, Q=1024,
k=10, euclidean):

  1. matmul-only floors at each precision tier (highest / high / default)
  2. exact tile-min+refine at tile rows {16, 32, 64, 128} (precision=highest)
  3. the same program at precision=high (bf16x3) — time + top-10 agreement
  4. coarse tile-min at default precision + exact refine ("fast-tiled")
  5. bf16-stored database coarse pass (halves scan bytes) + exact refine

Run:  python benchmarks/exp_exact_sweep.py
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
ITERS = 5


def timeit(fn, qbase, iters=ITERS):
    np.asarray(jax.tree_util.tree_leaves(fn(qbase))[0])  # compile + warm
    times = []
    for i in range(iters):
        q = qbase + np.float32(i + 1)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(q))[0])
        times.append(time.perf_counter() - t0)
    return min(times)


@functools.partial(jax.jit, static_argnames=("precision",))
def mm_only(queries, db, precision):
    p = None if precision == "default" else precision
    return jnp.matmul(queries, db.T, precision=p).sum(axis=1)


def refine(queries, db, db_sq, cand):
    cand_rows = db[cand]
    dots = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                      preferred_element_type=jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    exact = jnp.sqrt(jnp.maximum(q_sq + db_sq[cand] - 2.0 * dots, 0.0))
    neg, pos = jax.lax.top_k(-exact, K)
    return -neg, jnp.take_along_axis(cand, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("tile", "precision"))
def tiled(queries, db, db_sq, tile, precision):
    p = None if precision == "default" else precision
    dots = jnp.matmul(queries, db.T, precision=p)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    d2 = jnp.maximum(q_sq + db_sq[None, :] - 2.0 * dots, 0.0)
    t = N // tile
    minima = d2.reshape(Q, t, tile).min(axis=-1)
    _, tile_idx = jax.lax.top_k(-minima, K)
    offs = jnp.arange(tile, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * tile + offs[None, None, :]).reshape(Q, K * tile)
    return refine(queries, db, db_sq, cand)


@functools.partial(jax.jit, static_argnames=("tile",))
def tiled_bf16(queries, db, db16, db_sq, tile):
    """Coarse pass on a bf16 copy of the db (half the HBM bytes, native
    single-pass MXU), exact f32 refine from the f32 db."""
    q16 = queries.astype(jnp.bfloat16)
    dots = jnp.matmul(q16, db16.T, preferred_element_type=jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    d2 = q_sq + db_sq[None, :] - 2.0 * dots
    t = N // tile
    minima = d2.reshape(Q, t, tile).min(axis=-1)
    _, tile_idx = jax.lax.top_k(-minima, K)
    offs = jnp.arange(tile, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * tile + offs[None, None, :]).reshape(Q, K * tile)
    return refine(queries, db, db_sq, cand)


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
    db16 = db.astype(jnp.bfloat16)
    db_sq = jnp.sum(db * db, axis=1)
    qbase = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    np.asarray(jnp.sum(db) + jnp.sum(db16.astype(jnp.float32)))

    results = {}

    for prec in ("highest", "high", "default"):
        t = timeit(lambda q, p=prec: mm_only(q, db, p), qbase)
        print(f"matmul-only {prec:8s}: {t*1e3:8.1f} ms  ({Q/t:8.0f} qps-floor)")

    ref_ids = None
    for tile in (16, 32, 64, 128):
        t = timeit(lambda q, tl=tile: tiled(q, db, db_sq, tl, "highest"), qbase)
        out = tiled(qbase, db, db_sq, tile, "highest")
        ids = np.asarray(out[1])
        if ref_ids is None:
            ref_ids = ids
        agr = agreement(ids, ref_ids)
        print(f"exact tiled highest tile={tile:4d}: {t*1e3:8.1f} ms  "
              f"({Q/t:8.0f} qps)  agree={agr:.4f}")
        results[("highest", tile)] = t

    for prec in ("high", "default"):
        for tile in (16, 64):
            t = timeit(lambda q, tl=tile, p=prec: tiled(q, db, db_sq, tl, p), qbase)
            ids = np.asarray(tiled(qbase, db, db_sq, tile, prec)[1])
            agr = agreement(ids, ref_ids)
            print(f"tiled {prec:7s} tile={tile:4d}: {t*1e3:8.1f} ms  "
                  f"({Q/t:8.0f} qps)  top-{K} agree={agr:.4f}")

    for tile in (16, 64):
        t = timeit(lambda q, tl=tile: tiled_bf16(q, db, db16, db_sq, tl), qbase)
        ids = np.asarray(tiled_bf16(qbase, db, db16, db_sq, tile)[1])
        agr = agreement(ids, ref_ids)
        print(f"bf16-db coarse tile={tile:4d}: {t*1e3:8.1f} ms  "
              f"({Q/t:8.0f} qps)  top-{K} agree={agr:.4f}")


if __name__ == "__main__":
    main()
