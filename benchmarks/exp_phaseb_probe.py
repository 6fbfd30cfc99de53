"""Probe: which phase-B stage of the pallas pipeline costs ~80 ms?

Times cumulative prefixes of the full pipeline in ONE jitted call each:
  A kernel only
  B + transpose
  C + top_k(m)
  D + candidate gather (db[cand]) summed
  E + exact refine (full)
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

from benchmarks.exp_pallas_coarse import (  # noqa: E402
    coarse_minima, N, D, Q, K, SUB, timeit)

M = 16


@functools.partial(jax.jit, static_argnames=("stage",))
def pipeline(queries, db, db_hi, db_lo, db_sq, sq_col, inv_col, stage):
    qT = queries.T
    qThi = qT.astype(jnp.bfloat16)
    qTlo = (qT - qThi.astype(jnp.float32)).astype(jnp.bfloat16)
    qsq = jnp.sum(queries * queries, axis=1, keepdims=True)
    minima = coarse_minima(qThi, qTlo, qsq.T, db_hi, db_lo, sq_col, inv_col, 1)
    if stage == "A":
        return minima.sum()
    minima = jax.lax.optimization_barrier(minima)
    if stage == "B":
        return minima.sum()
    neg_min, tile_idx = jax.lax.top_k(-minima, M)
    if stage == "C":
        return neg_min.sum() + tile_idx.sum()
    offs = jnp.arange(SUB, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * SUB + offs[None, None, :]).reshape(Q, M * SUB)
    cand_rows = db[cand]
    if stage == "D":
        return cand_rows.sum()
    dots = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                      preferred_element_type=jnp.float32, precision="highest")
    exact = jnp.sqrt(jnp.maximum(qsq + db_sq[cand] - 2.0 * dots, 0.0))
    neg2, pos = jax.lax.top_k(-exact, K)
    return neg2.sum() + pos.sum()


def main():
    from vectordb_tpu.cli import enable_persistent_jit_cache
    enable_persistent_jit_cache()
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    db_sq = jnp.sum(db * db, axis=1)
    qbase = jax.random.normal(kq, (Q, D), dtype=jnp.float32)

    @jax.jit
    def split_hi_lo(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    db_hi, db_lo = split_hi_lo(db)
    sq_col = db_sq.reshape(N, 1)
    inv_col = jnp.zeros((N, 1), jnp.float32)
    np.asarray(jnp.sum(db_hi.astype(jnp.float32)) + jnp.sum(db))

    for stage in ("A", "B", "C", "D", "E"):
        t = timeit(lambda q, s=stage: pipeline(q, db, db_hi, db_lo, db_sq,
                                               sq_col, inv_col, s), qbase)
        print(f"stage {stage}: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
