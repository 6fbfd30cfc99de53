"""Quick device-only re-measurement of the full coarse pipeline (D1 fast /
D3 exact) after refine/tile-selection changes. Also validates exact-path
results against the f32 XLA scan on-device."""

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
from vectordb_tpu.ops import topk as tk  # noqa: E402

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

    # correctness spot-check on-device vs the f32 XLA scan (small Q slice)
    qs = queries[:256]
    d_c, i_c, cert = ck._coarse_search_jit(
        qs, db, sq, norms, valid, hi, lo, "euclidean", K, m_tiles, 3, False,
        True, "mirrors")
    d_x, i_x = tk.flat_search(qs, db, sq, norms, valid,
                              __import__("vectordb_tpu.distance",
                                         fromlist=["DistanceMetric"]
                                         ).DistanceMetric.EUCLIDEAN, K)
    d_c, i_c, cert, d_x, i_x = jax.device_get((d_c, i_c, cert, d_x, i_x))
    n_cert = int(cert.sum())
    id_eq = (i_c == i_x).mean()
    dd = np.max(np.abs(d_c - d_x))
    print(f"\ncertified {n_cert}/256; id match vs f32 scan {id_eq:.6f}; "
          f"max |dist diff| {dd:.3e}")

    # fast-mode agreement vs exact
    d_f, i_f, _ = ck._coarse_search_jit(
        qs, db, sq, norms, valid, hi, lo, "euclidean", K, m_tiles, 1, False,
        False, "mirrors")
    d_f, i_f = jax.device_get((d_f, i_f))
    overlap = np.mean([len(set(a) & set(b)) / K for a, b in zip(i_f, i_x)])
    posmatch = (i_f == i_x).mean()
    print(f"fast-mode top-{K}: set overlap {overlap:.6f}, positional "
          f"{posmatch:.6f}, max |dist diff on matches| "
          f"{np.max(np.abs(np.where(i_f == i_x, d_f - d_x, 0.0))):.3e}")


if __name__ == "__main__":
    main()
