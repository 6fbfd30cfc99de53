"""Fast-mode pool sweep at the headline shape: time + top-k agreement of
coarse_search_1p_fast as the refine pool shrinks. The fast contract is
approximate ids / exact distances, so the pool is a pure speed-vs-recall
knob; the refine is DMA-descriptor-bound, so time scales ~linearly in m.
"""

from __future__ import annotations

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


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    hi, lo = ck.split_hi_lo(db)
    st = {"db": db, "sq": sq, "norms": jnp.sqrt(sq),
          "valid": jnp.ones((N,), bool), "hi": hi,
          "elo": ck.residual_max_norm(db, hi)}
    qbase = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    staged = []
    for i in range(ITERS + 1):
        b = qbase + np.float32(i + 1)
        b.block_until_ready()
        staged.append(b)

    ref = jax.device_get(ck.coarse_search_1p(
        staged[0], st["db"], st["sq"], st["norms"], st["valid"], st["hi"],
        st["elo"], DistanceMetric.EUCLIDEAN, K)[1])[:, :K]

    real = ck._fast1p_pool
    for m in (12, 16, 22):
        ck._fast1p_pool = lambda k, t, m=m: (m, m)
        jax.clear_caches()
        run = lambda q: ck.coarse_search_1p_fast(
            q, st["db"], st["sq"], st["norms"], st["valid"], st["hi"],
            DistanceMetric.EUCLIDEAN, K)
        out0 = run(staged[0])
        ids = np.asarray(jax.device_get(out0[1]))[:, :K]
        agree = np.mean([len(set(a) & set(b)) / K
                         for a, b in zip(ids, ref)])
        start = time.perf_counter()
        outs = [run(staged[i]) for i in range(ITERS)]
        jax.device_get(outs)
        per = (time.perf_counter() - start) / ITERS
        print(f"fast m={m:3d}: {per * 1e3:7.2f} ms  {Q / per:8.0f} QPS  "
              f"agreement {agree:.4f}", flush=True)
    ck._fast1p_pool = real


if __name__ == "__main__":
    main()
