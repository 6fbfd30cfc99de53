"""k-sweep of the certified-exact coarse path (VERDICT round-1 item 9:
"bench row at k=100 within 2x of k=10 throughput").

MAX_K is 256: past k=32 the refine pools widen (tile pool m grows as
k + ~2.5*sqrt(SUB*k)) and the DMA refine kernel chunks over tile groups,
so large k should cost bandwidth linearly instead of dropping to the
XLA scan (9.1k QPS). This measures exact QPS at k in {10, 32, 100, 256}
at the headline shape (2^20 x 768, Q=4096) with the pipelined
methodology of bench.py.

    python benchmarks/k_sweep.py [--q=4096]
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
from vectordb_tpu.ops.coarse_kernel import (residual_max_norm,  # noqa: E402
                                            split_hi_lo)
from vectordb_tpu.ops.topk import flat_search_batched_submit  # noqa: E402

N, D = 1 << 20, 768
Q = 4096
for a in sys.argv:
    if a.startswith("--q="):
        Q = int(a.split("=")[1])
KS = [10, 32, 100, 256]


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    hi, lo = split_hi_lo(db)
    state = {"db": db, "sq_norms": sq, "norms": jnp.sqrt(sq),
             "valid": jnp.ones((N,), dtype=bool), "hi": hi, "lo": lo,
             "elo_max": residual_max_norm(db, hi)}
    qbase = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    staged = []
    for i in range(8):
        b = qbase + np.float32(i + 1)
        jax.device_get(b[0])
        staged.append(b)

    results = {}
    for k in KS:
        # compile + warm
        t0 = time.perf_counter()
        flat_search_batched_submit(qbase, state, DistanceMetric.EUCLIDEAN,
                                   k, mode="exact").collect()
        print(f"k={k}: compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)
        best = None
        for depth in (2, 3):
            inflight = []
            t0 = time.perf_counter()
            for i in range(8):
                inflight.append(flat_search_batched_submit(
                    staged[i % len(staged)], state,
                    DistanceMetric.EUCLIDEAN, k, mode="exact"))
                if len(inflight) >= depth:
                    inflight.pop(0).collect()
            for h in inflight:
                h.collect()
            per = (time.perf_counter() - t0) / 8
            best = per if best is None else min(best, per)
        results[k] = Q / best
        print(f"k={k}: {best * 1e3:.1f} ms/batch  {Q / best:,.0f} QPS",
              flush=True)

    base = results[KS[0]]
    for k in KS[1:]:
        print(f"k={k} vs k={KS[0]}: {base / results[k]:.2f}x slower",
              flush=True)


if __name__ == "__main__":
    main()
