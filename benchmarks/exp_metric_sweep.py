"""Exact QPS for ALL THREE metrics at the headline shape (2^20 x 768,
k=10, Q=4096) through the production dispatcher — BASELINE.md's headline
is euclidean; this prices cosine (1 - sim, clamped) and dot (negated)
through the same certified 1-pass pipeline.

    python benchmarks/exp_metric_sweep.py [--q=4096]
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

N, D, K = 1 << 20, 768, 10
Q = 4096
for a in sys.argv[1:]:
    if a.startswith("--q="):
        Q = int(a.split("=")[1])


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

    for metric in (DistanceMetric.EUCLIDEAN, DistanceMetric.COSINE,
                   DistanceMetric.DOT_PRODUCT):
        t0 = time.perf_counter()
        out = flat_search_batched_submit(qbase, state, metric, K,
                                         mode="exact").collect()
        print(f"{metric.value}: compile+first "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        # sanity: sorted ascending, finite
        dd = [r[1] for r in out[0]] if isinstance(out, list) else None
        best = None
        for depth in (2, 3):
            inflight = []
            t0 = time.perf_counter()
            for i in range(8):
                inflight.append(flat_search_batched_submit(
                    staged[i % len(staged)], state, metric, K,
                    mode="exact"))
                if len(inflight) >= depth:
                    inflight.pop(0).collect()
            for h in inflight:
                h.collect()
            per = (time.perf_counter() - t0) / 8
            best = per if best is None else min(best, per)
        print(f"{metric.value}: {best * 1e3:.1f} ms/batch "
              f"{Q / best:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
