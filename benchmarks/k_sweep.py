"""k-sweep of the flat-scan paths (round-1 item 9 + round-3 item 8).

Certified-exact path: MAX_K is 256 — past k=32 the refine pools widen
(tile pool m grows as k + ~2.5*sqrt(SUB*k)) and the DMA refine kernel
chunks over tile groups, so large k costs DMA bandwidth linearly instead
of dropping to the XLA scan (9.1k QPS). Measured r2: k=100 is 3.79x the
k=10 cost — argued to be DMA physics for the CERTIFIED path.

Fast mode (--mode=fast, round-3 item 8): hierarchical selection with
m >= k and no refine-pool certificate — the DMA-physics argument does
not bind, so this sweep measures whether large k stays cheap there, and
reports measured top-k id agreement vs the exact path at every k.

    python benchmarks/k_sweep.py [--q=4096] [--mode=exact|fast|both]
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
MODES = ["exact"]
for a in sys.argv:
    if a.startswith("--q="):
        Q = int(a.split("=")[1])
    if a.startswith("--mode="):
        v = a.split("=")[1]
        MODES = ["exact", "fast"] if v == "both" else [v]
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

    results: dict = {}
    agreement: dict = {}
    for mode in MODES:
        results[mode] = {}
        for k in KS:
            # compile + warm
            t0 = time.perf_counter()
            warm = flat_search_batched_submit(
                qbase, state, DistanceMetric.EUCLIDEAN, k,
                mode=mode).collect()
            print(f"[{mode}] k={k}: compile+first "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            if mode == "fast":
                # measured top-k id agreement vs the exact path on the
                # same batch (fast mode has no certificate; this is its
                # empirical accuracy row)
                exact = flat_search_batched_submit(
                    qbase, state, DistanceMetric.EUCLIDEAN, k,
                    mode="exact").collect()
                hits = sum(
                    len(set(np.asarray(warm[1][i]).tolist())
                        & set(np.asarray(exact[1][i]).tolist()))
                    for i in range(Q))
                agreement[k] = hits / (Q * k)
                print(f"[fast] k={k}: top-k agreement "
                      f"{agreement[k]:.4f}", flush=True)
            best = None
            for depth in (2, 3):
                inflight = []
                t0 = time.perf_counter()
                for i in range(8):
                    inflight.append(flat_search_batched_submit(
                        staged[i % len(staged)], state,
                        DistanceMetric.EUCLIDEAN, k, mode=mode))
                    if len(inflight) >= depth:
                        inflight.pop(0).collect()
                for h in inflight:
                    h.collect()
                per = (time.perf_counter() - t0) / 8
                best = per if best is None else min(best, per)
            results[mode][k] = Q / best
            print(f"[{mode}] k={k}: {best * 1e3:.1f} ms/batch  "
                  f"{Q / best:,.0f} QPS", flush=True)

    for mode in MODES:
        base = results[mode][KS[0]]
        for k in KS[1:]:
            agr = (f"  agreement={agreement[k]:.4f}"
                   if mode == "fast" and k in agreement else "")
            print(f"[{mode}] k={k} vs k={KS[0]}: "
                  f"{base / results[mode][k]:.2f}x slower{agr}",
                  flush=True)


if __name__ == "__main__":
    main()
