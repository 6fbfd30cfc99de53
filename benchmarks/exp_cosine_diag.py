"""Diagnose the cosine throughput gap (round-2 verdict weak item:
cosine 52.0k vs euclidean 61.8k QPS at the headline shape).

Two hypotheses:
  (a) kernel cost — the cosine score needs two extra VPU multiplies per
      (row, query) in the minima kernel;
  (b) certification — the cosine margin (err * qinv / xnmin) is looser,
      so more queries fail the 1-pass certificate and re-run through the
      bf16x3 tier (a whole extra multi-pass scan for the batch chunk).

This experiment separates them: per metric it times the 1-pass call
ALONE (no fallback) and reports the certified fraction.

Run: python benchmarks/exp_cosine_diag.py [--logn 20] [--q 4096]
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    n, d, q, k = 1 << args.logn, args.d, args.q, args.k

    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (n, d), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    norms = jnp.sqrt(sq)
    valid = jnp.ones((n,), bool)
    hi, lo = ck.split_hi_lo(db)
    elo = ck.residual_max_norm(db, hi)
    qbase = jax.random.normal(kq, (q, d), dtype=jnp.float32)
    np.asarray(jnp.sum(hi.astype(jnp.float32)))  # materialize

    staged = []
    for i in range(max(args.iters, 4)):
        b = qbase + np.float32(i + 1)
        b.block_until_ready()
        staged.append(b)

    for metric in (DistanceMetric.EUCLIDEAN, DistanceMetric.DOT_PRODUCT,
                   DistanceMetric.COSINE):
        fn = lambda x: ck.coarse_search_1p(x, db, sq, norms, valid, hi,
                                           elo, metric, k)
        out = fn(staged[0])
        jax.block_until_ready(out)
        cert = np.asarray(out[2])
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(staged[i]))
            times.append(time.perf_counter() - t0)
        per = min(times)
        print(f"{metric.value:12s}: 1p-alone {per * 1e3:7.1f} ms/batch "
              f"({q / per:8,.0f} QPS-no-fallback)  certified "
              f"{cert.mean():.4f} ({int((~cert).sum())}/{q} uncertified)",
              flush=True)


if __name__ == "__main__":
    main()
