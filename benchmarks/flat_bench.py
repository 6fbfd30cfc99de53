"""Flat-scan microbenchmark — the reference's criterion workload
(benches/search_bench.rs: {100, 1k, 10k} x 128-d, k=10) plus larger
TPU-relevant sizes.

Run on whatever backend is active (real chip by default, CPU with
JAX_PLATFORMS=cpu). Prints a table; every timed iteration uses distinct
inputs and fetches results to host, so async dispatch can't flatter the
numbers.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("VDB_CPU"):
    # NOTE: use jax.config (not JAX_PLATFORMS) — this environment preloads
    # jax via sitecustomize and the env-var path can wedge
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vectordb_tpu import DistanceMetric, FlatIndex, Vector  # noqa: E402


def bench_flat(n, d, k=10, q=1, iters=5):
    rng = np.random.default_rng(0)
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add_batch([(i, db[i]) for i in range(n)])
    queries = rng.standard_normal((q, d)).astype(np.float32)
    idx.search_batch(queries, k)  # compile + warm
    times = []
    for it in range(iters):
        shifted = queries + np.float32(it + 1)
        start = time.perf_counter()
        idx.search_batch(shifted, k)
        times.append(time.perf_counter() - start)
    return min(times)


def capture_trace(logdir: str, n=100_000, d=128, q=64, k=10):
    """Capture a jax.profiler device trace of a few production searches
    (utils/profiling.trace + the annotate() phases wired into
    index/flat.py, index/ivf.py, index/pq.py and the HTTP handler show
    up as named spans). View with TensorBoard/xprof pointed at
    ``logdir``."""
    from vectordb_tpu.utils.profiling import trace

    rng = np.random.default_rng(0)
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add_batch([(i, db[i]) for i in range(n)])
    queries = rng.standard_normal((q, d)).astype(np.float32)
    idx.search_batch(queries, k)  # compile outside the trace
    with trace(logdir):
        for it in range(3):
            idx.search_batch(queries + np.float32(it + 1), k)
    print(f"device trace captured under {logdir}")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the "
                         "100k x 128 search into DIR and exit")
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev}")
    if args.trace:
        capture_trace(args.trace)
        return
    print(f"{'n':>9} {'d':>5} {'Q':>4} {'k':>3} {'latency':>12} {'QPS':>12}")
    for n, d, q in [(100, 128, 1), (1_000, 128, 1), (10_000, 128, 1),
                    (100_000, 128, 1), (100_000, 128, 64),
                    (1 << 20, 768, 64)]:
        try:
            per = bench_flat(n, d, q=q)
        except Exception as e:
            print(f"{n:>9} {d:>5} {q:>4}  skipped: {e}")
            continue
        print(f"{n:>9} {d:>5} {q:>4} {10:>3} {per * 1e3:>10.2f}ms "
              f"{q / per:>12,.0f}")


if __name__ == "__main__":
    main()
