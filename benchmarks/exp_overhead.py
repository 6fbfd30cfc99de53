"""Where do the non-compute milliseconds go? H2D, submit, D2H, pipelining.

At Q=4096, N=2^20, d=768 the fast kernel is ~57 ms device-only but the
production e2e path measures ~136 ms/batch (30k QPS). This isolates the
overhead components and tests deeper pipelining + threaded H2D."""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.ops.coarse_kernel import split_hi_lo  # noqa: E402
from vectordb_tpu.ops.topk import (flat_search_batched,  # noqa: E402
                                   flat_search_batched_submit)

N, D, Q, K = 1 << 20, 768, 4096, 10
ITERS = 6


def bench(label, fn, iters=ITERS):
    fn(0)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label:48s} {best * 1e3:9.2f} ms   ({Q / best:8,.0f} qps)",
          flush=True)
    return best


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    hi, lo = split_hi_lo(db)
    state = {"db": db, "sq_norms": sq, "norms": jnp.sqrt(sq),
             "valid": jnp.ones((N,), bool), "hi": hi, "lo": lo}
    qnp = np.asarray(jax.device_get(
        jax.random.normal(kq, (Q, D), dtype=jnp.float32)))
    jax.device_get(jnp.sum(db) + jnp.sum(hi.astype(jnp.float32)))

    # 1. pure H2D: ship 12.6 MB of queries, wait until addressable
    def h2d(i):
        arr = jnp.asarray(qnp + np.float32(i))
        arr.block_until_ready()
    bench("H2D 4096x768 f32 (asarray+block)", h2d)

    # 1b. host-side add cost alone
    def hostadd(i):
        (qnp + np.float32(i)).sum()
    bench("host numpy add+sum (reference)", hostadd)

    # 2. e2e sync, fast + exact (production path)
    for mode in ("fast", "exact"):
        bench(f"e2e sync {mode}", lambda i, m=mode: flat_search_batched(
            qnp + np.float32(i), state, DistanceMetric.EUCLIDEAN, K, mode=m))

    # 3. pipelined at depths 2..4
    for mode in ("fast", "exact"):
        for depth in (2, 3, 4):
            def run(_, m=mode, dep=depth, batches=8):
                inflight = []
                for i in range(batches):
                    inflight.append(flat_search_batched_submit(
                        qnp + np.float32(i + 1), state,
                        DistanceMetric.EUCLIDEAN, K, mode=m))
                    if len(inflight) >= dep:
                        inflight.pop(0).collect()
                for h in inflight:
                    h.collect()
            t = bench(f"pipelined {mode} depth={depth} (8 batches)", run,
                      iters=3)
            print(f"    -> per-batch {t / 8 * 1e3:7.2f} ms "
                  f"({Q * 8 / t:8,.0f} qps)")

    # 4. threaded H2D: overlap query upload with device compute
    pool = ThreadPoolExecutor(2)
    for mode in ("fast", "exact"):
        def run(_, m=mode, batches=8, dep=2):
            def upload(i):
                return jnp.asarray(qnp + np.float32(i))
            futs = [pool.submit(upload, 1)]
            inflight = []
            for i in range(batches):
                qdev = futs.pop(0).result()
                if i + 1 < batches:
                    futs.append(pool.submit(upload, i + 2))
                inflight.append(flat_search_batched_submit(
                    qdev, state, DistanceMetric.EUCLIDEAN, K, mode=m))
                if len(inflight) >= dep:
                    inflight.pop(0).collect()
            for h in inflight:
                h.collect()
        t = bench(f"threaded-H2D pipelined {mode} (8 batches)", run, iters=3)
        print(f"    -> per-batch {t / 8 * 1e3:7.2f} ms "
              f"({Q * 8 / t:8,.0f} qps)")


if __name__ == "__main__":
    main()
