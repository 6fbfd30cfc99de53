"""Hardware validation of the production coarse-kernel path at headline
scale: correctness vs the XLA exact path, cert rate, and QPS for exact and
fast modes at N=2^20 x 768, k=10, Q in {1024, 2048}.

Run:  python benchmarks/validate_coarse.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N, D, K = 1 << 20, 768, 10
ITERS = 5


def main():
    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.ops import coarse_kernel
    from vectordb_tpu.ops.topk import flat_search_exact_tiled

    enable_persistent_jit_cache()
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    db_sq = jnp.sum(db * db, axis=1)
    norms = jnp.sqrt(db_sq)
    valid = jnp.ones((N,), bool)
    qbase = jax.random.normal(kq, (2048, D), dtype=jnp.float32)

    # XLA exact ground truth at Q=1024 (before the mirrors exist, for HBM)
    ref_d, ref_i = flat_search_exact_tiled(qbase[:1024], db, db_sq, norms,
                                           valid, DistanceMetric.EUCLIDEAN, K)
    ref_d = np.asarray(ref_d)
    ref_i = np.asarray(ref_i)

    hi, lo = coarse_kernel.split_hi_lo(db)
    np.asarray(jnp.sum(hi.astype(jnp.float32)))

    def run(queries, exact):
        return coarse_kernel.coarse_search(
            queries, db, db_sq, norms, valid, hi, lo,
            DistanceMetric.EUCLIDEAN, K, exact=exact)

    # correctness + cert at Q=1024
    d_, i_, cert = run(qbase[:1024], exact=True)
    d_, i_, cert = np.asarray(d_), np.asarray(i_), np.asarray(cert)
    ids_match = np.array_equal(i_, ref_i)
    print(f"certified-exact: ids match XLA exact: {ids_match}, "
          f"max |dist diff|: {np.abs(d_ - ref_d).max():.2e}, "
          f"cert rate: {cert.mean():.4f}")

    d_f, i_f, _ = run(qbase[:1024], exact=False)
    i_f = np.asarray(i_f)
    agree = np.mean([len(set(a.tolist()) & set(b.tolist())) / K
                     for a, b in zip(i_f, ref_i)])
    print(f"fast: top-{K} id agreement: {agree:.5f}")

    # throughput
    for q, exact in ((1024, True), (1024, False), (2048, True),
                     (2048, False)):
        fn = lambda x, e=exact: run(x, e)
        np.asarray(fn(qbase[:q])[0])
        times = []
        for i in range(ITERS):
            x = qbase[:q] + np.float32(i + 1)
            t0 = time.perf_counter()
            np.asarray(fn(x)[0])
            times.append(time.perf_counter() - t0)
        t = min(times)
        label = "exact" if exact else "fast "
        print(f"{label} Q={q}: {t*1e3:7.1f} ms  ({q/t:8.0f} qps)")


if __name__ == "__main__":
    main()
