"""HNSW microbenchmark — the reference's criterion workload
(benches/hnsw_bench.rs: query at {1k, 10k} x 128-d vs flat; build 1k x
128-d), plus device-traversal timing and an ef sweep with recall.
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

from vectordb_tpu import (DistanceMetric, FlatIndex, HnswIndex,  # noqa: E402
                          HnswParams, Vector)


def build(n, d, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.random((n, d)).astype(np.float32)
    hnsw = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=seed))
    start = time.perf_counter()
    hnsw.build_batch([(i, Vector(data[i])) for i in range(n)])
    build_s = time.perf_counter() - start
    return data, hnsw, build_s


def main():
    print("== build throughput (reference: hnsw_bench.rs build 1k x 128) ==")
    for n, d in [(1_000, 128), (5_000, 128)]:
        _, _, build_s = build(n, d)
        print(f"  n={n:>6} d={d}: {build_s:.2f}s  ({n / build_s:,.0f} vec/s)")

    print("== query: hnsw vs flat (reference: hnsw_bench.rs query) ==")
    for n, d in [(1_000, 128), (10_000, 128)]:
        data, hnsw, _ = build(n, d)
        flat = FlatIndex(DistanceMetric.EUCLIDEAN)
        flat.add_batch([(i, data[i]) for i in range(n)])
        rng = np.random.default_rng(1)
        queries = rng.random((20, d)).astype(np.float32)
        start = time.perf_counter()
        for qi in range(20):
            hnsw.search(Vector(queries[qi]), 10)
        hnsw_per = (time.perf_counter() - start) / 20
        flat.search_batch(queries, 10)  # warm
        start = time.perf_counter()
        flat.search_batch(queries + np.float32(1), 10)
        flat_per = (time.perf_counter() - start) / 20
        print(f"  n={n:>6}: hnsw {hnsw_per * 1e3:.2f}ms/query, "
              f"flat(batched) {flat_per * 1e3:.3f}ms/query")

    print("== ef sweep: recall@10 + latency (n=5000, d=64) ==")
    rng = np.random.default_rng(2)
    n, d, k = 5_000, 64, 10
    data = rng.random((n, d)).astype(np.float32)
    hnsw = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=2))
    hnsw.build_batch([(i, Vector(data[i])) for i in range(n)])
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch([(i, data[i]) for i in range(n)])
    queries = rng.random((30, d)).astype(np.float32)
    truth = flat.search_batch(queries, k)
    for ef in [16, 32, 64, 128, 256]:
        start = time.perf_counter()
        recall = 0.0
        for qi in range(30):
            got = {i for i, _ in hnsw.search_with_ef(Vector(queries[qi]), k, ef)}
            recall += len(got & {i for i, _ in truth[qi]}) / k
        per = (time.perf_counter() - start) / 30
        print(f"  ef={ef:>4}: recall@10={recall / 30:.3f}  "
              f"{per * 1e3:.2f}ms/query")


if __name__ == "__main__":
    main()
