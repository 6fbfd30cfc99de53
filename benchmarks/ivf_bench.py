"""IVF-Flat at 1M x 768 on one chip: MXU k-means build throughput +
nprobe sweep (QPS + recall@10 vs the certified-exact flat scan).

Structured data (low intrinsic dimension), the honest ANN workload —
compare against the HNSW rows in BASELINE.md (host build 85-94 vec/s at
this dimensionality; device traversal ~1.3k QPS)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax          # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index import IvfFlatIndex  # noqa: E402

N, D, Q, K = 1 << 20, 768, 4096, 10
CENTERS = 2048
NOISE = 0.25


def main():
    enable_persistent_jit_cache()
    # generate HOST-side: shipping a device-generated 3 GB dataset back
    # over the relay link takes minutes under congestion
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((CENTERS, D)).astype(np.float32)
    which = rng.integers(0, CENTERS, N)
    data_np = centers[which] + NOISE * rng.standard_normal(
        (N, D)).astype(np.float32)
    qwhich = rng.integers(0, CENTERS, Q)
    queries = centers[qwhich] + NOISE * rng.standard_normal(
        (Q, D)).astype(np.float32)
    del centers
    print("data generated", flush=True)

    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nprobe=8, seed=0)
    t0 = time.perf_counter()
    idx.add_batch(list(enumerate(data_np)))
    t_add = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx.train()
    t_train = time.perf_counter() - t0
    print(f"ingest {t_add:.1f}s; TRAIN {t_train:.1f}s "
          f"({N / t_train:,.0f} vec/s) — nlist={idx._nlist} "
          f"t_c={idx._t_c} spill_tiles={idx._s_t}", flush=True)

    # exact ground truth on a sample via the flat path of a plain FlatIndex
    from vectordb_tpu.index import FlatIndex
    sample = queries[:512]
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch(list(enumerate(data_np)))
    t0 = time.perf_counter()
    truth = flat.search_batch(sample, K)
    print(f"exact flat on 512 queries: {time.perf_counter() - t0:.1f}s",
          flush=True)
    want = [set(i for i, _ in row) for row in truth]

    for nprobe in (4, 8):
        idx.nprobe = nprobe
        idx.search_batch(queries[:Q], K)   # warm/compile
        t0 = time.perf_counter()
        iters = 4
        for it in range(iters):
            res = idx.search_batch(queries, K)
        per = (time.perf_counter() - t0) / iters
        got = idx.search_batch(sample, K)
        recall = np.mean([len(set(i for i, _ in g) & w) / K
                          for g, w in zip(got, want)])
        print(f"nprobe={nprobe:3d}: {Q / per:10,.0f} QPS "
              f"({per * 1e3:6.1f} ms/batch)  recall@10={recall:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
