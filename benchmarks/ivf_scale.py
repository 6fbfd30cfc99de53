"""IVF-Flat at 4M x 768 on one chip — the device-ANN lane at scale
(VERDICT round-1 item 4: supersede the device-HNSW demo with a measured
device-side ANN path at >= 1M rows).

Build (bulk add + MXU k-means train + repack), then an nprobe sweep with
recall@10 against the certified-exact flat scan over the SAME device
state (FlatIndex.search_batch on the IVF instance — no second copy).

Usage:  python benchmarks/ivf_scale.py [--n22|--n23] [--bf16]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index import IvfFlatIndex  # noqa: E402
from vectordb_tpu.index.flat import FlatIndex  # noqa: E402

N = 1 << 23 if "--n23" in sys.argv else 1 << 22
D, Q, K = 768, 4096, 10
CENTERS, NOISE = 4096, 0.25
STORAGE = "bf16" if "--bf16" in sys.argv else "f32"


def main():
    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((CENTERS, D)).astype(np.float32)
    which = rng.integers(0, CENTERS, N)
    data = centers[which] + NOISE * rng.standard_normal(
        (N, D)).astype(np.float32)
    qwhich = rng.integers(0, CENTERS, Q)
    queries = centers[qwhich] + NOISE * rng.standard_normal(
        (Q, D)).astype(np.float32)
    del centers, which, qwhich
    print(f"data ready: N={N} d={D} storage={STORAGE}", flush=True)

    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nprobe=8, seed=0,
                       auto_train_min=10 ** 12, storage=STORAGE)
    t0 = time.perf_counter()
    step = 1 << 20
    for lo in range(0, N, step):
        idx.add_batch(list(enumerate(data[lo:lo + step], start=lo)))
        print(f"  added {min(lo + step, N)}/{N} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    t_add = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx.train()
    t_train = time.perf_counter() - t0
    print(f"BUILD: add {t_add:.0f}s + train {t_train:.0f}s "
          f"-> {N / (t_add + t_train):,.0f} vec/s e2e "
          f"(nlist={idx._nlist})", flush=True)

    # exact oracle over the same device state (certified flat path)
    t0 = time.perf_counter()
    truth = FlatIndex.search_batch(idx, queries, K)
    print(f"oracle: {time.perf_counter() - t0:.1f}s first batch "
          f"(exact over stored values)", flush=True)
    truth_ids = [set(i for i, _ in row) for row in truth]

    for nprobe in (2, 4, 8, 16):
        idx.nprobe = nprobe
        res = idx.search_batch(queries, K)        # warm/compile
        t0 = time.perf_counter()
        res = idx.search_batch(queries + np.float32(0.001), K)
        per = time.perf_counter() - t0
        res0 = idx.search_batch(queries, K)
        rec = np.mean([len(set(i for i, _ in row) & t) / K
                       for row, t in zip(res0, truth_ids)])
        print(f"  nprobe={nprobe:>3}: {Q / per:8,.0f} qps  "
              f"recall@10={rec:.4f}  ({per * 1e3:.0f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    main()
