"""A/B: size-penalized (balanced) k-means vs plain Lloyd, real chip.

Same hard clustered workload as ivf_bench.py (1M x 768, 2048 true centers,
noise 0.25 — the config where round-2 notes recorded ~12% of rows in the
always-scanned spill region). Trains the SAME ingested data with
kmeans_balance=0 (plain) and 0.1 (balanced), reporting spill fraction,
nprobe recall, and QPS for each.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index import FlatIndex, IvfFlatIndex  # noqa: E402

CENTERS = 2048
NOISE = 0.25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    n, d, q, k = 1 << args.logn, args.d, args.q, args.k

    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((CENTERS, d)).astype(np.float32)
    which = rng.integers(0, CENTERS, n)
    data_np = centers[which] + NOISE * rng.standard_normal(
        (n, d)).astype(np.float32)
    qwhich = rng.integers(0, CENTERS, q)
    queries = centers[qwhich] + NOISE * rng.standard_normal(
        (q, d)).astype(np.float32)
    del centers
    print(f"data generated: n={n} d={d}", flush=True)

    sample = queries[:512]
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch(list(enumerate(data_np)))
    truth = flat.search_batch(sample, k)
    want = [set(i for i, _ in row) for row in truth]
    del flat
    print("ground truth done", flush=True)

    for name, w in (("plain", 0.0), ("balanced w=0.1", 0.1)):
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nprobe=8, seed=0,
                           kmeans_balance=w)
        t0 = time.perf_counter()
        idx.add_batch(list(enumerate(data_np)))
        t_add = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx.train()
        t_train = time.perf_counter() - t0
        spill_rows = (idx._s_t * 16) - len(idx._spill_free)
        print(f"[{name}] ingest {t_add:.0f}s train {t_train:.0f}s "
              f"nlist={idx._nlist} t_c={idx._t_c} s_t={idx._s_t} "
              f"spill_rows={spill_rows} ({spill_rows / n:.2%}) "
              f"capacity={idx._capacity}", flush=True)
        for nprobe in (4, 8):
            idx.nprobe = nprobe
            idx.search_batch(queries, k)   # warm/compile
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                idx.search_batch(queries, k)
            per = (time.perf_counter() - t0) / iters
            got = idx.search_batch(sample, k)
            recall = np.mean([len(set(i for i, _ in g) & w2) / k
                              for g, w2 in zip(got, want)])
            print(f"  [{name}] nprobe={nprobe}: {q / per:8,.0f} QPS "
                  f"({per * 1e3:6.1f} ms/batch) recall@10={recall:.4f}",
                  flush=True)
        del idx


if __name__ == "__main__":
    main()
