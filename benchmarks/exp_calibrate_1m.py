"""calibrate_nprobe at production scale: 1M x 768 structured data on the
real chip. Measures calibration cost and validates the installed nprobe
against UNSEEN queries (the calibration sample is stored rows, which is
slightly optimistic — this quantifies the gap).

    python benchmarks/exp_calibrate_1m.py [--target=0.98]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index import FlatIndex, IvfFlatIndex  # noqa: E402

N, D, K, Q_VAL = 1 << 20, 768, 10, 1024
CENTERS, NOISE = 2048, 0.25
TARGET = 0.98
for a in sys.argv[1:]:
    if a.startswith("--target="):
        TARGET = float(a.split("=")[1])


def main():
    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((CENTERS, D)).astype(np.float32)
    which = rng.integers(0, CENTERS, N)
    data_np = centers[which] + NOISE * rng.standard_normal(
        (N, D)).astype(np.float32)
    qwhich = rng.integers(0, CENTERS, Q_VAL)
    val_queries = centers[qwhich] + NOISE * rng.standard_normal(
        (Q_VAL, D)).astype(np.float32)
    del centers
    print("data generated", flush=True)

    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nprobe=1, seed=0)
    t0 = time.perf_counter()
    idx.add_batch(list(enumerate(data_np)))
    idx.train()
    print(f"ingest+train: {time.perf_counter() - t0:.1f}s "
          f"(nlist={idx._nlist})", flush=True)

    t0 = time.perf_counter()
    out = idx.calibrate_nprobe(TARGET, k=K, sample=256)
    t_cal = time.perf_counter() - t0
    print(f"calibrate(target={TARGET}): nprobe={out['nprobe']} "
          f"recall={out['recall']:.4f} in {t_cal:.1f}s; curve="
          f"{ {k: round(v, 4) for k, v in out['curve'].items()} }",
          flush=True)

    # held-out validation: unseen queries, flat exact ground truth
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch(list(enumerate(data_np)))
    truth = flat.search_batch(val_queries, K)
    want = [set(i for i, _ in row) for row in truth]
    got = idx.search_batch(val_queries, K)
    recall = float(np.mean([
        len(w & set(i for i, _ in row)) / K
        for w, row in zip(want, got)]))
    print(f"HELD-OUT recall@{K} at installed nprobe={idx.nprobe}: "
          f"{recall:.4f} over {Q_VAL} unseen queries", flush=True)


if __name__ == "__main__":
    main()
