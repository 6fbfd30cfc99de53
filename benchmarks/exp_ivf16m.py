"""IVF x int8 at 16M x 768 on ONE chip: the ANN lane over the largest
single-chip database (12 GB of codes; f32 tops out at 4M, bf16 at 8M).

The flat certified int8 scan streams all 12 GB per batch; IVF probes
nprobe clusters (t_c tiles each) + the spill region, so per-query work
shrinks ~nlist/nprobe-fold. Training assignment and the probed refine
dot raw codes and apply the pow2 row scale to the dots — exact over the
stored values (see ops/ivf.py). Recall is measured against the exact
int8 flat scan on the same index (same stored value set).

    python benchmarks/exp_ivf16m.py [--n23] [--nlist=16384]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index.flat import FlatIndex  # noqa: E402
from vectordb_tpu.index.ivf import IvfFlatIndex  # noqa: E402

N = 1 << 23 if "--n23" in sys.argv else 1 << 24
NLIST = 16384
for a in sys.argv:
    if a.startswith("--nlist="):
        NLIST = int(a.split("=")[1])
    elif a.startswith("--n="):       # smoke-test scale override
        N = int(a.split("=")[1])
D, K, Q = 768, 10, 1024
CENTERS = N // 512        # clustered protocol (benchmarks/ivf_bench.py):
NOISE = 0.25              # the IVF lane's honest workload; the intr-32
NPROBES = [4, 8, 16]      # manifold protocol is the HNSW lane's


def main():
    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((CENTERS, D)).astype(np.float32)
    # balance_slack 1.2 at 16M: the repack allocates capacity*d*4 bytes
    # of host RAM beside the 48 GB source matrix (1.5 would be 77+48 GB)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=NLIST,
                       train_iters=8, auto_train_min=10 ** 9,
                       storage="int8", balance_slack=1.2)
    # the generation + quantize phase costs ~2h on the contended single
    # host core: cache the stored value set (int8 codes + pow2 scales) so
    # a crash later in the run resumes in minutes (quantization is
    # idempotent, so reloading the dequantized values rebuilds the
    # IDENTICAL index)
    cache_codes = Path(f"/tmp/ivf16m_codes_{N}x{D}.i8")
    cache_scales = Path(f"/tmp/ivf16m_scales_{N}x{D}.f32")
    t0 = time.perf_counter()
    step = 1 << 19
    mat = np.empty((N, D), np.float32)
    if cache_codes.exists() and cache_scales.exists():
        print("restoring stored values from cache...", flush=True)
        codes = np.memmap(cache_codes, np.int8, "r", shape=(N, D))
        scales = np.memmap(cache_scales, np.float32, "r", shape=(N,))
        for lo in range(0, N, step):
            mat[lo:lo + step] = codes[lo:lo + step].astype(np.float32)
            mat[lo:lo + step] *= scales[lo:lo + step, None]
    else:
        print(f"generating {N} x {D} ({CENTERS} centers)...", flush=True)
        for lo in range(0, N, step):
            sz = min(step, N - lo)
            which = rng.integers(0, CENTERS, sz)
            blk = centers[which]
            blk += NOISE * rng.standard_normal(
                (sz, D)).astype(np.float32)
            mat[lo:lo + sz] = blk
    idx.bulk_load_matrix(np.arange(N, dtype=np.int64), mat)
    del mat
    if not cache_codes.exists():
        from vectordb_tpu.index.flat import _int8_codes_scales
        codes_mm = np.memmap(cache_codes, np.int8, "w+", shape=(N, D))
        scales_mm = np.memmap(cache_scales, np.float32, "w+", shape=(N,))
        for lo in range(0, N, step):
            c, s = _int8_codes_scales(idx._vectors[lo:lo + step])
            codes_mm[lo:lo + step] = c
            scales_mm[lo:lo + step] = s
        codes_mm.flush(), scales_mm.flush()
        del codes_mm, scales_mm
        print("stored-value cache written", flush=True)
    t_ingest = time.perf_counter() - t0
    print(f"ingest: {t_ingest:.0f}s", flush=True)

    t0 = time.perf_counter()
    idx.train()
    t_train = time.perf_counter() - t0
    print(f"train (nlist={idx._nlist}, t_c={idx._t_c}, s_t={idx._s_t}): "
          f"{t_train:.0f}s  -> {N / (t_ingest + t_train):,.0f} vec/s "
          f"build e2e", flush=True)

    qwhich = rng.integers(0, CENTERS, Q)
    queries = (centers[qwhich] + NOISE * rng.standard_normal(
        (Q, D))).astype(np.float32)

    # exact ground truth over the SAME stored values (int8 flat scan) on
    # a 256-query subsample — the recall estimate's stderr is ~0.2% and
    # the full-Q scan at 8-16M costs ~10 min of chip time
    QGT = 256
    print("ground truth (exact int8 scan)...", flush=True)
    t0 = time.perf_counter()
    gt = FlatIndex.search_batch(idx, queries[:QGT], K)
    print(f"  {time.perf_counter() - t0:.0f}s", flush=True)
    gt_ids = [set(i for i, _ in row) for row in gt]

    for nprobe in NPROBES:
        t0 = time.perf_counter()
        got = idx.search_batch(queries, K, nprobe=nprobe)
        t_first = time.perf_counter() - t0
        recall = np.mean([
            len(set(i for i, _ in got[qi]) & gt_ids[qi]) / K
            for qi in range(QGT)])
        times = []
        for it in range(3):
            qv = queries + np.float32(0.001 * (it + 1))
            t0 = time.perf_counter()
            idx.search_batch(qv, K, nprobe=nprobe)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"nprobe={nprobe}: {dt * 1e3:.0f} ms/batch "
              f"({Q / dt:,.0f} QPS)  recall@{K}={recall:.4f} "
              f"(first {t_first:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
