"""16M x 768 on ONE chip via int8 storage (12 GB of codes — 4x the f32
row ceiling, 2x bf16's).

Lane story (BASELINE.md): f32 tops out at 4M rows/chip, bf16 at 8M
(certified 1-pass kernel, 8.0k QPS), int8 reaches 16M with the exact
blockwise dequantizing scan. Distances are exact over the stored
(pow2-scaled int8) values; a spot-check against a NumPy oracle on a
row subset validates end-to-end.

    python benchmarks/exp_16m.py [--n23]   # default 2^24 rows; --n23 = 8M
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index.flat import FlatIndex, _quantize_int8  # noqa: E402

N = 1 << 23 if "--n23" in sys.argv else 1 << 24
D, K, Q = 768, 10, 1024
LATENT = 32


def main():
    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((LATENT, D)).astype(np.float32)
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, storage="int8")
    print(f"ingesting {N} x {D} int8 rows...", flush=True)
    t0 = time.perf_counter()
    step = 1 << 19
    oracle_rows = None
    for lo in range(0, N, step):
        z = rng.standard_normal((step, LATENT)).astype(np.float32)
        chunk = z @ basis
        if lo == 0:
            oracle_rows = chunk[:200_000].copy()
        idx.add_batch(list(zip(range(lo, lo + step), chunk)))
        if lo % (1 << 22) == 0:
            print(f"  {lo + step}/{N} ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
    print(f"ingest: {time.perf_counter() - t0:.0f}s", flush=True)

    zq = rng.standard_normal((Q, LATENT)).astype(np.float32)
    queries = zq @ basis

    t0 = time.perf_counter()
    res = idx.search_batch(queries[:8], K)
    print(f"first batch (compile): {time.perf_counter() - t0:.0f}s",
          flush=True)

    # oracle spot check on the stored-value subset
    sub = _quantize_int8(oracle_rows)
    d2 = (np.sum(sub * sub, axis=1)[None, :]
          - 2.0 * queries[:8] @ sub.T
          + np.sum(queries[:8] ** 2, axis=1)[:, None])
    want = np.sqrt(np.maximum(d2, 0))
    for qi in range(8):
        got = {i: dv for i, dv in res[qi] if i < 200_000}
        for i, dv in got.items():
            assert abs(dv - want[qi, i]) < 1e-3, (qi, i, dv, want[qi, i])
    print("oracle spot-check OK (exact over stored values)", flush=True)

    # throughput: distinct pre-staged batches, sync then measure
    for trial in range(3):
        t0 = time.perf_counter()
        idx.search_batch(queries, K)
        dt = time.perf_counter() - t0
        print(f"  Q={Q}: {dt * 1e3:.0f} ms  ({Q / dt:,.0f} QPS)", flush=True)


if __name__ == "__main__":
    main()
