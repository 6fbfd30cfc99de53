"""Standalone check of bench.py's marginal-bandwidth methodology.

The artifact block (bench.py measure_roofline_extras.do_marginal_bw) runs
at the end of the full bench; this mini-harness runs JUST that block's
logic so the in-jit multi-pass fix can be validated in minutes: at Q=128
a single 1M-row scan is ~2 ms of device time vs ~1 ms relay jitter, so
the first r5 artifact's N-sweep slope 'measured' 310% of HBM peak.
16 kernel passes per call (fori_loop, perturbed queries) amplify the
device component ~16x above the noise floor.

    python benchmarks/exp_marginal_bw.py [--passes 16] [--logn 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("VDB_BENCH_NO_SUPERVISOR", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=16)
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--q", type=int, default=128)
    args = ap.parse_args()

    from bench import _scan_only_fn
    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.ops import coarse_kernel as ck
    from vectordb_tpu.ops.coarse_kernel import (residual_max_norm,
                                                split_hi_lo)

    enable_persistent_jit_cache()
    n, d, q = 1 << args.logn, 768, args.q
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (n, d), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    hi, lo = split_hi_lo(db)
    state = {"hi": hi, "sq_norms": sq}
    qbase = jax.random.normal(kq, (q, d), dtype=jnp.float32)
    staged = []
    for i in range(8):
        b = qbase + np.float32(i + 1)
        b.block_until_ready()
        staged.append(b)
    np.asarray(jnp.sum(hi.astype(jnp.float32)))

    points = []
    for nn in (n // 4, n // 2, n):
        fn = _scan_only_fn(state, nn, d, passes=args.passes)
        jax.device_get(fn(staged[0]))
        times = []
        for i in range(8):
            t0 = time.perf_counter()
            jax.device_get(fn(staged[i % len(staged)]))
            times.append(time.perf_counter() - t0)
        points.append((nn, min(times)))
        print(f"N={nn:9d}: {min(times)*1e3:8.2f} ms "
              f"(median {sorted(times)[len(times)//2]*1e3:.2f})",
              flush=True)
    xs = np.array([p[0] for p in points], np.float64)
    ys = np.array([p[1] for p in points], np.float64)
    slope = float(np.polyfit(xs, ys, 1)[0]) / args.passes
    bytes_per_row = (d * 2 + q * 4 / ck.SUB + q * 4 / (ck.SUB * ck.SUPER))
    gbps = bytes_per_row / max(slope, 1e-15) / 1e9
    print(f"slope {slope*1e9:.3f} ns/row-scan -> {gbps:.1f} GB/s "
          f"({gbps*1e9/819e9*100:.1f}% of v5e HBM peak)", flush=True)


if __name__ == "__main__":
    main()
