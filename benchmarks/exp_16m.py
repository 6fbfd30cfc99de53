"""16M x 768 on ONE chip via int8 storage (12 GB of codes — 4x the f32
row ceiling, 2x bf16's).

Lane story (BASELINE.md): f32 tops out at 4M rows/chip, bf16 at 8M
(certified 1-pass kernel), int8 reaches 16M with the int8-source 1-pass
certified tier (codes cast to bf16 exactly in VMEM -> zero db-side
residual; ops/coarse_kernel.py). Distances are exact over the stored
(pow2-scaled int8) values; a spot-check against a NumPy oracle on a row
subset validates end-to-end.

Methodology matches bench.py: the device state is built directly (codes
+ scales + norms + elo_max=0) and searched through the PRODUCTION
dispatcher (ops.topk.flat_search_batched_submit), so the measured path
is exactly what FlatIndex(storage="int8") serves. Codes are cached to
.artifacts/int8_16m.npz so re-runs skip the ~15 min host generation.

    python benchmarks/exp_16m.py [--n23]   # default 2^24 rows; --n23 = 8M
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index.flat import _int8_codes_scales  # noqa: E402
from vectordb_tpu.ops.topk import (flat_search_batched,  # noqa: E402
                                   flat_search_batched_submit)

N = 1 << 23 if "--n23" in sys.argv else 1 << 24
# Q=512: the certified tier materializes (N/16, Q) f32 tile minima — 2 GB
# at 16M beside the 12 GB code matrix; Q=1024 would not fit.
D, K, Q = 768, 10, 512
LATENT = 32
ART = Path(__file__).parent / ".artifacts" / f"int8_{N >> 20}m.npz"


def build_codes():
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((LATENT, D)).astype(np.float32)
    codes = np.empty((N, D), np.int8)
    scales = np.empty(N, np.float32)
    sq = np.empty(N, np.float32)
    t0 = time.perf_counter()
    step = 1 << 19
    oracle = None
    for lo in range(0, N, step):
        z = rng.standard_normal((step, LATENT)).astype(np.float32)
        chunk = z @ basis
        c, s = _int8_codes_scales(chunk)
        codes[lo:lo + step] = c
        scales[lo:lo + step] = s
        stored = c.astype(np.float32) * s[:, None]
        sq[lo:lo + step] = np.einsum("ij,ij->i", stored, stored)
        if lo == 0:
            oracle = stored[:200_000].copy()
        if lo % (1 << 22) == 0:
            print(f"  gen {lo + step}/{N} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    print(f"gen+quantize: {time.perf_counter() - t0:.0f}s "
          f"({N / (time.perf_counter() - t0):,.0f} vec/s)", flush=True)
    ART.parent.mkdir(exist_ok=True)
    np.savez(ART, codes=codes, scales=scales, sq=sq,
             oracle=oracle, basis=basis)
    return codes, scales, sq, oracle, basis


def main():
    enable_persistent_jit_cache()
    if ART.exists():
        print(f"loading cached codes from {ART}", flush=True)
        with np.load(ART) as z:
            codes, scales, sq = z["codes"], z["scales"], z["sq"]
            oracle, basis = z["oracle"], z["basis"]
    else:
        codes, scales, sq, oracle, basis = build_codes()

    print("staging device state...", flush=True)
    t0 = time.perf_counter()
    state = {
        "db": jnp.asarray(codes),
        "scales": jnp.asarray(scales),
        "sq_norms": jnp.asarray(sq),
        "norms": jnp.asarray(np.sqrt(sq)),
        "valid": jnp.ones((N,), bool),
        "int8_storage": True,
        "elo_max": jnp.float32(0.0),
    }
    jax.device_get(state["db"][0, 0])
    print(f"  transfer: {time.perf_counter() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(99)
    zq = rng.standard_normal((Q, LATENT)).astype(np.float32)
    queries = zq @ basis

    t0 = time.perf_counter()
    d8, i8 = flat_search_batched(queries[:8], state,
                                 DistanceMetric.EUCLIDEAN, K)
    print(f"first batch (compile): {time.perf_counter() - t0:.0f}s",
          flush=True)

    # oracle spot check over the stored-value subset
    d2 = (np.einsum("ij,ij->i", oracle, oracle)[None, :]
          - 2.0 * queries[:8] @ oracle.T
          + np.einsum("ij,ij->i", queries[:8], queries[:8])[:, None])
    want = np.sqrt(np.maximum(d2, 0))
    for qi in range(8):
        for j in range(K):
            i, dv = int(i8[qi, j]), float(d8[qi, j])
            if i < 200_000:
                assert abs(dv - want[qi, i]) < 1e-3, (qi, i, dv)
    print("oracle spot-check OK (exact over stored values)", flush=True)

    staged = []
    for i in range(6):
        b = jnp.asarray(queries + np.float32(0.01 * (i + 1)))
        jax.device_get(b[0, 0])
        staged.append(b)
    # compile the full-Q signature once
    flat_search_batched_submit(np.asarray(staged[0]), state,
                               DistanceMetric.EUCLIDEAN, K).collect()
    for depth in (2, 3):
        inflight = []
        t0 = time.perf_counter()
        for i in range(6):
            inflight.append(flat_search_batched_submit(
                np.asarray(staged[i]), state, DistanceMetric.EUCLIDEAN, K))
            if len(inflight) >= depth:
                inflight.pop(0).collect()
        for h in inflight:
            h.collect()
        per = (time.perf_counter() - t0) / 6
        print(f"depth={depth}: {per * 1e3:.0f} ms/batch "
              f"({Q / per:,.0f} QPS at Q={Q})", flush=True)


if __name__ == "__main__":
    main()
