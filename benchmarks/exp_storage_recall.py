"""Storage-fidelity honesty row: recall of bf16/int8-STORED search vs the
f32 ground truth at 1M x 768.

The bf16/int8 lanes are certified-exact *over the stored values*
(BASELINE.md) — this measures what the quantization itself costs against
the f32 database they were quantized from: recall@10, top-1 agreement,
and the relative error of the k-th neighbor distance. Both data modes of
the north-star protocol are covered (iid gaussian, where neighbor gaps
are tightest, and intrinsic-dim-32 structured, the realistic regime).

Methodology: every variant searches the SAME f32 exact pipeline over the
round-tripped stored values (bf16(x) -> f32, int8 dequant -> f32), so
the comparison isolates storage fidelity from kernel arithmetic. Ground
truth is the same pipeline on the raw f32 database. Everything is
generated and quantized ON DEVICE (a 3 GB host->device transfer through
this platform's relay costs minutes; jax.random + a device matmul cost
nothing). The device quantizer mirrors index/flat._int8_row_scales
(per-row pow2 scales) exactly.

    python benchmarks/exp_storage_recall.py [--q=1024]
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.ops.coarse_kernel import (residual_max_norm,  # noqa: E402
                                            split_hi_lo)
from vectordb_tpu.ops.topk import flat_search_batched  # noqa: E402

N, D, K = 1 << 20, 768, 10
Q = 1024
LATENT = 32
for a in sys.argv[1:]:
    if a.startswith("--q="):
        Q = int(a.split("=")[1])


def make_db(mode: str, key):
    kdb, kq, kb = jax.random.split(key, 3)
    if mode == "iid":
        db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
        qs = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    else:
        basis = jax.random.normal(kb, (LATENT, D), dtype=jnp.float32)
        db = jax.random.normal(kdb, (N, LATENT), dtype=jnp.float32) @ basis
        qs = jax.random.normal(kq, (Q, LATENT), dtype=jnp.float32) @ basis
    return db, qs


@jax.jit
def _int8_roundtrip(db):
    """Device mirror of index/flat._int8_row_scales + dequant: per-row
    pow2 scale s = 2^ceil(log2(max|row|/127)), stored = round(row/s)*s."""
    mx = jnp.max(jnp.abs(db), axis=1)
    mx = jnp.where(mx > 0.0, mx, jnp.float32(127.0))
    s = jnp.exp2(jnp.ceil(jnp.log2(mx / np.float32(127.0))))
    return jnp.round(db / s[:, None]) * s[:, None]


def search(db, queries):
    """f32 exact pipeline over the given (already stored-value) rows."""
    sq = jnp.sum(db * db, axis=1)
    hi, lo = split_hi_lo(db)
    state = {"db": db, "sq_norms": sq, "norms": jnp.sqrt(sq),
             "valid": jnp.ones((N,), dtype=bool), "hi": hi, "lo": lo,
             "elo_max": residual_max_norm(db, hi)}
    dists, idx = flat_search_batched(queries, state,
                                     DistanceMetric.EUCLIDEAN, K,
                                     mode="exact")
    del state, hi, lo
    return np.asarray(dists), np.asarray(idx)


def main():
    enable_persistent_jit_cache()
    for mode in ("structured", "iid"):
        base, queries = make_db(mode, jax.random.PRNGKey(11))
        t0 = time.perf_counter()
        gt_d, gt_i = search(base, queries)
        print(f"[{mode}] f32 ground truth: {time.perf_counter()-t0:.0f}s",
              flush=True)

        for name in ("bf16", "int8"):
            if name == "bf16":
                stored = base.astype(jnp.bfloat16).astype(jnp.float32)
            else:
                stored = _int8_roundtrip(base)
            d, i = search(stored, queries)
            del stored
            gc.collect()
            recall = np.mean([
                len(set(gt_i[q]) & set(i[q])) / K for q in range(Q)])
            top1 = float(np.mean(gt_i[:, 0] == i[:, 0]))
            # k-th neighbor distance error vs the f32 k-th distance
            rel = np.abs(d[:, K - 1] - gt_d[:, K - 1]) / np.maximum(
                gt_d[:, K - 1], 1e-9)
            print(f"[{mode}] {name}: recall@10={recall:.4f} "
                  f"top1={top1:.4f} kth-dist rel err "
                  f"mean={rel.mean():.2e} max={rel.max():.2e}", flush=True)
        del base, queries
        gc.collect()


if __name__ == "__main__":
    main()
