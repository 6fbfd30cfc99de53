"""A/B the round-2 kernel changes at the headline shape, in ONE process:

  V1 pool forced to m2=m=42 (the pre-knee default this harness originally
     measured; _exact1p_pool now RETURNS the knee, so the wide pool must
     be forced to keep the A/B meaningful)
  V2 VDB_TPU_NO_SEL3=1: legacy 2-level selection (same refine)
  V3 current default: 3-level selection + grouped refine wait, pool from
     _exact1p_pool = the measured certification knee (m2=m=32 at k=10,
     N=2^20 x 768 iid: 32768/32768 certified — BASELINE.md)
  F1 fast mode via coarse_search_1p_fast (fused minima + exact sel)
  F2 legacy fast (full-minima transpose + approx_min_k)

Env-gated branches are baked at trace time, so each variant clears the
jit cache before timing (compile cost excluded from the timed region).
Certification counts are printed — exactness is unconditional either way
(uncertified queries re-run through tier 2), but the rate prices the
fallback.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.ops import coarse_kernel as ck  # noqa: E402

N, D, Q, K = 1 << 20, 768, 4096, 10
ITERS = 6


def stage_queries(kq):
    qbase = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    staged = []
    for i in range(ITERS + 1):
        b = qbase + np.float32(i + 1)
        b.block_until_ready()
        staged.append(b)
    return staged


def time_exact(staged, st, label):
    out = ck.coarse_search_1p(staged[-1], st["db"], st["sq"], st["norms"],
                              st["valid"], st["hi"], st["elo"],
                              DistanceMetric.EUCLIDEAN, K)
    cert = int(jax.device_get(out[2].sum()))
    start = time.perf_counter()
    outs = []
    for i in range(ITERS):
        outs.append(ck.coarse_search_1p(
            staged[i], st["db"], st["sq"], st["norms"], st["valid"],
            st["hi"], st["elo"], DistanceMetric.EUCLIDEAN, K))
    jax.device_get(outs)
    per = (time.perf_counter() - start) / ITERS
    print(f"{label:46s} {per * 1e3:7.2f} ms  {Q / per:8.0f} QPS  "
          f"cert {cert}/{Q}", flush=True)
    return per, outs[0]


def time_fast(staged, st, label, legacy=False):
    def run(q):
        if legacy:
            d_, i_, _ = ck.coarse_search(q, st["db"], st["sq"], st["norms"],
                                         st["valid"], st["hi"], st["lo"],
                                         DistanceMetric.EUCLIDEAN, K,
                                         exact=False)
            return d_, i_
        return ck.coarse_search_1p_fast(q, st["db"], st["sq"], st["norms"],
                                        st["valid"], st["hi"],
                                        DistanceMetric.EUCLIDEAN, K)
    jax.device_get(run(staged[-1]))
    start = time.perf_counter()
    outs = [run(staged[i]) for i in range(ITERS)]
    jax.device_get(outs)
    per = (time.perf_counter() - start) / ITERS
    print(f"{label:46s} {per * 1e3:7.2f} ms  {Q / per:8.0f} QPS",
          flush=True)
    return per, outs[0]


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    hi, lo = ck.split_hi_lo(db)
    st = {"db": db, "sq": sq, "norms": jnp.sqrt(sq),
          "valid": jnp.ones((N,), bool), "hi": hi, "lo": lo,
          "elo": ck.residual_max_norm(db, hi)}
    staged = stage_queries(kq)
    m2, m = ck._exact1p_pool(K, N // ck.SUB)
    print(f"shape: N=2^20 d={D} Q={Q} k={K}  default pool m2={m2} m={m}")

    real_pool = ck._exact1p_pool
    ck._exact1p_pool = lambda k, t: (42, 42)
    t1, wide = time_exact(staged, st, "V1 exact: sel3, wide pool m2=m=42")

    os.environ["VDB_TPU_NO_SEL3"] = "1"
    jax.clear_caches()
    t2, out2 = time_exact(staged, st, "V2 exact: legacy 2-level sel, m=42")
    del os.environ["VDB_TPU_NO_SEL3"]
    ck._exact1p_pool = real_pool

    # identical results across selection variants
    same = all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.device_get(wide), jax.device_get(out2)))
    print(f"   V1 == V2 results: {same}")

    jax.clear_caches()
    t3, ref = time_exact(staged, st, "V3 exact: sel3, default knee pool")
    # knee-pool ids/dists must match the wide pool's wherever both certify
    same3 = all(np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.device_get(wide[:2]),
                                jax.device_get(ref[:2])))
    print(f"   V1 == V3 results: {same3}")

    jax.clear_caches()
    f1, fo1 = time_fast(staged, st, "F1 fast: 1p fused sel (new)")
    f2, fo2 = time_fast(staged, st, "F2 fast: legacy transpose+approx_min_k",
                        legacy=True)
    # fast-mode agreement vs the exact reference ids
    ref_ids = np.asarray(jax.device_get(ref[1]))[:, :K]
    for tag, fo in (("F1", fo1), ("F2", fo2)):
        ids = np.asarray(jax.device_get(fo[1]))[:, :K]
        agree = np.mean([len(set(a) & set(b)) / K
                         for a, b in zip(ids, ref_ids)])
        print(f"   {tag} top-{K} agreement vs exact: {agree:.4f}")


if __name__ == "__main__":
    main()
