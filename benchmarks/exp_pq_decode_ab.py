"""A/B of the Pallas VMEM one-hot decode vs the XLA decode, real chip.

Round-5 kernel work (VERDICT item 5): the XLA lowering of the PQ decode
materializes the (chunk, m, ksub) one-hot in HBM (~48 KB/row — measured
278 ms per 2^20-row decode whose MXU floor is ~33 ms), making every scan
call decode-bound and Q-independent: the 2^25 sweep's 512-query
dispatches collapsed to 34-37 QPS vs 225-246 full-batch. The Pallas
kernel (ops/pq.pq_decode_rows) builds the one-hot in VMEM.

Measures, at --logn rows x 768 (m=96, ksub=256):
  decode-only:      XLA vs Pallas (Q-independent)
  production scan:  pq_scan_topr pallas_decode off/on at Q=512 and 4096
  correctness:      decoded rows bitwise-equal; scan candidate pools
                    compared at r=128 (surrogate-score ties may reorder
                    the tail; overlap >= 0.99 expected, re-rank exactness
                    is separately pinned by the index tests)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from vectordb_tpu.cli import enable_persistent_jit_cache
from vectordb_tpu.distance import DistanceMetric
from vectordb_tpu.ops.pq import (_decode_block, _decode_block_pallas,
                                 pack_codebook, pq_scan_topr)

CHUNK = 16384


def timed(label, fn, *args, iters=3):
    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf)
    force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label:46s} {t*1e3:9.1f} ms", flush=True)
    return t


def main(logn=20, d=768, m=96, ksub=256):
    enable_persistent_jit_cache()
    n = 1 << logn
    rng = np.random.default_rng(0)
    print(f"n=2^{logn} d={d} m={m} ksub={ksub} chunk={CHUNK}", flush=True)
    codes = rng.integers(0, ksub, (n, m), dtype=np.uint8)
    cb = rng.standard_normal((m, ksub, d // m)).astype(np.float32)
    cb = cb.astype(jnp.bfloat16).astype(np.float32)
    bd, spg = pack_codebook(cb)
    g = bd.shape[0]
    cnorm = np.sum(cb * cb, axis=-1).astype(np.float32)

    codes_d = jnp.asarray(codes)
    bd_d = jnp.asarray(bd)
    bd_bf = bd_d.astype(jnp.bfloat16)
    cnorm_d = jnp.asarray(cnorm)
    cnorm_g = cnorm_d.reshape(g, spg, ksub)
    iota_k = jnp.arange(ksub, dtype=jnp.uint8)
    valid_d = jnp.ones(n, bool)

    # correctness first: one chunk decoded both ways, bitwise compare
    cc = codes_d[:CHUNK]
    dec_x, _ = jax.jit(_decode_block)(cc, bd_bf, cnorm_g, iota_k)
    dec_p, _ = jax.jit(_decode_block_pallas)(cc, bd_bf)
    same = bool(jnp.all(dec_x == dec_p))
    print(f"decoded rows bitwise-equal: {same}", flush=True)
    assert same

    nc = n // CHUNK

    @jax.jit
    def decode_only_xla(codes_in):
        def body(acc, cc):
            decoded, rsq = _decode_block(cc, bd_bf, cnorm_g, iota_k)
            return acc + jnp.sum(decoded.astype(jnp.float32)) \
                + jnp.sum(rsq), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              codes_in.reshape(nc, CHUNK, m))
        return acc

    @jax.jit
    def decode_only_pallas(codes_in):
        def body(acc, cc):
            decoded, rsq = _decode_block_pallas(cc, bd_bf)
            return acc + jnp.sum(decoded.astype(jnp.float32)) \
                + jnp.sum(rsq), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              codes_in.reshape(nc, CHUNK, m))
        return acc

    tx = timed("decode-only XLA (one-hot via HBM)", decode_only_xla,
               codes_d)
    tp = timed("decode-only Pallas (one-hot in VMEM)", decode_only_pallas,
               codes_d)
    print(f"  decode speedup: {tx / tp:.2f}x", flush=True)

    for q in (512, 4096):
        queries = rng.standard_normal((q, d)).astype(np.float32)
        qd = jnp.asarray(queries)
        print(f"-- Q={q}", flush=True)

        def scan_off(qs):
            return pq_scan_topr(qs, codes_d, bd_d, cnorm_d, valid_d,
                                DistanceMetric.EUCLIDEAN, r=128,
                                chunk=CHUNK, pallas_decode=False)

        def scan_on(qs):
            return pq_scan_topr(qs, codes_d, bd_d, cnorm_d, valid_d,
                                DistanceMetric.EUCLIDEAN, r=128,
                                chunk=CHUNK, pallas_decode=True)

        t_off = timed("scan r=128 pallas_decode=off", scan_off, qd)
        t_on = timed("scan r=128 pallas_decode=on", scan_on, qd)
        print(f"  scan speedup: {t_off / t_on:.2f}x", flush=True)
        # candidate-pool agreement (rsq summation-order ties can swap
        # the tail; top-k overlap is the meaningful check)
        _, sl_off = scan_off(qd)
        _, sl_on = scan_on(qd)
        a = np.asarray(sl_off)
        b = np.asarray(sl_on)
        inter = np.mean([
            len(set(a[i]) & set(b[i])) / a.shape[1]
            for i in range(min(64, q))])
        print(f"  pool overlap @r=128: {inter:.4f}", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    a = ap.parse_args()
    main(logn=a.logn)
