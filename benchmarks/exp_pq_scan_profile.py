"""Where does the PQ scan's time go? Stage-isolated A/B on the real chip.

The 2^25 beyond-RAM sweep runs ~15 s per scan call at Q in {512, 4096}
— nearly Q-INDEPENDENT, so the per-row cost dominates, not the per-query
work. Static accounting says the one-hot decode is the suspect: the
(chunk, m, ksub) bf16 one-hot is ~48 KB/row (vs 96 B/row of codes!) and
cannot stay in VMEM at chunk=16384, so XLA materializes it in HBM —
~4 TB of traffic per 33.5M-row call, ~5 s at peak, plus the 210 TFLOP
one-hot matmul (the useful decode work is 3% of it: dsub/ksub = 8/256).

This experiment times, at 2^20/2^22 x 768 (m=96, ksub=256), Q=512/4096:
  A. the production pq_scan_topr call (decode + score + select)
  B. decode-only (the scan body minus scores/selection)
  C. one-hot build only (compare + cast, no matmul)
  D. score-only over PRE-DECODED bf16 rows (the floor the decode is
     keeping us from)
  E. gather-decode variant (jnp.take of codewords — no one-hot at all)

Interpretation: if A - D ~= B and B >> C's flop floor, the one-hot HBM
round trip is confirmed and a Pallas fused decode+score kernel (one-hot
never leaves VMEM) is the fix; if E ~ D, XLA's gather is usable and no
kernel is needed.
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
from vectordb_tpu.ops.pq import (_decode_block, _split_query, pack_codebook,
                                 pq_scan_topr)

CHUNK = 16384


def timed(label, fn, *args, iters=3):
    """device_get, not block_until_ready: through this platform's relay
    block_until_ready can return without a host-visible round trip, so a
    fetch of (a piece of) the result is the only honest sync."""
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
    print(f"{label:42s} {t*1e3:9.1f} ms", flush=True)
    return t


def main(logn=20, d=768, m=96, ksub=256):
    enable_persistent_jit_cache()
    n = 1 << logn
    rng = np.random.default_rng(0)
    print(f"n=2^{logn} d={d} m={m} ksub={ksub} chunk={CHUNK}", flush=True)
    codes = rng.integers(0, ksub, (n, m), dtype=np.uint8)
    cb = rng.standard_normal((m, ksub, d // m)).astype(np.float32)
    cb = cb.astype(jnp.bfloat16).astype(np.float32)  # bf16 values (fit contract)
    bd, spg = pack_codebook(cb)
    cnorm = np.sum(cb * cb, axis=-1).astype(np.float32)
    valid = np.ones(n, bool)

    codes_d = jnp.asarray(codes)
    bd_d = jnp.asarray(bd)
    cnorm_d = jnp.asarray(cnorm)
    valid_d = jnp.asarray(valid)
    g = bd.shape[0]

    for q in (512, 4096):
        queries = rng.standard_normal((q, d)).astype(np.float32)
        qd = jnp.asarray(queries)
        print(f"-- Q={q}", flush=True)

        # A: production scan
        def full(qs):
            return pq_scan_topr(qs, codes_d, bd_d, cnorm_d, valid_d,
                                DistanceMetric.EUCLIDEAN, r=128,
                                chunk=CHUNK, recall_target=0.95)
        tA = timed("A production pq_scan_topr r=128", full, qd)

        # B: decode-only (sum decoded to force materialization)
        @jax.jit
        def decode_only(codes_in):
            bd_bf = bd_d.astype(jnp.bfloat16)
            cnorm_g = cnorm_d.reshape(g, spg, ksub)
            iota_k = jnp.arange(ksub, dtype=jnp.uint8)
            def body(acc, cc):
                decoded, rsq = _decode_block(cc, bd_bf, cnorm_g, iota_k)
                return acc + jnp.sum(decoded.astype(jnp.float32)) \
                    + jnp.sum(rsq), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                codes_in.reshape(n // CHUNK, CHUNK, m))
            return acc
        tB = timed("B decode-only (per-call, Q-indep)", decode_only,
                   codes_d)

        # C: one-hot build only
        @jax.jit
        def onehot_only(codes_in):
            iota_k = jnp.arange(ksub, dtype=jnp.uint8)
            def body(acc, cc):
                cg = cc.reshape(CHUNK, g, spg).transpose(1, 0, 2)
                oh = (cg[..., None] == iota_k).astype(jnp.bfloat16)
                return acc + jnp.sum(oh.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                codes_in.reshape(n // CHUNK, CHUNK, m))
            return acc
        tC = timed("C one-hot build only", onehot_only, codes_d)

        # D: score+select floor over pre-decoded bf16 rows (fits at 2^20:
        # 1.6 GB bf16)
        if n * d * 2 <= 8 << 30:
            dec_rows = jnp.asarray(
                rng.standard_normal((n, d)).astype(np.float32)
            ).astype(jnp.bfloat16)
            xsq = jnp.sum(dec_rows.astype(jnp.float32) * dec_rows.astype(
                jnp.float32), axis=1)

            @jax.jit
            def score_only(qs):
                q_hi, q_lo = _split_query(qs)
                def body(_, inp):
                    rows_c, xs_c, vc = inp
                    dt = rows_c.T
                    dots = (jnp.matmul(q_hi, dt,
                                       preferred_element_type=jnp.float32)
                            + jnp.matmul(q_lo, dt,
                                         preferred_element_type=jnp.float32))
                    scores = xs_c[None, :] - 2.0 * dots
                    scores = jnp.where(vc[None, :], scores,
                                       jnp.float32(jnp.inf))
                    cv, cl = jax.lax.approx_min_k(scores, 128,
                                                  recall_target=0.95)
                    return 0, (cv, cl)
                _, (vals, _idx) = jax.lax.scan(
                    body, 0, (dec_rows.reshape(n // CHUNK, CHUNK, d),
                              xsq.reshape(n // CHUNK, CHUNK),
                              valid_d.reshape(n // CHUNK, CHUNK)))
                return jnp.sum(vals)
            tD = timed("D score+select over pre-decoded rows",
                       score_only, qd)

        # E: gather-decode (jnp.take, no one-hot)
        @jax.jit
        def gather_decode(codes_in):
            cb_d = jnp.asarray(cb)  # (m, ksub, dsub)
            def body(acc, cc):
                # (CHUNK, m) codes -> (CHUNK, m, dsub) via take per row
                dec = jnp.take_along_axis(
                    cb_d[None, :, :, :],
                    cc[:, :, None, None].astype(jnp.int32), axis=2
                )[:, :, 0, :]
                return acc + jnp.sum(dec), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                codes_in.reshape(n // CHUNK, CHUNK, m))
            return acc
        tE = timed("E gather-decode (jnp.take)", gather_decode, codes_d)

        print(f"   A-D (decode share of full): {(tA - tD)*1e3:9.1f} ms",
              flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    a = ap.parse_args()
    main(logn=a.logn)
