"""int8 storage margin study (pre-build feasibility, host numpy).

Question: can an int8-stored database (1 byte/element -> 16M x 768-d
rows on one 16 GB chip) serve CERTIFIED-exact-over-stored-values top-k
through the 1-pass certificate structure (ops/coarse_kernel.py), or
only a fast tier with exact refine distances?

Model: rows quantized per-row symmetric int8 (x~ = s_r * round(x/s_r),
s_r = max|row|/127) AT INSERT — the stored value set, like
storage="bf16". The int8 MXU coarse scan computes q~ . x~ EXACTLY over
int8 operands (int32 accumulation), so the only coarse error vs the
stored values is the QUERY quantization residual:

    |q.x~ - q~.x~| <= |q - q~| * |x~|    (Cauchy-Schwarz, per row)

The 1-pass certificate needs:  margin (boundary super-minimum minus
k-th refined score) > 2 * |q - q~| * max_row|x~|  — same shape as the
bf16 tier's elo_max bound, with the roles of db/query residuals
swapped. This script measures, on iid-gaussian and intrinsic-dim-32
data at (N, d) = (2^20, 768):

  * the exact per-query residual |q - q~| (computed, not worst-case)
  * the certificate margin distribution for a 32-tile refine pool
  * certification rate (what fraction of queries would re-run), and
  * top-k agreement of the UNCERTIFIED int8 coarse ranking (the fast-
    tier quality number).

Decides whether int8 ships as a certified tier, a fast tier, or not.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N, D, K, Q = 1 << 20, 768, 10, 256
SUB, POOL_TILES = 16, 32


def quant_rows(x):
    s = np.abs(x).max(axis=1, keepdims=True) / 127.0
    s = np.maximum(s, 1e-30)
    q = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def study(name, data, queries):
    dq, ds = quant_rows(data)
    qq, qs = quant_rows(queries)
    data_t = dq.astype(np.float32) * ds          # stored value set x~
    quer_t = qq.astype(np.float32) * qs          # q~ (int8-scan effective)
    q_resid = np.linalg.norm(queries - quer_t, axis=1)        # exact |q-q~|
    row_norm_t = np.linalg.norm(data_t, axis=1)
    sq_t = np.einsum("ij,ij->i", data_t, data_t)

    # int8-exact coarse scores vs stored values: |x~|^2 - 2 q~.x~
    # (the +|q|^2 per-query constant does not move rankings or margins)
    dots_q = quer_t @ data_t.T                    # exactly representable
    coarse = sq_t[None, :] - 2.0 * dots_q
    # true scores vs STORED values with the f32 query (refine target)
    dots_f = queries @ data_t.T
    true_s = sq_t[None, :] - 2.0 * dots_f

    n_tiles = N // SUB
    tmin = coarse.reshape(Q, n_tiles, SUB).min(axis=2)
    order = np.argsort(tmin, axis=1)
    pool = order[:, :POOL_TILES]
    boundary = np.take_along_axis(tmin, order[:, POOL_TILES:POOL_TILES + 1],
                                  axis=1)[:, 0]

    # per-tile max stored-row norm (the elo_max analog, tile-granular)
    tile_maxnorm = row_norm_t.reshape(n_tiles, SUB).max(axis=1)
    # certificate bound per query: 2 |q-q~| * max over ALL tiles outside
    # the pool cannot be cheaper than the global max — use global (stale-
    # high-safe, same as elo_max)
    bound = 2.0 * q_resid * tile_maxnorm.max()

    # k-th refined score from the pool (exact over stored values)
    rows_pool = (pool[:, :, None] * SUB +
                 np.arange(SUB)[None, None, :]).reshape(Q, -1)
    pool_scores = np.take_along_axis(true_s, rows_pool, axis=1)
    kth = np.sort(pool_scores, axis=1)[:, K - 1]
    margin = boundary - kth
    certified = margin > bound

    # fast-tier agreement: exact top-k over stored values vs pool refine
    true_top = np.argsort(true_s, axis=1)[:, :K]
    got_top = np.take_along_axis(
        rows_pool, np.argsort(pool_scores, axis=1)[:, :K], axis=1)
    agree = np.mean([len(set(true_top[i]) & set(got_top[i])) / K
                     for i in range(Q)])

    print(f"[{name}] q_resid: med {np.median(q_resid):.4f} "
          f"(|q| med {np.median(np.linalg.norm(queries, axis=1)):.2f}) | "
          f"margin med {np.median(margin):.4f} | "
          f"bound med {np.median(bound):.4f} | "
          f"certified {certified.mean() * 100:.1f}% | "
          f"pool-refine top-{K} agreement {agree:.4f}", flush=True)
    # how much tighter would the bound need to be?
    ratio = bound / np.maximum(margin, 1e-30)
    print(f"         bound/margin med {np.median(ratio):.1f}x "
          f"(certifiable iff < 1)", flush=True)


def main():
    rng = np.random.default_rng(0)
    q_iid = rng.standard_normal((Q, D)).astype(np.float32)
    print("generating iid data...", flush=True)
    data = rng.standard_normal((N, D)).astype(np.float32)
    study("iid-768d", data, q_iid)
    del data
    print("generating intrinsic-dim-32 data...", flush=True)
    basis = rng.standard_normal((32, D)).astype(np.float32)
    data = (rng.standard_normal((N, 32)).astype(np.float32) @ basis)
    qz = rng.standard_normal((Q, 32)).astype(np.float32)
    study("intr32-768d", data, qz @ basis)


if __name__ == "__main__":
    main()
