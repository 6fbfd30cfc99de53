"""PQ-Flat beyond-RAM scale: 2^25 (33.5M) x 768 on ONE chip through the
full index facade.

The capacity story: device holds 3.2 GB of PQ codes (96 B/row) — 32x less
than f32 — while the full-precision rows live in a 103 GB disk-backed
memmap (FlatIndex host_backing) that only the per-query exact re-rank
touches (R rows/query, served by the OS page cache). f32 rows top out at
4M on this chip, bf16 at 8M, int8 at 16M; PQ doubles the int8 ceiling and
has 4x more headroom before HBM runs out (codes for 134M rows fit).

Ground truth: host BLAS over the memmap on a query subsample (the exact
device scan cannot hold 2^25 x 768 in any storage mode), plus stored-row
self-hit checks (exact duplicates must return distance 0 at rank 1).

Run: python benchmarks/pq_scale.py [--logn 25] [--q 4096]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index import PqFlatIndex  # noqa: E402

GEN_CHUNK = 1 << 20
INTRINSIC = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=25)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--gt", type=int, default=256,
                    help="queries ground-truthed on host (expensive)")
    ap.add_argument("--refines", type=str, default="64,128")
    ap.add_argument("--backing", type=str, default="/tmp/pq_scale_rows")
    ap.add_argument("--enc-slab-log", type=int, default=19,
                    help="rows per encode slab = 2^this (default 2^19: "
                         "1.5 GB H2D per slab — the relay has wedged on "
                         "3 GB transfers)")
    args = ap.parse_args()
    n, d, q, k = 1 << args.logn, args.d, args.q, args.k

    import vectordb_tpu.index.pq as pqmod
    pqmod._ENC_SLAB = 1 << args.enc_slab_log

    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    # intrinsic-dim-32 protocol (the north-star data model)
    basis = rng.standard_normal((INTRINSIC, d)).astype(np.float32) / \
        np.float32(np.sqrt(INTRINSIC))
    queries = rng.standard_normal((q, INTRINSIC)).astype(np.float32) @ basis

    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, seed=0,
                      host_backing=args.backing)

    def gen_chunks():
        for a in range(0, n, GEN_CHUNK):
            c = min(GEN_CHUNK, n - a)
            blk = rng.standard_normal((c, INTRINSIC)).astype(
                np.float32) @ basis
            if a % (8 * GEN_CHUNK) == 0:
                print(f"  gen+ingest {a / n:.0%}", flush=True)
            yield blk

    t0 = time.perf_counter()
    idx.bulk_load_stream(n, d, gen_chunks())
    t_add = time.perf_counter() - t0
    print(f"ingest {t_add:.0f}s ({n / t_add:,.0f} vec/s, "
          f"{n * d * 4 / t_add / 1e9:.2f} GB/s to disk)", flush=True)

    t0 = time.perf_counter()
    idx.train()
    t_train = time.perf_counter() - t0
    print(f"TRAIN (codebook fit) {t_train:.0f}s — m={idx._m} "
          f"ksub={idx.ksub}", flush=True)

    # visible per-slab encode progress (the full-db encode runs inside
    # the first search's device sync; at 32 x 1M-row slabs over a bursty
    # relay, silence is indistinguishable from a wedge)
    orig_encode = idx._encode_slots
    enc = {"rows": 0, "t": time.perf_counter()}

    def counted_encode(slots):
        out = orig_encode(slots)
        enc["rows"] += len(slots)
        print(f"  encode {enc['rows'] / n:.0%} "
              f"({time.perf_counter() - enc['t']:.0f}s)", flush=True)
        return out

    idx._encode_slots = counted_encode

    # first search pays the full-db encode + scan compile
    t0 = time.perf_counter()
    idx.search_batch(queries[:16], k)
    t_enc = time.perf_counter() - t0
    print(f"encode+compile+first-batch {t_enc:.0f}s "
          f"(device codes: {n * idx._m / 2**30:.1f} GiB; encode "
          f"{n / t_enc:,.0f} vec/s incl transfers)", flush=True)

    # self-hit exactness: stored rows must return themselves at dist 0
    probe_ids = rng.integers(0, n, 32)
    probe = idx._vectors[np.sort(probe_ids)]
    got = idx.search_batch(np.ascontiguousarray(probe), 1)
    hits = sum(int(row[0][0] == int(i) and row[0][1] < 1e-4)
               for row, i in zip(got, np.sort(probe_ids)))
    print(f"self-hit: {hits}/32 exact", flush=True)

    # host BLAS ground truth on a subsample (streams the 103 GB memmap)
    gt_q = queries[:args.gt]
    t0 = time.perf_counter()
    best_d = np.full((args.gt, k), np.inf, np.float32)
    best_i = np.zeros((args.gt, k), np.int64)
    qsq = np.sum(gt_q * gt_q, axis=1)[:, None]
    for a in range(0, n, GEN_CHUNK):
        blk = idx._vectors[a:a + GEN_CHUNK]
        sq = np.einsum("ij,ij->i", blk, blk)
        d2 = qsq + sq[None, :] - 2.0 * (gt_q @ blk.T)
        cat_d = np.concatenate([best_d, d2.astype(np.float32)], axis=1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(a, a + len(blk)),
                                     (args.gt, len(blk)))], axis=1)
        sel = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cat_d, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
        if a % (8 * GEN_CHUNK) == 0:
            print(f"  ground truth {a / n:.0%} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    want = [set(row.tolist()) for row in best_i]
    print(f"ground truth done in {time.perf_counter() - t0:.0f}s",
          flush=True)

    for r in (int(x) for x in args.refines.split(",")):
        got = idx.search_batch(gt_q, k, refine=r)
        recall = float(np.mean(
            [len({i for i, _ in row} & want[qi]) / k
             for qi, row in enumerate(got)]))
        idx.search_batch(queries, k, refine=r)   # warm the Q bucket
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            idx.search_batch(queries, k, refine=r)
        per = (time.perf_counter() - t0) / iters
        print(f"refine={r:4d}: {q / per:8,.0f} QPS ({per * 1e3:7.0f} "
              f"ms/batch) recall@10={recall:.4f}", flush=True)


if __name__ == "__main__":
    main()
