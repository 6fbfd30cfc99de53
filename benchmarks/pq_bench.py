"""PQ-Flat on one chip: batched subspace k-means training + refine sweep
(QPS + recall@10 vs the certified-exact flat scan).

Default data = the intrinsic-dim-32 protocol (the repo's north-star data
model, same as the HNSW 1M row): PQ codebooks resolve low-dimensional
manifold structure well. --data clustered runs ivf_bench.py's hard
2048-tight-center workload instead — an honest NEGATIVE for plain PQ
(within-cluster deviations sit below global quantization resolution, so
codes tie and recall tracks refine/cluster_size; that workload wants
IVF's probed exact refine, or residual coding). At --logn 20 (1M x 768)
the device holds 96 MB of codes instead of 3 GB of f32 rows; the
capacity story scales from there (see pq_scale.py for the >16M-row lane).
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

CENTERS = 2048
NOISE = 0.25


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=None,
                    help="subquantizers (default d/8)")
    ap.add_argument("--refines", type=str, default="32,64,128,256")
    ap.add_argument("--data",
                    choices=["intrinsic", "clustered",
                             "clustered_intrinsic"],
                    default="intrinsic",
                    help="clustered_intrinsic: full-d centers + "
                         "low-intrinsic-dim (32) within-cluster "
                         "deviations — the realistic clustered model "
                         "(real embedding residuals are low-dim); "
                         "plain 'clustered' uses iid 768-d noise, the "
                         "distance-concentration degenerate regime "
                         "where NO code/graph method retains recall")
    ap.add_argument("--family", type=str, default="pq",
                    help="comma list of pq|ivfpq — ivfpq encodes "
                         "RESIDUALS vs the IVF centroid (the clustered-"
                         "data lane); both run over the same data and "
                         "ground truth for a direct A/B")
    ap.add_argument("--opq", type=str, default="on",
                    help="comma list of on|off — A/B the OPQ pre-rotation "
                         "(pq: raw-row space; ivfpq: residual space)")
    ap.add_argument("--rerank", type=str, default="auto",
                    help="comma list of auto|device|host — A/B the exact "
                         "re-rank venue (round-4: device-side re-rank)")
    args = ap.parse_args()
    for tok in args.opq.split(","):
        if tok not in ("on", "off"):
            # a typo ('On', 'true') must not silently run opq=off twice
            ap.error(f"bad --opq value {tok!r}: expected on|off")
    for tok in args.rerank.split(","):
        if tok not in ("auto", "device", "host"):
            ap.error(f"bad --rerank value {tok!r}: "
                     "expected auto|device|host")
    n, d, q, k = 1 << args.logn, args.d, args.q, args.k

    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    if args.data == "clustered":
        centers = rng.standard_normal((CENTERS, d)).astype(np.float32)
        which = rng.integers(0, CENTERS, n)
        data_np = centers[which] + NOISE * rng.standard_normal(
            (n, d)).astype(np.float32)
        qwhich = rng.integers(0, CENTERS, q)
        queries = centers[qwhich] + NOISE * rng.standard_normal(
            (q, d)).astype(np.float32)
        del centers
    elif args.data == "clustered_intrinsic":
        # centers span full d; within-cluster deviations live in a
        # shared 32-dim subspace smeared across all raw coordinates —
        # OPQ's target structure, fit here on the RESIDUAL sample
        centers = rng.standard_normal((CENTERS, d)).astype(np.float32)
        basis = rng.standard_normal((32, d)).astype(np.float32) / \
            np.float32(np.sqrt(32))
        # E||z @ basis|| ~= sqrt(d), so NOISE alone matches the plain
        # clustered protocol's residual norm (NOISE * sqrt(d))
        which = rng.integers(0, CENTERS, n)
        data_np = centers[which] + NOISE * (
            rng.standard_normal((n, 32)).astype(np.float32) @ basis)
        qwhich = rng.integers(0, CENTERS, q)
        queries = centers[qwhich] + NOISE * (
            rng.standard_normal((q, 32)).astype(np.float32) @ basis)
        del centers
    else:
        # intrinsic-dim-32 (the north-star protocol, hnsw_1m.py parity)
        basis = rng.standard_normal((32, d)).astype(np.float32) / \
            np.float32(np.sqrt(32))
        data_np = rng.standard_normal((n, 32)).astype(np.float32) @ basis
        queries = rng.standard_normal((q, 32)).astype(np.float32) @ basis
    print(f"data generated: n={n} d={d} ({args.data})", flush=True)

    # exact ground truth on a sample via chunked host BLAS (the device
    # flat scan would pay a fresh multi-minute compile just for this)
    sample = queries[:512]
    t0 = time.perf_counter()
    qsq = np.sum(sample * sample, axis=1)[:, None]
    best_d = np.full((len(sample), k), np.inf, np.float32)
    best_i = np.zeros((len(sample), k), np.int64)
    gtc = 1 << 18
    for a in range(0, n, gtc):
        blk = data_np[a:a + gtc]
        sq = np.einsum("ij,ij->i", blk, blk)
        d2 = qsq + sq[None, :] - 2.0 * (sample @ blk.T)
        cat_d = np.concatenate([best_d, d2.astype(np.float32)], axis=1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(a, a + len(blk)),
                                     (len(sample), len(blk)))], axis=1)
        sel = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cat_d, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
    want = [set(row.tolist()) for row in best_i]
    tdist = {qi: {int(i): float(np.sqrt(max(dv, 0.0)))
                  for i, dv in zip(best_i[qi], best_d[qi])}
             for qi in range(16)}
    print(f"ground truth done ({time.perf_counter() - t0:.0f}s host BLAS)",
          flush=True)

    ids = np.arange(n, dtype=np.int64)
    variants = []
    for family in args.family.split(","):
        # both families A/B the OPQ rotation (ivfpq fits it on the
        # RESIDUAL sample and rotates the whole scan space)
        for o in args.opq.split(","):
            variants.extend((family, o == "on", rr)
                            for rr in args.rerank.split(","))
    for family, rotate, rerank in variants:
        tag = f"{family}/opq={'on' if rotate else 'off'}/rerank={rerank}"
        if family == "ivfpq":
            from vectordb_tpu.index import IvfPqIndex
            idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, m=args.m, seed=0,
                             rotate=rotate, rerank=rerank)
        else:
            idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=args.m, seed=0,
                              rotate=rotate, rerank=rerank)
        family = tag
        t0 = time.perf_counter()
        idx.bulk_load_matrix(ids, data_np)
        t_add = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx.train()
        t_train = time.perf_counter() - t0
        print(f"[{family}] ingest {t_add:.1f}s; TRAIN {t_train:.1f}s — "
              f"m={idx._m} ksub={idx.ksub}", flush=True)
        # first search pays the one-time full encode + scan compile
        t0 = time.perf_counter()
        idx.search_batch(queries[:16], k)
        print(f"[{family}] encode+compile+first-batch "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        for r in (int(x) for x in args.refines.split(",")):
            got = idx.search_batch(sample, k, refine=r)
            recall = float(np.mean(
                [len({i for i, _ in row} & want[qi]) / k
                 for qi, row in enumerate(got)]))
            for qi in range(16):
                for rid, dist in got[qi]:
                    if rid in tdist[qi]:
                        assert abs(dist - tdist[qi][rid]) < 1e-3
            idx.search_batch(queries, k, refine=r)   # warm the Q-bucket
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                idx.search_batch(queries, k, refine=r)
            per = (time.perf_counter() - t0) / iters
            print(f"[{family}] refine={r:4d}: {q / per:8,.0f} QPS "
                  f"({per * 1e3:7.1f} ms/batch) recall@10={recall:.4f}",
                  flush=True)
        del idx


if __name__ == "__main__":
    main()
