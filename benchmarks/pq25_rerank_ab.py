"""Re-rank venue A/B at 2^25 through pq_scale's caches (host vs gathered).

The r5 sweep ran the gathered device re-rank (host gathers candidate
rows from the 103 GB memmap, chip computes exact distances): refine=32
beat r4's host-re-rank rows (290 vs 246 QPS) but refine=64/128 fell
below them (168 vs 225, 94 vs 120) — hypothesis: the H2D of the
(Q, r, d) gathered rows through the relay outweighs the host BLAS it
replaces once r grows. This probe re-runs the sweep points with
rerank="host" on the SAME caches (row file, codebook, codes, ground
truth), so the only variable is the venue; the result sets the
`rerank="auto"` policy for the host_backing lane by measurement.

Usage: python benchmarks/pq25_rerank_ab.py [--refines 32,64,128]
       (run after pq_scale completes; everything must be cached)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pq_scale import (GEN_Q, INTRINSIC, parse_args, phase_encode,  # noqa
                      phase_rows, phase_train)
from vectordb_tpu.utils.supervised import Heartbeat  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--refines", default="32,64,128")
    ap.add_argument("--dispatches", default="4096,512")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rerank", default="host")
    my = ap.parse_args()

    args = parse_args(["--child"])
    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.index import PqFlatIndex

    enable_persistent_jit_cache()
    state = Path(args.state)
    hb = Heartbeat.from_env()
    n, d, k = 1 << args.logn, args.d, args.k

    rng = np.random.default_rng(0)
    basis = rng.standard_normal((INTRINSIC, d)).astype(np.float32) / \
        np.float32(np.sqrt(INTRINSIC))
    queries = (rng.standard_normal((GEN_Q, INTRINSIC)).astype(np.float32)
               @ basis)[:args.q]

    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, seed=0,
                      host_backing=args.backing, rerank=my.rerank)
    phase_rows(args, idx, hb, rng, basis, state)
    phase_train(args, idx, hb, state)
    phase_encode(args, idx, hb, state)
    print(f"rerank venue resolved: {idx._rerank_venue()}", flush=True)

    gt_path = state / f"gt_{n}x{d}_k{k}_q{args.gt}.npz"
    want_sets = None
    if gt_path.exists():
        with np.load(gt_path) as z:
            gt_ids = z["ids"]
        want_sets = [set(int(x) for x in row) for row in gt_ids]
        print("ground truth: cached", flush=True)

    gt_q = queries[:args.gt]
    for r in (int(x) for x in my.refines.split(",")):
        recall = None
        if want_sets is not None:
            got = []
            for a in range(0, args.gt, 512):
                got += idx.search_batch(gt_q[a:a + 512], k, refine=r)
            recall = float(np.mean(
                [len({i for i, _ in row} & want_sets[qi]) / k
                 for qi, row in enumerate(got)]))
        for disp in (int(x) for x in my.dispatches.split(",")):
            for a in range(0, args.q, disp):        # warm the signature
                idx.search_batch(queries[a:a + disp], k, refine=r)
            best = np.inf
            for _ in range(my.reps):
                t0 = time.perf_counter()
                for a in range(0, args.q, disp):
                    idx.search_batch(queries[a:a + disp], k, refine=r)
                best = min(best, time.perf_counter() - t0)
            print(f"rerank={my.rerank} refine={r:4d} dispatch={disp:5d}: "
                  f"{args.q / best:8,.0f} QPS ({best * 1e3:7.0f} ms/"
                  f"{args.q}-batch)"
                  + (f" recall@{k}={recall:.4f}" if recall is not None
                     else ""), flush=True)


if __name__ == "__main__":
    main()
