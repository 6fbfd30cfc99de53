"""PQ-Flat beyond-RAM scale: 2^25 (33.5M) x 768 on ONE chip through the
full index facade — wedge-proof, resumable edition.

The capacity story: device holds 3.2 GB of PQ codes (96 B/row) — 32x less
than f32 — while the full-precision rows live in a 103 GB disk-backed
memmap (FlatIndex host_backing) that only the per-query exact re-rank
touches (R rows/query, served by the OS page cache). f32 rows top out at
4M on this chip, bf16 at 8M, int8 at 16M; PQ doubles the int8 ceiling and
has 4x more headroom before HBM runs out (codes for 134M rows fit).

Why this shape: the platform relay has wedged MID-DEVICE-CALL twice at
this scale (a >90 min freeze inside one 3 GB H2D with zero host CPU while
fresh sessions measured the relay healthy). A multi-hour linear script
loses everything to one such wedge, so every phase here is RESUMABLE
(row file reattached via FlatIndex.bulk_attach_memmap, norms/codebook/
codes/ground-truth cached on disk, sweep rows appended to a jsonl) and
the default entry point is a SUPERVISOR that runs the phases in a child
process, watches a heartbeat file, kills the child by exact pid when the
heartbeat goes stale, and respawns it — a wedge costs one watchdog
timeout, not the run.

Run:        python benchmarks/pq_scale.py [--logn 25] [--q 4096]
Phases only (no supervisor): add --child
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GEN_CHUNK = 1 << 20
GEN_Q = 4096        # queries drawn from the rng BEFORE row generation —
                    # fixed so the row byte stream (and thus the on-disk
                    # row file) is identical regardless of --q
INTRINSIC = 32


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=25)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--gt", type=int, default=256,
                    help="queries ground-truthed on host (expensive)")
    ap.add_argument("--refines", type=str, default="32,64,128")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions per refine point")
    ap.add_argument("--dispatch-q", type=int, default=512,
                    help="queries per device dispatch in the sweep (small"
                         " dispatches bound what one relay wedge costs)")
    ap.add_argument("--big-dispatch", action="store_true", default=True)
    ap.add_argument("--no-big-dispatch", dest="big_dispatch",
                    action="store_false",
                    help="skip the one full-batch QPS attempt per refine")
    ap.add_argument("--backing", type=str, default="/tmp/pq_scale_rows")
    ap.add_argument("--state", type=str, default="/tmp/pq_scale_state")
    ap.add_argument("--enc-slab-log", type=int, default=19,
                    help="rows per encode slab = 2^this (default 2^19: "
                         "1.5 GB H2D per slab — the relay has wedged on "
                         "3 GB transfers)")
    ap.add_argument("--watchdog", type=int, default=600,
                    help="supervisor kills the child after this many "
                         "seconds without a heartbeat")
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--child", action="store_true",
                    help="run the phases directly (no supervisor)")
    return ap.parse_args(argv)


# ---------------------------------------------------------------- supervisor
# The heartbeat-watchdog + planned-restart machinery that this harness
# proved against a real relay leak in round 4 now lives in the framework
# (vectordb_tpu.utils.supervised, shared with bench.py); this is just
# the wiring.

from vectordb_tpu.utils.supervised import Heartbeat, supervise as _supervise


def supervise(args) -> int:
    state = Path(args.state)
    state.mkdir(parents=True, exist_ok=True)
    child_args = [a for a in sys.argv[1:] if a != "--child"] + ["--child"]
    res = _supervise(
        [sys.executable, __file__] + child_args,
        hb_path=str(state / "heartbeat"),
        watchdog=float(args.watchdog),
        attempts=args.max_restarts,
        restart_rc=3,   # planned clean-address-space handoff after a
                        # heavy encode: respawn without burning an attempt
        log=lambda m: print(m.replace("[supervise]", "[supervisor]"),
                            flush=True))
    if res.rc == 0:
        print("[supervisor] child completed", flush=True)
    else:
        print("[supervisor] giving up after max restarts", flush=True)
    return res.rc


# ---------------------------------------------------------------- phases


def find_row_file(backing: str, cap: int, d: int):
    from glob import glob
    want = cap * d * 4
    for p in sorted(glob(os.path.join(backing, f"rows_*_{cap}x{d}.f32"))):
        if os.path.getsize(p) == want:
            return p
    return None


def phase_rows(args, idx, hb, rng, basis, state: Path):
    """Attach the existing row file (cheap) or generate + ingest (103 GB,
    ~16 min). Either way the norm cache ends up beside the state."""
    n, d = 1 << args.logn, args.d
    sq_path = state / f"sqnorms_{n}x{d}.f32"
    row_path = find_row_file(args.backing, n, d)
    if row_path is not None:
        sq = None
        if sq_path.exists() and sq_path.stat().st_size == n * 4:
            sq = np.fromfile(sq_path, np.float32)
            print(f"attach: reusing row file {row_path} + cached norms",
                  flush=True)
        else:
            print(f"attach: reusing row file {row_path} (one streaming "
                  f"norm pass — warms the page cache too)", flush=True)
        t0 = time.perf_counter()
        hb.beat()
        idx.bulk_attach_memmap(row_path, n, d, sq_norms=sq)
        hb.beat()
        print(f"attach done in {time.perf_counter() - t0:.0f}s",
              flush=True)
        if sq is None:
            idx._sq_norms[:n].tofile(sq_path)
        # spot-check the file really is this generator's output: chunk 0
        # regenerated and compared (cached marker skips repeats)
        marker = state / f"rows_verified_{n}x{d}"
        if not marker.exists():
            t0 = time.perf_counter()
            blk = rng.standard_normal((GEN_CHUNK, INTRINSIC)).astype(
                np.float32) @ basis
            if not np.array_equal(np.asarray(idx._vectors[:4096]),
                                  blk[:4096]):
                raise RuntimeError(
                    "row file content does not match the generator "
                    "stream — delete the backing dir and re-ingest")
            marker.touch()
            print(f"row spot-check passed "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        hb.beat()
        return
    # fresh ingest
    def gen_chunks():
        for a in range(0, n, GEN_CHUNK):
            c = min(GEN_CHUNK, n - a)
            blk = rng.standard_normal((c, INTRINSIC)).astype(
                np.float32) @ basis
            if a % (8 * GEN_CHUNK) == 0:
                print(f"  gen+ingest {a / n:.0%}", flush=True)
            hb.beat()
            yield blk

    t0 = time.perf_counter()
    idx.bulk_load_stream(n, d, gen_chunks())
    t_add = time.perf_counter() - t0
    print(f"ingest {t_add:.0f}s ({n / t_add:,.0f} vec/s, "
          f"{n * d * 4 / t_add / 1e9:.2f} GB/s to disk)", flush=True)
    idx._sq_norms[:n].tofile(sq_path)
    (state / f"rows_verified_{n}x{d}").touch()


def phase_train(args, idx, hb, state: Path):
    n, d = 1 << args.logn, args.d
    cb_path = state / f"codebook_{n}x{d}.npz"
    if cb_path.exists():
        with np.load(cb_path) as z:
            tables = {"codebook": z["codebook"]}
            if "rotation" in z.files:
                tables["rotation"] = z["rotation"]
        idx.import_trained_state(tables)
        print(f"train: imported cached codebook (m={idx._m} "
              f"ksub={idx.ksub} rot={'rotation' in tables})", flush=True)
        hb.beat()
        return
    t0 = time.perf_counter()
    hb.beat()
    idx.train()
    hb.beat()
    print(f"TRAIN (codebook fit) {time.perf_counter() - t0:.0f}s — "
          f"m={idx._m} ksub={idx.ksub}", flush=True)
    st = idx.export_trained_state()
    save = {"codebook": st["codebook"]}
    if "rotation" in st:
        save["rotation"] = st["rotation"]
    np.savez(cb_path, **save)


def phase_encode(args, idx, hb, state: Path):
    """Resumable full-database encode: slabs of 2^enc_slab_log rows run
    through the one device encode program and land in an on-disk codes
    memmap with a high-water mark, so a wedge mid-encode costs one slab."""
    n, d, m = 1 << args.logn, args.d, idx._m
    cap = idx.capacity
    codes_path = state / f"codes_{n}x{d}_m{m}.u8"
    hwm_path = state / f"codes_{n}x{d}_m{m}.hwm"
    fresh = not (codes_path.exists()
                 and codes_path.stat().st_size == cap * m)
    mode = "w+" if fresh else "r+"
    codes_mm = np.memmap(codes_path, np.uint8, mode=mode, shape=(cap, m))
    hwm = 0 if fresh or not hwm_path.exists() else \
        int(hwm_path.read_text().strip() or 0)
    slab = 1 << args.enc_slab_log
    fresh_rows = n - hwm
    if hwm < n:
        print(f"encode: resuming at row {hwm:,} / {n:,}", flush=True)
        t0 = time.perf_counter()
        for a in range(hwm, n, slab):
            sl = np.arange(a, min(a + slab, n), dtype=np.int64)
            hb.beat()
            codes_mm[a:a + len(sl)] = idx._encode_slots(sl)
            codes_mm.flush()
            hwm_path.write_text(str(a + len(sl)))
            hb.beat()
            print(f"  encode {(a + len(sl)) / n:.0%} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        dt = time.perf_counter() - t0
        print(f"encode done: {n - hwm:,} rows in {dt:.0f}s "
              f"({(n - hwm) / max(dt, 1e-9):,.0f} vec/s incl transfers; "
              f"device codes {n * m / 2**30:.1f} GiB)", flush=True)
    else:
        print(f"encode: cached ({codes_path})", flush=True)
    if fresh_rows > (1 << 23):
        # measured on this platform: each encode slab's H2D leaves its
        # host staging copy ANONYMOUS-resident in the relay client (a
        # ~100 GB leak after a full 2^25 encode) — that squeezes the
        # page cache to nothing and turns every later re-rank gather
        # into cold disk IO. The codes are safely on disk; exit with the
        # restart code so the supervisor respawns a fresh process that
        # loads them with a clean address space.
        print("encode: heavy fresh encode done — restarting child for a "
              "clean address space (relay H2D staging leak)", flush=True)
        sys.exit(3)
    # install the codes without a re-encode
    for lo in range(0, n, GEN_CHUNK):
        idx._codes[lo:min(lo + GEN_CHUNK, n)] = \
            codes_mm[lo:min(lo + GEN_CHUNK, n)]
    idx._pq_full_reencode = False
    idx._pq_dirty.clear()
    idx._codes_dev = None
    hb.beat()


def phase_selfhit(args, idx, hb):
    """Stored rows must return themselves at distance ~0 through the full
    scan + re-rank pipeline (also pays the scan compile + 3 GB codes H2D
    on a SMALL query batch, under the watchdog)."""
    n = 1 << args.logn
    rng = np.random.default_rng(123)
    probe_ids = np.sort(rng.integers(0, n, 32))
    probe = np.ascontiguousarray(idx._vectors[probe_ids])
    hb.beat()
    t0 = time.perf_counter()
    got = idx.search_batch(probe, 1)
    hb.beat()
    hits = sum(int(row[0][0] == int(i) and row[0][1] < 1e-4)
               for row, i in zip(got, probe_ids))
    print(f"self-hit: {hits}/32 exact (first scan incl compile + codes "
          f"H2D: {time.perf_counter() - t0:.0f}s)", flush=True)
    if hits < 32:
        raise RuntimeError("self-hit failed — codes/rows out of sync")


def phase_gt(args, idx, hb, queries, state: Path):
    """Host BLAS ground truth over the memmap, resumable per chunk."""
    n, d, k = 1 << args.logn, args.d, args.k
    gt_q = queries[:args.gt]
    gt_path = state / f"gt_{n}x{d}_k{k}_q{args.gt}.npz"
    part_path = state / f"gt_{n}x{d}_k{k}_q{args.gt}.part.npz"
    if gt_path.exists():
        with np.load(gt_path) as z:
            print("ground truth: cached", flush=True)
            return z["ids"]
    start = 0
    best_d = np.full((args.gt, k), np.inf, np.float32)
    best_i = np.zeros((args.gt, k), np.int64)
    if part_path.exists():
        with np.load(part_path) as z:
            start = int(z["pos"])
            best_d, best_i = z["d"], z["i"]
        print(f"ground truth: resuming at row {start:,}", flush=True)
    qsq = np.sum(gt_q * gt_q, axis=1)[:, None]
    t0 = time.perf_counter()
    for a in range(start, n, GEN_CHUNK):
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
        hb.beat()
        if (a // GEN_CHUNK) % 4 == 3:
            np.savez(part_path, pos=a + GEN_CHUNK, d=best_d, i=best_i)
            print(f"  ground truth {(a + GEN_CHUNK) / n:.0%} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    np.savez(gt_path, ids=best_i, dists=best_d)
    part_path.unlink(missing_ok=True)
    print(f"ground truth done in {time.perf_counter() - t0:.0f}s",
          flush=True)
    return best_i


def sweep_rows_done(sweep_path: Path):
    done = {}
    if sweep_path.exists():
        for line in sweep_path.read_text().splitlines():
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            key = (row["refine"], row["dispatch_q"])
            done[key] = row
    return done


def timed_search(idx, queries, k, refine, dispatch_q, hb, reps):
    """Serial small-dispatch batches; returns (qps, ms_per_full_batch)
    over the best-of-reps total (per-dispatch sync keeps each device
    call small, so one wedge costs one watchdog window)."""
    q = len(queries)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for a in range(0, q, dispatch_q):
            idx.search_batch(queries[a:a + dispatch_q], k, refine=refine)
            hb.beat()
        best = min(best, time.perf_counter() - t0)
    return q / best, best * 1e3


def phase_sweep(args, idx, hb, queries, want_sets, state: Path):
    n, d, k, q = 1 << args.logn, args.d, args.k, args.q
    sweep_path = state / f"sweep_{n}x{d}.jsonl"
    done = sweep_rows_done(sweep_path)
    gt_q = queries[:args.gt]
    refines = [int(x) for x in args.refines.split(",")]
    dispatches = [args.dispatch_q]
    if args.big_dispatch:
        dispatches.append(q)
    for r in refines:
        # recall on the ground-truthed queries, small dispatches
        recall = None
        for disp in dispatches:
            if (r, disp) in done:
                row = done[(r, disp)]
                print(f"sweep: cached refine={r} dispatch={disp}: "
                      f"{row['qps']:,.0f} QPS recall={row['recall']:.4f}",
                      flush=True)
                continue
            if recall is None:
                got = []
                for a in range(0, args.gt, args.dispatch_q):
                    got += idx.search_batch(
                        gt_q[a:a + args.dispatch_q], k, refine=r)
                    hb.beat()
                recall = float(np.mean(
                    [len({i for i, _ in row} & want_sets[qi]) / k
                     for qi, row in enumerate(got)]))
            # one warm pass for this (refine, dispatch) jit signature
            for a in range(0, q, disp):
                idx.search_batch(queries[a:a + disp], k, refine=r)
                hb.beat()
            qps, ms = timed_search(idx, queries, k, r, disp, hb,
                                   args.reps)
            row = {"refine": r, "dispatch_q": disp, "qps": qps,
                   "ms_batch": ms, "recall": recall, "q": q, "k": k,
                   "n": n, "d": d, "reps": args.reps}
            with open(sweep_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            done[(r, disp)] = row
            print(f"refine={r:4d} dispatch={disp:5d}: {qps:8,.0f} QPS "
                  f"({ms:7.0f} ms/{q}-batch) recall@{k}={recall:.4f}",
                  flush=True)
    print("sweep complete:", flush=True)
    for key in sorted(done):
        row = done[key]
        print(f"  refine={row['refine']:4d} dispatch={row['dispatch_q']:5d}"
              f" {row['qps']:8,.0f} QPS recall@{k}={row['recall']:.4f}",
              flush=True)


def run_child(args) -> None:
    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.index import PqFlatIndex
    import vectordb_tpu.index.pq as pqmod

    pqmod._ENC_SLAB = 1 << args.enc_slab_log
    enable_persistent_jit_cache()
    state = Path(args.state)
    state.mkdir(parents=True, exist_ok=True)
    hb = Heartbeat(state / "heartbeat")
    hb.beat()

    n, d = 1 << args.logn, args.d
    rng = np.random.default_rng(0)
    # intrinsic-dim-32 protocol (the north-star data model); draw order
    # (basis, GEN_Q queries, row chunks) is FROZEN — the row file bytes
    # depend on it
    basis = rng.standard_normal((INTRINSIC, d)).astype(np.float32) / \
        np.float32(np.sqrt(INTRINSIC))
    queries = rng.standard_normal((GEN_Q, INTRINSIC)).astype(
        np.float32) @ basis
    queries = queries[:args.q]

    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, seed=0,
                      host_backing=args.backing)

    phase_rows(args, idx, hb, rng, basis, state)
    phase_train(args, idx, hb, state)
    phase_encode(args, idx, hb, state)
    phase_selfhit(args, idx, hb)
    gt_ids = phase_gt(args, idx, hb, queries, state)
    want_sets = [set(row.tolist()) for row in gt_ids]
    phase_sweep(args, idx, hb, queries, want_sets, state)


def main():
    args = parse_args()
    if args.child:
        run_child(args)
    else:
        sys.exit(supervise(args))


if __name__ == "__main__":
    main()
