"""HNSW at 1M x 768 — the BASELINE.md north-star row (reference
README.md:207 claims >95% recall at scale; tests/recall_test.rs is the
protocol, flat exact as ground truth).

Resumable long build: the host has one CPU core and builds ~85 vec/s at
this dimensionality (BASELINE.md 500k row), so the 1M build takes hours.
This script checkpoints the native graph's padded tables every
CKPT_EVERY rows and resumes from the latest checkpoint on restart.

Phases:
  python benchmarks/hnsw_1m.py            # build (resumable, host-only)
  python benchmarks/hnsw_1m.py --recall   # recall sweep vs TPU flat oracle

Data (``--data`` flag, artifacts keyed by mode):

* ``intrinsic`` (default) — 32-d latent gaussians through a fixed random
  32x768 projection: a low-intrinsic-dimension manifold, the same regime
  as the round-1 250k/500k north-star rows (BASELINE.md). This is the
  honest "realistic embedding" workload: real embedding models produce
  points on low-dimensional manifolds, and graph ANN is built for it.
* ``clustered`` — 2048 gaussian centers + 0.25 iid noise (the
  ivf_bench.py generator). HARD MODE for graph ANN: within a cluster the
  ~512 neighbors are iid gaussian at 768-d, the distance-concentration
  regime BASELINE.md documents as degenerate for every graph method
  (measured here: 0.705/0.776/0.812/0.849 at ef 50/100/200/400 — an
  honest negative row, not a protocol bug).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index.hnsw_graph import HnswParams  # noqa: E402
from vectordb_tpu.index.hnsw_native import NativeHnswGraph  # noqa: E402

N, D, K = 1 << 20, 768, 10
CENTERS, NOISE = 2048, 0.25
LATENT = 32
M = 32
CHUNK = 20_000
CKPT_EVERY = 200_000
DATA_MODE = "clustered" if "--data=clustered" in sys.argv else "intrinsic"
ART = Path(__file__).resolve().parent / ".artifacts"
_TAG = "" if DATA_MODE == "clustered" else "_intr"
CKPT = ART / f"hnsw1m{_TAG}_ckpt.npz"
STATE = ART / f"hnsw1m{_TAG}_state.json"


def gen_data():
    """Deterministic dataset (regenerated on resume; ~3 GB host RAM).
    Returns (query_source, data): query_source is whatever gen_queries
    needs (cluster centers, or the latent projection basis)."""
    rng = np.random.default_rng(0)
    if DATA_MODE == "clustered":
        centers = rng.standard_normal((CENTERS, D)).astype(np.float32)
        which = rng.integers(0, CENTERS, N)
        data = centers[which] + NOISE * rng.standard_normal(
            (N, D)).astype(np.float32)
        return centers, data
    basis = rng.standard_normal((LATENT, D)).astype(np.float32)
    data = np.empty((N, D), dtype=np.float32)
    step = 1 << 17
    for lo in range(0, N, step):  # chunked: avoid a (N, LATENT) extra copy
        z = rng.standard_normal((min(step, N - lo), LATENT))
        data[lo:lo + step] = z.astype(np.float32) @ basis
    return basis, data


def gen_queries(query_source, nq=200, seed=99):
    rng = np.random.default_rng(seed)
    if DATA_MODE == "clustered":
        qwhich = rng.integers(0, CENTERS, nq)
        return query_source[qwhich] + NOISE * rng.standard_normal(
            (nq, D)).astype(np.float32)
    z = rng.standard_normal((nq, LATENT)).astype(np.float32)
    return z @ query_source


def params():
    # max_layers=8: with m=32 (ml = 1/ln 32 ≈ 0.29) levels above 5 have
    # probability < 1e-7 at N=1M; capping the padded table depth keeps the
    # checkpoint at ~2 GB instead of 4 GB (reference default is 16,
    # graph.rs:46 — search semantics are unchanged below the cap)
    return HnswParams(m=M, ef_construction=200, max_layers=8, seed=0)


def save_ckpt(graph, count, elapsed):
    ART.mkdir(exist_ok=True)
    t0 = time.perf_counter()
    tables = graph.export_padded_tables()
    tmp = CKPT.with_suffix(".tmp.npz")
    np.savez(tmp, **{k: v for k, v in tables.items()
                     if isinstance(v, np.ndarray)},
             entry=tables["entry"], max_level=tables["max_level"])
    os.replace(tmp, CKPT)
    STATE.write_text(json.dumps({"count": count, "elapsed": elapsed}))
    print(f"  [ckpt @ {count}: {time.perf_counter() - t0:.0f}s]", flush=True)


def load_ckpt(graph):
    if not (CKPT.exists() and STATE.exists()):
        return 0, 0.0
    st = json.loads(STATE.read_text())
    with np.load(CKPT) as z:
        tables = {k: z[k] for k in
                  ("vectors", "norms", "neighbors", "levels", "valid",
                   "id_of_slot")}
        tables["entry"] = int(z["entry"])
        tables["max_level"] = int(z["max_level"])
    graph.import_padded_tables(tables)
    print(f"resumed from checkpoint: {st['count']} rows, "
          f"{st['elapsed']:.0f}s prior build time", flush=True)
    return int(st["count"]), float(st["elapsed"])


def build():
    centers, data = gen_data()
    del centers
    graph = NativeHnswGraph(DistanceMetric.EUCLIDEAN, params())
    count, elapsed = load_ckpt(graph)
    print(f"building 1M x {D} (m={M}, efc=200) from row {count}", flush=True)
    last_ckpt = count
    while count < N:
        hi = min(count + CHUNK, N)
        items = [(i, data[i]) for i in range(count, hi)]
        t0 = time.perf_counter()
        graph.insert_batch(items, n_threads=1)
        dt = time.perf_counter() - t0
        elapsed += dt
        done = hi - count
        count = hi
        print(f"  {count:>8}/{N}  {done / dt:,.0f} vec/s "
              f"(total {elapsed / 3600:.2f}h)", flush=True)
        if count - last_ckpt >= CKPT_EVERY or count == N:
            save_ckpt(graph, count, elapsed)
            last_ckpt = count
    print(f"BUILD DONE: {N} rows in {elapsed:.0f}s "
          f"({N / elapsed:,.0f} vec/s)", flush=True)


def recall():
    """ef sweep vs the TPU certified-exact flat oracle (recall_test.rs
    protocol: recall@k = |HNSW ∩ flat| / k, averaged)."""
    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.index import FlatIndex
    enable_persistent_jit_cache()
    graph = NativeHnswGraph(DistanceMetric.EUCLIDEAN, params())
    count, elapsed = load_ckpt(graph)
    if count < N:
        print(f"checkpoint has {count}/{N} rows — finish the build first")
        return
    centers, data = gen_data()
    queries = gen_queries(centers)
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch(list(enumerate(data)))
    truth = flat.search_batch(queries, K)
    truth_ids = [{i for i, _ in row} for row in truth]
    print(f"oracle ready; build was {elapsed:.0f}s "
          f"({N / elapsed:,.0f} vec/s)", flush=True)
    for ef in (50, 100, 200, 400):
        t0 = time.perf_counter()
        rec = 0.0
        for qi in range(queries.shape[0]):
            got = {i for i, _ in graph.search_knn(queries[qi], K, ef=ef)}
            rec += len(got & truth_ids[qi]) / K
        per = (time.perf_counter() - t0) / queries.shape[0]
        rec /= queries.shape[0]
        print(f"  ef={ef:>4}: recall@10={rec:.4f}  {per * 1e3:.1f} ms/query",
              flush=True)


if __name__ == "__main__":
    if "--recall" in sys.argv:
        recall()
    else:
        build()
