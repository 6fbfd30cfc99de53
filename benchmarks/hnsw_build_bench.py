"""MXU bulk HNSW build benchmark at TPU scale.

Protocol matches the BASELINE.md north-star rows (hnsw_1m.py): 768-d
intrinsic-dim-32 data (low-dimensional manifold through a fixed random
projection — the realistic embedding regime), m=32, recall@10 vs the
certified-exact flat oracle, ef sweep.

    python benchmarks/hnsw_build_bench.py [--n18] [--n20] [--save]

--n18 = 262,144 rows (default), --n20 = 1,048,576 rows.
--save writes the built graph's padded tables to the hnsw_1m.py
checkpoint files so --recall / the device-traversal bench can reuse it.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index import FlatIndex  # noqa: E402
from vectordb_tpu.index.hnsw_build_device import build_graph_device  # noqa: E402
from vectordb_tpu.index.hnsw_graph import HnswParams  # noqa: E402

N = 1 << 20 if "--n20" in sys.argv else 1 << 18
D, K, M, LATENT = 768, 10, 32, 32


def gen_data(n):
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((LATENT, D)).astype(np.float32)
    data = np.empty((n, D), dtype=np.float32)
    step = 1 << 17
    for lo in range(0, n, step):
        z = rng.standard_normal((min(step, n - lo), LATENT))
        data[lo: lo + step] = z.astype(np.float32) @ basis
    return basis, data


def main():
    enable_persistent_jit_cache()
    basis, data = gen_data(N)
    params = HnswParams(m=M, ef_construction=200, max_layers=8, seed=0)
    print(f"device build: {N} x {D} (m={M})", flush=True)
    t0 = time.perf_counter()
    last = [0.0, 0]

    def progress(done, total):
        now = time.perf_counter()
        if now - last[0] > 15 or done == total:
            rate = (done - last[1]) / max(now - last[0], 1e-9)
            print(f"  layer0 {done}/{total}  (+{rate:,.0f} vec/s inst)",
                  flush=True)
            last[0], last[1] = now, done

    graph = build_graph_device(list(enumerate(data)),
                               DistanceMetric.EUCLIDEAN, params,
                               progress=progress)
    dt = time.perf_counter() - t0
    print(f"BUILD: {N} rows in {dt:.0f}s  ({N / dt:,.0f} vec/s)", flush=True)

    if "--save" in sys.argv:
        import json
        import os
        art = Path(__file__).resolve().parent / ".artifacts"
        art.mkdir(exist_ok=True)
        tag = "_intr" if N == 1 << 20 else f"_intr_n{N}"
        t0 = time.perf_counter()
        tables = graph.export_padded_tables()
        tmp = art / f"hnsw1m{tag}_ckpt.tmp.npz"
        np.savez(tmp, **{k: v for k, v in tables.items()
                         if isinstance(v, np.ndarray)},
                 entry=tables["entry"], max_level=tables["max_level"])
        os.replace(tmp, art / f"hnsw1m{tag}_ckpt.npz")
        (art / f"hnsw1m{tag}_state.json").write_text(
            json.dumps({"count": N, "elapsed": dt, "builder": "device"}))
        print(f"saved tables ({time.perf_counter() - t0:.0f}s)", flush=True)

    rng = np.random.default_rng(99)
    z = rng.standard_normal((200, LATENT)).astype(np.float32)
    queries = z @ basis
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch(list(enumerate(data)))
    truth = flat.search_batch(queries, K)
    truth_ids = [{i for i, _ in row} for row in truth]
    print("oracle ready", flush=True)
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
    main()
