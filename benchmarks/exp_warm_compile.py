"""Warm-start compile cost (round-3 verdict item 5): does a SECOND
process actually hit the persistent XLA compilation cache for the
Mosaic/Pallas kernels, or is the big compile a per-process tax?

Method: the parent creates a FRESH cache dir, then runs the same probe
subprocess twice with VDB_TPU_JIT_CACHE pointed at it. Run 1 is the cold
compile; run 2 is a new process against the now-populated cache. Each
probe reports compile+first-batch wall time for its kernel family.

Probes:
  coarse  — the 1-pass certified flat-scan pipeline at the headline
            shape (2^20 x 768, Q=4096, k=10)
  hnsw    — the jitted vmapped device beam-search traversal over a
            50k x 128 graph (built once by the parent, checkpointed to
            the scratch dir, loaded by both probe runs)

    python benchmarks/exp_warm_compile.py [--probe coarse,hnsw]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe_coarse():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.ops.coarse_kernel import (residual_max_norm,
                                                split_hi_lo)
    from vectordb_tpu.ops.topk import flat_search_batched

    enable_persistent_jit_cache()
    n, d, q, k = 1 << 20, 768, 4096, 10
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    db = jax.random.normal(kdb, (n, d), dtype=jnp.float32)
    sq = jnp.sum(db * db, axis=1)
    hi, lo = split_hi_lo(db)
    state = {"db": db, "sq_norms": sq, "norms": jnp.sqrt(sq),
             "valid": jnp.ones((n,), dtype=bool), "hi": hi, "lo": lo,
             "elo_max": residual_max_norm(db, hi)}
    qs = np.asarray(jax.random.normal(kq, (q, d), dtype=jnp.float32))
    np.asarray(jnp.sum(db))            # materialize before timing
    t0 = time.perf_counter()
    flat_search_batched(qs, state, DistanceMetric.EUCLIDEAN, k,
                        mode="exact")
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    flat_search_batched(qs + np.float32(1), state,
                        DistanceMetric.EUCLIDEAN, k, mode="exact")
    t_steady = time.perf_counter() - t0
    print(f"PROBE coarse compile+first={t_first:.1f}s "
          f"steady={t_steady:.3f}s", flush=True)


def probe_hnsw(scratch: str):
    import numpy as np

    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.index.hnsw import HnswIndex, HnswParams

    enable_persistent_jit_cache()
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=7))
    tables = dict(np.load(os.path.join(scratch, "graph.npz")))
    idx.graph.import_padded_tables(tables)
    rng = np.random.default_rng(1)
    qs = rng.standard_normal((256, 128)).astype(np.float32)
    t0 = time.perf_counter()
    idx.search_batch_device(qs, 10, ef=64)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx.search_batch_device(qs + np.float32(1), 10, ef=64)
    t_steady = time.perf_counter() - t0
    print(f"PROBE hnsw compile+first={t_first:.1f}s "
          f"steady={t_steady:.3f}s", flush=True)


def build_hnsw_graph(scratch: str):
    import numpy as np

    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.index.hnsw import HnswIndex, HnswParams

    rng = np.random.default_rng(0)
    n, d = 50_000, 128
    basis = rng.standard_normal((16, d)).astype(np.float32)
    data = rng.standard_normal((n, 16)).astype(np.float32) @ basis
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=7),
                    bulk_build="host")
    t0 = time.perf_counter()
    idx.build_batch([(i, data[i]) for i in range(n)])
    print(f"graph build {time.perf_counter() - t0:.0f}s", flush=True)
    np.savez(os.path.join(scratch, "graph.npz"),
             **idx.graph.export_padded_tables())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", type=str, default="coarse,hnsw")
    ap.add_argument("--child", type=str, default=None)
    ap.add_argument("--scratch", type=str, default=None)
    args = ap.parse_args()

    if args.child:
        if args.child == "coarse":
            probe_coarse()
        else:
            probe_hnsw(args.scratch)
        return

    scratch = tempfile.mkdtemp(prefix="warm_compile_")
    probes = args.probe.split(",")
    if "hnsw" in probes:
        build_hnsw_graph(scratch)
    for probe in probes:
        cache = os.path.join(scratch, f"cache_{probe}")
        env = dict(os.environ, VDB_TPU_JIT_CACHE=cache)
        for run in ("cold", "warm"):
            t0 = time.perf_counter()
            out = subprocess.run(
                [sys.executable, __file__, "--child", probe,
                 "--scratch", scratch],
                env=env, capture_output=True, text=True, timeout=3600)
            wall = time.perf_counter() - t0
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("PROBE")]
            print(f"{probe} {run}: {line[0] if line else out.stderr[-300:]}"
                  f"  (process wall {wall:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
