"""Device-side HNSW traversal at 1M x 768 (VERDICT round-1 item 4: the
device-ANN demo measured at real scale, after the visited-bitmask fix cut
per-query state from 1 MB to 128 KB).

Loads the padded graph tables checkpointed by benchmarks/hnsw_1m.py
(either data mode), ships them to the chip, and measures the vmapped
beam-search traversal (ops/hnsw_device.py) against the host C++ traversal
on the same queries: ms/query, QPS, and id overlap.

Usage: python benchmarks/hnsw_1m_device.py [--data=clustered] [--q=256]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import benchmarks.hnsw_1m as h1m  # noqa: E402  (data-mode flags shared)
from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.index.hnsw_graph import HnswParams  # noqa: E402
from vectordb_tpu.index.hnsw_native import NativeHnswGraph  # noqa: E402
from vectordb_tpu.ops.hnsw_device import hnsw_search_device  # noqa: E402

Q = 256
for a in sys.argv:
    if a.startswith("--q="):
        Q = int(a.split("=")[1])
K, EF = 10, 100


def main():
    enable_persistent_jit_cache()
    if not (h1m.CKPT.exists() and h1m.STATE.exists()):
        print(f"no checkpoint at {h1m.CKPT} — run hnsw_1m.py first")
        return
    st = json.loads(h1m.STATE.read_text())
    print(f"checkpoint: {st['count']} rows ({h1m.DATA_MODE})", flush=True)

    with np.load(h1m.CKPT) as z:
        vectors = z["vectors"]
        norms = z["norms"]
        neighbors = z["neighbors"]
        levels = z["levels"]
        valid = z["valid"]
        id_of_slot = z["id_of_slot"].astype(np.int32)
        entry = int(z["entry"])
        max_level = int(z["max_level"])

    # queries only need the generator's source (centers / basis), which is
    # drawn FIRST from gen_data's seed-0 stream: rebuild it directly
    # without materializing the 3 GB dataset
    rng = np.random.default_rng(0)
    if h1m.DATA_MODE == "clustered":
        qsrc = rng.standard_normal((h1m.CENTERS, h1m.D)).astype(np.float32)
    else:
        qsrc = rng.standard_normal((h1m.LATENT, h1m.D)).astype(np.float32)
    queries = h1m.gen_queries(qsrc, nq=Q, seed=123)

    # --- host traversal baseline (single core) on a subsample ----------
    g = NativeHnswGraph(DistanceMetric.EUCLIDEAN, h1m.params())
    g.import_padded_tables({
        "vectors": vectors, "norms": norms, "neighbors": neighbors,
        "levels": levels, "valid": valid,
        "id_of_slot": id_of_slot.astype(np.int64),
        "entry": entry, "max_level": max_level})
    nq_host = min(Q, 64)
    t0 = time.perf_counter()
    host = [g.search_knn(queries[i], K, ef=EF) for i in range(nq_host)]
    t_host = (time.perf_counter() - t0) / nq_host
    print(f"host traversal: {t_host * 1e3:.2f} ms/query "
          f"({1.0 / t_host:,.0f} QPS single-core)", flush=True)

    # --- device traversal ---------------------------------------------
    max_layers = h1m.params().max_layers
    tabs = (jnp.asarray(vectors), jnp.asarray(norms),
            jnp.asarray(neighbors), jnp.asarray(valid),
            jnp.asarray(id_of_slot), jnp.asarray(entry, dtype=jnp.int32),
            jnp.asarray(max_level, dtype=jnp.int32))
    qdev = jnp.asarray(queries)
    t0 = time.perf_counter()
    d_, i_ = hnsw_search_device(*tabs, qdev, "euclidean", K, EF,
                                max_layers)
    jax.device_get((d_, i_))   # block_until_ready lies through the relay
    t_compile = time.perf_counter() - t0
    print(f"compile+first batch: {t_compile:.0f}s", flush=True)
    times = []
    for it in range(3):
        qd = jnp.asarray(queries + np.float32(0.001 * (it + 1)))
        jax.device_get(qd[0])
        t0 = time.perf_counter()
        d_, i_ = hnsw_search_device(*tabs, qd, "euclidean", K, EF,
                                    max_layers)
        jax.device_get((d_, i_))
        times.append(time.perf_counter() - t0)
    per = min(times) / Q
    print(f"device traversal: {per * 1e3:.2f} ms/query "
          f"({Q / min(times):,.0f} QPS at Q={Q})", flush=True)

    d0, i0 = hnsw_search_device(*tabs, qdev, "euclidean", K, EF,
                                max_layers)
    i0 = np.asarray(i0)
    ov = np.mean([
        len({int(x) for x in i0[qi][:K]} & {i for i, _ in host[qi]}) / K
        for qi in range(nq_host)])
    print(f"device-vs-host id overlap: {ov:.4f}")


if __name__ == "__main__":
    main()
