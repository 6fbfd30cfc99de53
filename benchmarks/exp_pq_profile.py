"""Profile split for the PQ scan: device scan vs host re-rank vs pooled
selection strategy, 1M x 768 intrinsic-dim-32, refine sweep.

Isolates where the high-refine QPS regression (378 QPS at refine=128,
/tmp/pq_1m_postfix.log) actually lives before optimizing it.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np


def make_data(n, d, dim_int=32, seed=0):
    rng = np.random.default_rng(seed)
    basis = rng.normal(size=(dim_int, d)).astype(np.float32)
    z = rng.normal(size=(n, dim_int)).astype(np.float32)
    return z @ basis + 0.05 * rng.normal(size=(n, d)).astype(np.float32)


def main():
    import jax, jax.numpy as jnp
    from vectordb_tpu.index.pq import PqFlatIndex
    from vectordb_tpu.distance import DistanceMetric

    n, d, q = 1 << 20, 768, 4096
    rows = make_data(n, d).astype(np.float32)
    queries = make_data(q, d, seed=7) .astype(np.float32)

    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, seed=0)
    ids = np.arange(n)
    t0 = time.time(); idx.bulk_load_matrix(ids, rows); idx.train()
    print(f"ingest+train {time.time()-t0:.1f}s", flush=True)
    idx.search_batch(queries[:16], 10)   # one-time full encode + compile
    print(f"encode+compile done {time.time()-t0:.1f}s", flush=True)

    state = idx._scan_state()
    from vectordb_tpu.ops.pq import pq_scan_topr
    for r in (32, 64, 128, 256):
        qd = jnp.asarray(queries)
        # scan only (device), includes compile on first call per r
        sv, sl = idx._scan_call(state, qd, r)
        jax.block_until_ready((sv, sl))
        t0 = time.time()
        sv, sl = idx._scan_call(state, qd, r)
        jax.block_until_ready((sv, sl))
        t_scan = time.time() - t0
        t0 = time.time()
        svn = np.asarray(jax.device_get(sv)); sln = np.asarray(jax.device_get(sl)).astype(np.int64)
        t_fetch = time.time() - t0
        t0 = time.time()
        out = idx._rerank(queries, svn, sln, 10, idx._tick)
        t_rerank = time.time() - t0
        print(f"r={r:4d}: scan {t_scan*1e3:8.1f} ms  fetch {t_fetch*1e3:7.1f} ms  "
              f"rerank {t_rerank*1e3:8.1f} ms  total {(t_scan+t_fetch+t_rerank)*1e3:8.1f} ms "
              f"({q/(t_scan+t_fetch+t_rerank):,.0f} QPS)", flush=True)


if __name__ == "__main__":
    main()
