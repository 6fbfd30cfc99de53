"""8M x 768 on ONE chip via bf16 storage (12 GB db, 2x the f32 ceiling).

Search is certified-exact over the stored bf16 values (elo_max = 0; the
margin covers only the query-side residual + accumulation)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax          # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.ops import coarse_kernel as ck  # noqa: E402
from vectordb_tpu.ops.topk import flat_search_batched_submit  # noqa: E402

N, D, Q, K = 1 << 23, 768, 1024, 10


def main():
    enable_persistent_jit_cache()
    key = jax.random.PRNGKey(0)
    kdb, kq = jax.random.split(key)
    gen16 = jax.jit(lambda k: jax.random.normal(
        k, (N, D), dtype=jnp.float32).astype(jnp.bfloat16))
    db16 = gen16(kdb)
    rowsq = jax.jit(lambda x: jnp.sum(
        x.astype(jnp.float32) * x.astype(jnp.float32), axis=1))
    sq = rowsq(db16)
    state = {"db": db16, "sq_norms": sq, "norms": jnp.sqrt(sq),
             "valid": jnp.ones((N,), bool), "hi": db16,
             "bf16_storage": True, "elo_max": jnp.float32(0.0)}
    qb = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
    staged = []
    for i in range(8):
        b = qb + np.float32(i + 1)
        b.block_until_ready()
        staged.append(b)

    def pipelined(mode, depth=3, batches=8):
        flat_search_batched_submit(qb, state, DistanceMetric.EUCLIDEAN, K,
                                   mode=mode).collect()
        t0 = time.perf_counter()
        infl = []
        for i in range(batches):
            infl.append(flat_search_batched_submit(
                staged[i], state, DistanceMetric.EUCLIDEAN, K, mode=mode))
            if len(infl) >= depth:
                infl.pop(0).collect()
        for h in infl:
            h.collect()
        per = (time.perf_counter() - t0) / batches
        print(f"{mode:8s} {per * 1e3:8.1f} ms/batch  {Q / per:10,.0f} qps",
              flush=True)

    pipelined("exact")
    bad = tot = 0
    for i in range(4):
        d_, i_, c_ = ck.coarse_search_1p(
            staged[i], db16, sq, state["norms"], state["valid"], db16,
            state["elo_max"], DistanceMetric.EUCLIDEAN, K)
        c_ = np.asarray(jax.device_get(c_))
        bad += int((~c_).sum())
        tot += c_.size
    print(f"uncertified {bad}/{tot}")
    pipelined("fast")


if __name__ == "__main__":
    main()
