"""4M x 768 (12 GB f32 db): f32-source coarse path, exact (1p-cert + 3p) and fast."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from vectordb_tpu.cli import enable_persistent_jit_cache
from vectordb_tpu.distance import DistanceMetric
from vectordb_tpu.ops import coarse_kernel as ck
from vectordb_tpu.ops.topk import flat_search_batched_submit
enable_persistent_jit_cache()
N, D, Q, K = 1 << 22, 768, 1024, 10
key = jax.random.PRNGKey(0)
kdb, kq = jax.random.split(key)
db = jax.random.normal(kdb, (N, D), dtype=jnp.float32)
rowsq = jax.jit(lambda x: jnp.sum(x * x, axis=1))
sq = rowsq(db)
state = {"db": db, "sq_norms": sq, "norms": jnp.sqrt(sq),
         "valid": jnp.ones((N,), bool), "coarse_f32": True,
         "elo_max": ck.residual_max_norm_f32(db)}
qb = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
staged = []
for i in range(8):
    b = qb + np.float32(i + 1); b.block_until_ready(); staged.append(b)

def pipelined(mode, state, depth=3, batches=8):
    flat_search_batched_submit(qb, state, DistanceMetric.EUCLIDEAN, K, mode=mode).collect()
    t0 = time.perf_counter()
    infl = []
    for i in range(batches):
        infl.append(flat_search_batched_submit(staged[i], state, DistanceMetric.EUCLIDEAN, K, mode=mode))
        if len(infl) >= depth: infl.pop(0).collect()
    for h in infl: h.collect()
    per = (time.perf_counter()-t0)/batches
    print(f"{mode:22s} {per*1e3:8.1f} ms/batch  {Q/per:10,.0f} qps", flush=True)

state_3p = {k: v for k, v in state.items() if k != "elo_max"}
pipelined("exact", state_3p)          # 3-pass f32-source (old path)
pipelined("exact", state)             # 1p-cert f32-source (new)
# cert rate
bad = tot = 0
for i in range(4):
    d_, i_, c_ = ck.coarse_search_1p(staged[i], db, sq, state["norms"], state["valid"], None,
                                     state["elo_max"], DistanceMetric.EUCLIDEAN, K)
    c_ = np.asarray(jax.device_get(c_)); bad += int((~c_).sum()); tot += c_.size
print(f"uncertified {bad}/{tot}")
pipelined("fast", state)
