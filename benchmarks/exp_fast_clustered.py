"""Fast-mode (1-pass, exact tile selection, NO certificate) agreement on
HARD data layouts, not just iid gaussian.

The m=12 fast pool (ops/coarse_kernel.py:_fast1p_pool) was validated at
1.0000 top-10 agreement on iid 2^20 x 768 (benchmarks/exp_fastpool.py).
Review concern: exact selection runs over bf16-NOISY coarse scores, so on
data with many near-duplicate distances around the k-th boundary more
than `slack` tiles could fall inside the noise band and true top-k rows
could be dropped. This harness measures agreement on the two adversarial
layouts the repo already benchmarks:

  clustered  — centers=N/512 + 0.25*noise (the IVF hard mode): queries
               perturbed FROM DB ROWS land inside a ~512-row cluster
               whose members are all nearly equidistant;
  manifold   — intrinsic-dim-32 (the HNSW north-star protocol);
  duplicate  — 64 exact copies of each of N/64 base rows, queries on the
               rows themselves: the k-th boundary is a 64-way TIE, the
               literal worst case for boundary noise.

For each layout: top-10 agreement of coarse_search_1p_fast vs the
certified-exact path, pool sweep m in {12, 16, 22}.

    python benchmarks/exp_fast_clustered.py [--n=1048576]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.cli import enable_persistent_jit_cache  # noqa: E402
from vectordb_tpu.distance import DistanceMetric  # noqa: E402
from vectordb_tpu.ops import coarse_kernel as ck  # noqa: E402

N, D, Q, K = 1 << 20, 768, 1024, 10
for a in sys.argv[1:]:
    if a.startswith("--n="):
        N = int(a.split("=")[1])


def make_db(layout: str, key):
    kdb, kq, kc, ka = jax.random.split(key, 4)
    if layout == "clustered":
        nc = max(N // 512, 1)
        centers = jax.random.normal(kc, (nc, D), dtype=jnp.float32)
        assign = jax.random.randint(ka, (N,), 0, nc)
        db = centers[assign] + 0.25 * jax.random.normal(
            kdb, (N, D), dtype=jnp.float32)
        # queries perturbed from db rows: in-cluster neighborhoods
        qrows = jax.random.randint(kq, (Q,), 0, N)
        qs = db[qrows] + 0.05 * jax.random.normal(
            jax.random.fold_in(kq, 1), (Q, D), dtype=jnp.float32)
    elif layout == "manifold":
        r = 32
        basis = jax.random.normal(kc, (r, D), dtype=jnp.float32) / r ** 0.5
        db = jax.random.normal(kdb, (N, r), dtype=jnp.float32) @ basis
        db = db + 0.05 * jax.random.normal(ka, (N, D), dtype=jnp.float32)
        qs = (jax.random.normal(kq, (Q, r), dtype=jnp.float32) @ basis
              + 0.05 * jax.random.normal(jax.random.fold_in(kq, 1),
                                         (Q, D), dtype=jnp.float32))
    elif layout == "duplicate":
        nb = N // 64
        base = jax.random.normal(kc, (nb, D), dtype=jnp.float32)
        db = jnp.repeat(base, 64, axis=0)
        qrows = jax.random.randint(kq, (Q,), 0, nb)
        qs = base[qrows]          # query IS a 64-way-tied db row
    else:
        raise ValueError(layout)
    return db, qs


def agreement(fast_ids, exact_ids, exact_d, fast_d):
    """Set agreement on ids; ties broken by DISTANCE equality (duplicate
    rows make many id sets equally correct — count a fast id as a hit if
    its distance matches the exact k-th-or-better distance set)."""
    hits = 0.0
    for fi, ei, ed, fd in zip(fast_ids, exact_ids, exact_d, fast_d):
        es = set(ei.tolist())
        ok = sum(1 for j, f in enumerate(fi)
                 if f in es or fd[j] <= ed[-1] + 1e-6)
        hits += ok / len(fi)
    return hits / len(fast_ids)


def production_check(layout: str, np_db: np.ndarray, np_qs: np.ndarray):
    """The tiered production path (FlatIndex.search_batch: 1p certified ->
    bf16x3 rerun -> f32 scan) must stay EXACT even when tier-1
    certification collapses (cert 0/Q on the clustered layout), and its
    cost on that layout prices the fallback."""
    from vectordb_tpu.index.flat import FlatIndex
    from vectordb_tpu.ops import topk

    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.bulk_load_matrix(np.arange(len(np_db)), np_db)
    res = idx.search_batch(np_qs, K)              # warm (compile included)
    t0 = time.perf_counter()
    res = idx.search_batch(np_qs, K)
    per = time.perf_counter() - t0
    dev = idx._device
    ok = 0
    for c0 in range(0, len(np_qs), 256):
        ch = np_qs[c0:c0 + 256]
        od, oi = topk.flat_search(jnp.asarray(ch), dev["db"],
                                  dev["sq_norms"], dev["norms"],
                                  dev["valid"], DistanceMetric.EUCLIDEAN, K)
        od, oi = np.asarray(od), np.asarray(oi)
        for j in range(len(ch)):
            got = res[c0 + j]
            # both sides are f32 pipelines with different accumulation
            # orders: near-zero distances carry ~1e-4 cancellation noise
            # (verified vs f64 ground truth: max |prod - truth| = 1.7e-4
            # at this shape), so ids are compared up to distance ties at
            # that scale, not bit-equality
            tol = 1e-3 + 1e-4 * float(od[j][-1])
            dmatch = np.allclose([dd for _, dd in got], od[j], atol=tol)
            oset = set(oi[j].tolist())
            tie_ok = all(int(i) in oset or dd <= od[j][-1] + tol
                         for i, dd in got)
            ok += int(dmatch and tie_ok)
    print(f"[{layout}] PRODUCTION tiered path: {ok}/{len(np_qs)} exact vs "
          f"oracle, {per * 1e3:.1f} ms/batch ({len(np_qs) / per:,.0f} QPS "
          f"e2e under host contention)", flush=True)
    del idx


def main():
    enable_persistent_jit_cache()
    import gc
    for layout in ("clustered", "manifold", "duplicate"):
        key = jax.random.PRNGKey(hash(layout) % (1 << 31))
        db, qs = make_db(layout, key)
        np_db = np.asarray(db)
        np_qs = np.asarray(qs)
        sq = jnp.sum(db * db, axis=1)
        st = dict(db=db, sq=sq, norms=jnp.sqrt(sq),
                  valid=jnp.ones((N,), bool))
        hi, _ = ck.split_hi_lo(db)
        elo = ck.residual_max_norm(db, hi)

        # true oracle: XLA highest-precision f32 scan, chunked
        from vectordb_tpu.ops import topk
        ed_c, ei_c = [], []
        for c0 in range(0, Q, 256):
            od, oi = topk.flat_search(qs[c0:c0 + 256], st["db"], st["sq"],
                                      st["norms"], st["valid"],
                                      DistanceMetric.EUCLIDEAN, K)
            ed_c.append(np.asarray(od))
            ei_c.append(np.asarray(oi))
        ed, ei = np.concatenate(ed_c), np.concatenate(ei_c)

        t0 = time.perf_counter()
        pd_, pi_, cert = ck.coarse_search_1p(
            qs, st["db"], st["sq"], st["norms"], st["valid"], hi, elo,
            DistanceMetric.EUCLIDEAN, K)
        pd_, pi_ = np.asarray(pd_), np.asarray(pi_)
        ncert = int(np.asarray(cert).sum())
        ag1p = agreement(pi_, ei, ed, pd_)
        print(f"[{layout}] 1p tier: cert {ncert}/{Q}, uncertified-pool "
              f"agreement vs oracle {ag1p:.4f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

        real = ck._fast1p_pool
        try:
            for m in (12, 16, 22):
                ck._fast1p_pool = (
                    lambda k, t, m=m: (min(m, t // ck.SUPER),
                                       min(m, (t // ck.SUPER) * ck.SUPER)))
                fd, fi = ck.coarse_search_1p_fast(
                    qs, st["db"], st["sq"], st["norms"], st["valid"], hi,
                    DistanceMetric.EUCLIDEAN, K)
                fd, fi = np.asarray(fd), np.asarray(fi)
                ag = agreement(fi, ei, ed, fd)
                print(f"[{layout}] fast m={m:2d}: top-{K} agreement "
                      f"{ag:.4f}", flush=True)
        finally:
            ck._fast1p_pool = real
        del db, qs, st, hi
        gc.collect()
        production_check(layout, np_db, np_qs)
        del np_db, np_qs
        gc.collect()


if __name__ == "__main__":
    main()
