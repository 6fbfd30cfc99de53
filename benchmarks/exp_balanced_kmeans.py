"""Prototype: size-penalized (balanced) k-means vs plain Lloyd.

Measures, on hard clustered data (the regime where round-2 notes recorded
~12% spill at 1M x 768), what fraction of rows the greedy balancer sends
to the spill region, as a function of the k-means balance penalty and the
capacity slack — plus the recall cost/benefit at fixed nprobe.

Runs on the virtual CPU mesh (sizes kept small); the conclusions transfer
because spill fraction is a property of the assignment distribution, not
of device speed.
"""

import argparse
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def make_clustered(n, d, n_centers, noise, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    idx = rng.integers(0, n_centers, n)
    x = centers[idx] + noise * rng.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32)


def kmeans_plain(data, key, nlist, iters):
    from vectordb_tpu.ops.ivf import kmeans_fit
    return kmeans_fit(data, key, nlist, iters)


def kmeans_balanced(data, key, nlist, iters, weight):
    """Size-penalized Lloyd: assignment scores get + weight*scale*(count/target)."""
    s, d = data.shape
    data = data.astype(jnp.float32)
    init_idx = jax.random.choice(key, s, shape=(nlist,), replace=False)
    centroids = data[init_idx]
    target = s / nlist
    # penalty scale in squared-distance units: data variance (mean |x-mu|^2)
    mu = jnp.mean(data, axis=0)
    scale = jnp.mean(jnp.sum((data - mu[None, :]) ** 2, axis=1))

    def step(carry, _):
        centroids, counts = carry
        c_sq = jnp.sum(centroids * centroids, axis=1)
        scores = data @ centroids.T * -2.0 + c_sq[None, :]
        pen = weight * scale * (counts / target)
        scores = scores + pen[None, :]
        assign = jnp.argmin(scores, axis=1)
        sums = jax.ops.segment_sum(data, assign, num_segments=nlist)
        cnt = jax.ops.segment_sum(jnp.ones((s,), jnp.float32), assign,
                                  num_segments=nlist)
        new = sums / jnp.maximum(cnt, 1.0)[:, None]
        new = jnp.where(cnt[:, None] > 0.0, new, centroids)
        return (new, cnt), None

    counts0 = jnp.full((nlist,), target, jnp.float32)
    (centroids, _), _ = jax.lax.scan(step, (centroids, counts0), None,
                                     length=iters)
    return centroids


def greedy_spill_frac(data, centroids, slack, cand=16):
    """Replicates index/ivf.py's greedy balance; returns spill fraction and
    max/mean cluster size stats."""
    n = data.shape[0]
    nlist = centroids.shape[0]
    c = np.asarray(centroids)
    c_sq = np.einsum("ij,ij->i", c, c)
    scores = data @ c.T * -2.0 + c_sq[None, :]
    pref = np.argsort(scores, axis=1)[:, :cand]
    natural = np.bincount(pref[:, 0], minlength=nlist)

    cap_rows = int(math.ceil(n / nlist * slack))
    cap_rows = ((cap_rows + 7) // 8) * 8   # SUB=8 tiles
    counts = np.zeros(nlist, dtype=np.int64)
    assign = np.full(n, -1, dtype=np.int64)
    for r in range(cand):
        un = np.nonzero(assign < 0)[0]
        if un.size == 0:
            break
        pc = pref[un, r]
        order = np.argsort(pc, kind="stable")
        rows_s, c_s = un[order], pc[order]
        first = np.r_[True, c_s[1:] != c_s[:-1]]
        grp_start = np.maximum.accumulate(
            np.where(first, np.arange(c_s.size), 0))
        pos = np.arange(c_s.size) - grp_start
        take = pos < (cap_rows - counts[c_s])
        assign[rows_s[take]] = c_s[take]
        counts += np.bincount(c_s[take], minlength=nlist)
    spill = np.count_nonzero(assign < 0) / n
    # recall proxy: fraction of rows that got their TRUE nearest cluster
    got_best = np.mean(assign == pref[:, 0])
    return spill, got_best, natural.max() / (n / nlist), assign, pref


def probe_recall(data, centroids, assign, pref, queries, k, nprobe):
    """Recall proxy: a query's true top-k rows are 'findable' if their row's
    assigned cluster is among the query's nprobe nearest centroids (spill
    rows always findable)."""
    c = np.asarray(centroids)
    c_sq = np.einsum("ij,ij->i", c, c)
    qs = queries @ c.T * -2.0 + c_sq[None, :]
    probe = np.argsort(qs, axis=1)[:, :nprobe]
    d2 = (np.einsum("ij,ij->i", data, data)[None, :]
          - 2.0 * queries @ data.T)
    gt = np.argsort(d2, axis=1)[:, :k]
    hits = 0
    for qi in range(queries.shape[0]):
        pr = set(probe[qi].tolist())
        for row in gt[qi]:
            a = assign[row]
            if a < 0 or a in pr:
                hits += 1
    return hits / (queries.shape[0] * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--centers", type=int, default=512)
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    data = make_clustered(args.n, args.d, args.centers, args.noise)
    rng = np.random.default_rng(7)
    queries = data[rng.choice(args.n, 64, replace=False)] \
        + 0.05 * rng.standard_normal((64, args.d)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    print(f"n={args.n} d={args.d} centers={args.centers} "
          f"noise={args.noise} nlist={args.nlist}")
    for name, fit in [
        ("plain", lambda: kmeans_plain(data, key, args.nlist, args.iters)),
        ("bal w=0.05", lambda: kmeans_balanced(data, key, args.nlist,
                                               args.iters, 0.05)),
        ("bal w=0.1", lambda: kmeans_balanced(data, key, args.nlist,
                                              args.iters, 0.1)),
        ("bal w=0.3", lambda: kmeans_balanced(data, key, args.nlist,
                                              args.iters, 0.3)),
        ("bal w=1.0", lambda: kmeans_balanced(data, key, args.nlist,
                                              args.iters, 1.0)),
    ]:
        t0 = time.time()
        cents = np.asarray(jax.device_get(fit()))
        dt = time.time() - t0
        for slack in (1.5, 1.25, 1.125):
            spill, got_best, skew, assign, pref = greedy_spill_frac(
                data, cents, slack)
            rec = probe_recall(data, cents, assign, pref, queries,
                               k=10, nprobe=8)
            print(f"  {name:12s} slack={slack:5.3f}  spill={spill:6.2%}  "
                  f"got_best={got_best:6.2%}  max/mean={skew:5.2f}  "
                  f"probe_recall@nprobe8={rec:.4f}  fit={dt:.1f}s")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
