"""Device-side IVF-Flat primitives: k-means training + cluster-pruned search.

An index family beyond the reference (which ships flat + HNSW only),
motivated by the hardware: HNSW's pointer-chasing build is host-bound
(~10^2 vec/s at scale) while k-means training is pure MXU work (Lloyd
iterations are matmuls — millions of rows in seconds), and cluster-pruned
search reuses the same tile-granular gather + exact f32 refine machinery
as the flat index's coarse kernel, so returned distances are exact and
recall is governed only by which clusters are probed (nprobe/nlist).

Layout contract (built by index/ivf.py): the packed database is reordered
so cluster c owns tiles [c*T_c, (c+1)*T_c) of SUB rows each — every
cluster padded to the same tile count with dead slots — plus a shared
spill region of S_t tiles at the end that every search scans (post-train
inserts land there when their cluster is full).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..distance import DistanceMetric
from .coarse_kernel import SUB

# Peak refine-gather bytes per chunk (same budget class as coarse_kernel).
_REFINE_BYTES = int(2.5e9)


@functools.partial(jax.jit,
                   static_argnames=("nlist", "iters", "balance_weight"))
def kmeans_fit(data, key, nlist: int, iters: int,
               balance_weight: float = 0.0):
    """Lloyd's k-means on device. data (S, d) f32 -> centroids (nlist, d).

    Init = random distinct-ish rows (uniform sample); each iteration is an
    (S, d) @ (d, nlist) MXU matmul + a segment-sum update. Empty clusters
    keep their previous centroid. Default MXU precision — training
    tolerates bf16 noise.

    ``balance_weight`` > 0 enables size-penalized (balanced) Lloyd:
    each iteration's assignment scores get
    ``+ weight * var(data) * prev_count/target`` per cluster, pushing rows
    out of oversubscribed clusters so natural sizes concentrate near the
    mean. Measured on hard clustered data (benchmarks/exp_balanced_kmeans
    .py): weight=0.1 cuts the greedy balancer's spill ~40% at every slack
    AND raises the fraction of rows landing in their true nearest cluster
    (the final placement uses unpenalized preferences, so the penalty only
    shapes the centroids, never mis-places a row).
    """
    s, d = data.shape
    # bf16-storage samples arrive as bfloat16: fit in f32 (the sample is
    # bounded by _TRAIN_SAMPLE_MAX, so the upcast is small)
    data = data.astype(jnp.float32)
    init_idx = jax.random.choice(key, s, shape=(nlist,), replace=False)
    centroids = data[init_idx]

    if balance_weight:
        target = s / nlist
        mu = jnp.mean(data, axis=0)
        scale = jnp.mean(jnp.sum((data - mu[None, :]) ** 2, axis=1))

        def step_bal(carry, _):
            centroids, counts = carry
            c_sq = jnp.sum(centroids * centroids, axis=1)
            scores = data @ centroids.T * -2.0 + c_sq[None, :]
            pen = (balance_weight * scale) * (counts / target)
            assign = jnp.argmin(scores + pen[None, :], axis=1)
            sums = jax.ops.segment_sum(data, assign, num_segments=nlist)
            cnt = jax.ops.segment_sum(jnp.ones((s,), jnp.float32), assign,
                                      num_segments=nlist)
            new = sums / jnp.maximum(cnt, 1.0)[:, None]
            new = jnp.where(cnt[:, None] > 0.0, new, centroids)
            return (new, cnt), None

        counts0 = jnp.full((nlist,), target, jnp.float32)
        (centroids, _), _ = jax.lax.scan(step_bal, (centroids, counts0),
                                         None, length=iters)
        return centroids

    def step(centroids, _):
        c_sq = jnp.sum(centroids * centroids, axis=1)
        # argmin_c |x - c|^2 over clusters; -2xc + c^2 suffices
        scores = data @ centroids.T * -2.0 + c_sq[None, :]
        assign = jnp.argmin(scores, axis=1)
        sums = jax.ops.segment_sum(data, assign, num_segments=nlist)
        counts = jax.ops.segment_sum(jnp.ones((s,), jnp.float32), assign,
                                     num_segments=nlist)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0.0, new, centroids), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@jax.jit
def kmeans_assign_scores(data, centroids, scales=None):
    """(S, nlist) anti-affinity scores (-2xc + |c|^2): row argmin = nearest
    centroid; full sorted order is used for balanced overflow assignment.
    ``scales`` (int8 storage): per-row pow2 scales — the dot runs on raw
    codes and the scale is applied to the finished dots (exact)."""
    c_sq = jnp.sum(centroids * centroids, axis=1)
    dots = data.astype(jnp.float32) @ centroids.T
    if scales is not None:
        dots = dots * scales[:, None]
    return dots * -2.0 + c_sq[None, :]


@functools.partial(jax.jit, static_argnames=("cand", "chunk"))
def kmeans_assign_topk_all(db, centroids, cand: int, chunk: int,
                           scales=None):
    """Preference lists for EVERY slot of a device-resident database in
    one dispatch: internal lax.map chunking bounds the (chunk, nlist)
    score matrix, and only (cap, cand) int32 ids come back to the host.
    Avoids re-shipping the database over the (bursty) host link — the
    caller reuses the buffer the index already synced for search."""
    cap, d = db.shape
    cap2 = ((cap + chunk - 1) // chunk) * chunk
    if cap2 != cap:
        db = jnp.concatenate(
            [db, jnp.zeros((cap2 - cap, d), db.dtype)], axis=0)
        if scales is not None:
            scales = jnp.concatenate(
                [scales, jnp.ones((cap2 - cap,), scales.dtype)])

    if scales is None:
        def f(blk):
            scores = kmeans_assign_scores(blk, centroids)
            return jax.lax.top_k(-scores, cand)[1]

        pref = jax.lax.map(f, db.reshape(cap2 // chunk, chunk, d))
    else:
        def f(args):
            blk, s_blk = args
            scores = kmeans_assign_scores(blk, centroids, s_blk)
            return jax.lax.top_k(-scores, cand)[1]

        pref = jax.lax.map(f, (db.reshape(cap2 // chunk, chunk, d),
                               scales.reshape(cap2 // chunk, chunk)))
    return pref.reshape(cap2, cand)[:cap]


@functools.partial(jax.jit, static_argnames=("cand",))
def _assign_topk_chunk(blk, centroids, cand: int, s_blk=None):
    scores = kmeans_assign_scores(blk.astype(jnp.float32), centroids,
                                  s_blk)
    return jax.lax.top_k(-scores, cand)[1]


# Above this many rows the single-dispatch map OOMs: XLA hoists a bf16
# convert of the ENTIRE f32 database out of the lax.map (6 GB HLO temp at
# 4M x 768) and pads the stacked (steps, chunk, cand) top-k output 8x to
# the 128-lane tile (2 GB). Host-driven chunking dispatches one jit per
# chunk, so the largest temp is one (chunk, nlist) score block.
_ASSIGN_ONE_DISPATCH_MAX = 1 << 21


def assign_preferences(db, centroids, cand: int, chunk: int, scales=None):
    """Preference lists for every slot; picks the single-dispatch map for
    small databases and host-driven chunked dispatches for large ones."""
    import numpy as np

    cap = db.shape[0]
    if cap <= _ASSIGN_ONE_DISPATCH_MAX:
        return jax.device_get(kmeans_assign_topk_all(
            db, centroids, cand, chunk, scales))
    # Bound in-flight depth like the hierarchical path: each dispatched
    # chunk holds a device slice copy alive until collected, and with the
    # database already resident, dispatching every chunk ahead exhausts
    # HBM at 16M-row scale.
    out = np.empty((cap, cand), np.int32)
    handles = []

    def _drain(limit: int) -> None:
        while len(handles) > limit:
            lo0, h0 = handles.pop(0)
            out[lo0:lo0 + chunk] = jax.device_get(h0)[: cap - lo0]

    for lo in range(0, cap, chunk):
        handles.append((lo, _assign_topk_chunk(
            db[lo:lo + chunk], centroids, cand,
            None if scales is None else scales[lo:lo + chunk])))
        _drain(4)
    _drain(0)
    return out


# -- two-level (hierarchical) assignment ------------------------------------
#
# Flat assignment scores every row against every centroid: N x nlist x d
# MXU flops — the dominant training cost at large N x nlist (~17 min at
# 4M x 768 with nlist=32768). The two-level scheme cuts it ~10x:
# cluster the CENTROIDS into n_super supers, route each row to its
# nearest super with an N x n_super pass, then score the row only
# against the fine centroids of its super's s_top nearest supers.
# Assignment becomes approximate (a row whose true nearest centroid
# lives outside its super neighborhood gets a slightly farther cluster),
# which is the same error class the balanced-overflow placement already
# introduces — probing at search time still scores ALL centroids
# exactly, so recall degrades only via placement, not via probing.

_HIER_N_SUPER = 256
_HIER_S_TOP = 12


@functools.partial(jax.jit, static_argnames=("cand",))
def _score_vs_subset(rows, cents_sub, col_valid, cand: int, s_rows=None):
    """top-cand of rows (R, d) against a gathered centroid subset
    (nb, d); padded columns are masked out. Returns LOCAL indices."""
    c_sq = jnp.sum(cents_sub * cents_sub, axis=1)
    dots = rows.astype(jnp.float32) @ cents_sub.T
    if s_rows is not None:
        dots = dots * s_rows[:, None]
    scores = dots * -2.0 + c_sq[None, :]
    scores = jnp.where(col_valid[None, :], scores, jnp.inf)
    return jax.lax.top_k(-scores, cand)[1]


@functools.partial(jax.jit, static_argnames=())
def _top1_super(rows, supers, s_rows=None):
    s_sq = jnp.sum(supers * supers, axis=1)
    dots = rows.astype(jnp.float32) @ supers.T
    if s_rows is not None:
        dots = dots * s_rows[:, None]
    scores = dots * -2.0 + s_sq[None, :]
    return jnp.argmin(scores, axis=1).astype(jnp.int32)


def assign_preferences_hier(db, centroids, cand: int, chunk: int,
                            key, n_super: int = 0,
                            s_top: int = _HIER_S_TOP,
                            iters: int = 8, scales=None):
    """Two-level preference lists (global centroid ids, (cap, cand) int32).

    ``n_super=0`` auto-scales the super count with nlist. Falls back to
    the flat path when nlist is too small for a hierarchy to pay.
    """
    import numpy as np

    cap = db.shape[0]
    nlist = centroids.shape[0]
    if not n_super:
        n_super = min(_HIER_N_SUPER, max(2, nlist // 16))
    s_top = min(s_top, n_super)
    if nlist < 4 * n_super or nlist < 4 * cand:
        return assign_preferences(db, centroids, cand, chunk, scales)

    # 1. supers = k-means over the fine centroids (tiny: nlist x d)
    supers = kmeans_fit(centroids, key, n_super, iters)

    # 2. host grouping of fine centroids by nearest super
    c2s = np.asarray(jax.device_get(_top1_super(centroids, supers)))
    members = [np.nonzero(c2s == s)[0] for s in range(n_super)]

    # 3. super neighborhoods: s_top nearest supers per super
    sup_np = np.asarray(jax.device_get(supers))
    ss = np.einsum("ij,ij->i", sup_np, sup_np)
    s_scores = ss[None, :] - 2.0 * (sup_np @ sup_np.T)
    hood = np.argsort(s_scores, axis=1)[:, :s_top]          # incl. self
    hood_ids = [np.concatenate([members[t] for t in hood[s]])
                for s in range(n_super)]

    # 4. route rows to their nearest super (chunked device passes).
    # In-flight depth is bounded: each dispatched chunk holds a device
    # slice copy (chunk x d) alive until collected, and with the whole
    # database already resident (12 GB of int8 codes at 16M x 768)
    # dispatching every chunk ahead exhausts HBM.
    row_super = np.empty(cap, np.int32)
    handles = []

    def _drain_route(limit: int) -> None:
        while len(handles) > limit:
            lo0, h0 = handles.pop(0)
            row_super[lo0:lo0 + chunk] = jax.device_get(h0)[: cap - lo0]

    for lo in range(0, cap, chunk):
        handles.append((lo, _top1_super(
            db[lo:lo + chunk], supers,
            None if scales is None else scales[lo:lo + chunk])))
        _drain_route(4)
    _drain_route(0)

    # 5. per-super scoring against the neighborhood's fine centroids.
    # Rows and neighborhood sizes are padded to pow2 buckets so the jit
    # signature count stays bounded.
    from .topk import next_pow2
    out = np.empty((cap, cand), np.int32)
    order = np.argsort(row_super, kind="stable")
    bounds = np.searchsorted(row_super[order], np.arange(n_super + 1))
    # Bound both the per-call gather (a skewed super can hold millions of
    # rows -> a multi-GB db[idx] copy beside the resident database) and
    # the per-call f32 score block (rows x neighborhood): at 8M x 768
    # with nlist=65536 the codes already fill 12 of 16 GB, so a
    # 65536-row x 4096-centroid block (1 GB workspace) OOMs. Row blocks
    # scale inversely with the neighborhood width; all pow2 so the jit
    # signature count stays bounded.
    score_block_elems = 1 << 26                    # ~256 MB f32 per call

    def _row_blk(nb: int) -> int:
        return int(max(2048, min(1 << 16, score_block_elems // nb)))

    pend = []

    def _drain_pend(limit: int) -> None:
        while len(pend) > limit:
            rows_b, ids_pad0, local0 = pend.pop(0)
            loc = np.asarray(jax.device_get(local0))[: rows_b.size]
            out[rows_b] = ids_pad0[loc].astype(np.int32)

    for s in range(n_super):
        rows_s = order[bounds[s]: bounds[s + 1]]
        if rows_s.size == 0:
            continue
        ids = hood_ids[s]
        if ids.size == 0:
            # degenerate: every super in this super's neighborhood
            # captured zero fine centroids (k-means dead clusters) —
            # score these rows against ALL centroids via the flat chunk
            row_blk = _row_blk(next_pow2(int(nlist)))
            for b0 in range(0, rows_s.size, row_blk):
                rows_b = rows_s[b0: b0 + row_blk]
                r_pad = next_pow2(max(int(rows_b.size), 8))
                idx_pad = np.full(r_pad, int(rows_b[0]), np.int64)
                idx_pad[: rows_b.size] = rows_b
                idx_dev = jnp.asarray(idx_pad)
                flat_pref = _assign_topk_chunk(
                    db[idx_dev], centroids, cand,
                    None if scales is None else scales[idx_dev])
                out[rows_b] = np.asarray(
                    jax.device_get(flat_pref))[: rows_b.size]
            continue
        nb_pad = next_pow2(max(int(ids.size), cand, 8))
        ids_pad = np.full(nb_pad, ids[-1], np.int64)
        ids_pad[: ids.size] = ids
        col_valid = np.zeros(nb_pad, bool)
        col_valid[: ids.size] = True
        # a neighborhood smaller than cand cannot fill the preference
        # list without duplicates — let padding repeat the last real
        # column instead of masking, matching flat-path "cand > nlist
        # is clamped by callers" semantics (the greedy balancer assigns
        # each row once, so duplicate preference ids are harmless)
        if ids.size < cand:
            col_valid[:] = True
        cents_sub = centroids[jnp.asarray(ids_pad)]
        col_valid_dev = jnp.asarray(col_valid)
        row_blk = _row_blk(nb_pad)
        for b0 in range(0, rows_s.size, row_blk):
            rows_b = rows_s[b0: b0 + row_blk]
            r_pad = next_pow2(max(int(rows_b.size), 8))
            idx_pad = np.full(r_pad, int(rows_b[0]), np.int64)
            idx_pad[: rows_b.size] = rows_b
            idx_dev = jnp.asarray(idx_pad)
            local = _score_vs_subset(db[idx_dev], cents_sub,
                                     col_valid_dev, cand,
                                     None if scales is None else
                                     scales[idx_dev])
            pend.append((rows_b, ids_pad, local))
            _drain_pend(3)
    _drain_pend(0)
    return out


@functools.partial(jax.jit,
                   static_argnames=("metric_name", "k", "nprobe", "t_c",
                                    "s_t"))
def _ivf_search_jit(queries, db, db_sq, db_norms, valid, centroids,
                    metric_name: str, k: int, nprobe: int, t_c: int,
                    s_t: int, scales=None):
    """Cluster-pruned search. Probes the nprobe nearest clusters (t_c tiles
    each) plus the s_t spill tiles at the end of the slot space; exact
    f32-highest refine over the gathered candidates. ``scales`` (int8
    storage): per-row pow2 scales — gathered codes are dotted raw and the
    scale applied to the dots, bit-identical to dequantized rows."""
    metric = DistanceMetric(metric_name)
    qp, d = queries.shape
    n = db.shape[0]
    t_all = n // SUB
    qsq = jnp.sum(queries * queries, axis=1)
    qn = jnp.sqrt(qsq)

    # coarse: nearest centroids (euclidean in centroid space for L2/cosine
    # parity we use the metric's own affinity)
    if metric is DistanceMetric.DOT_PRODUCT:
        cscore = -(queries @ centroids.T)
    elif metric is DistanceMetric.COSINE:
        cn = jnp.sqrt(jnp.sum(centroids * centroids, axis=1))
        denom = jnp.maximum(qn[:, None] * cn[None, :], 1e-30)
        cscore = -((queries @ centroids.T) / denom)
    else:
        c_sq = jnp.sum(centroids * centroids, axis=1)
        cscore = c_sq[None, :] - 2.0 * (queries @ centroids.T)
    _, probe = jax.lax.top_k(-cscore, nprobe)            # (Qp, nprobe)

    offs_t = jnp.arange(t_c, dtype=jnp.int32)
    tiles = (probe[:, :, None] * t_c + offs_t[None, None, :]).reshape(
        qp, nprobe * t_c)
    m_t = tiles.shape[1]

    db3 = db.reshape(t_all, SUB, d)
    sq2 = db_sq.reshape(t_all, SUB)
    nrm2 = db_norms.reshape(t_all, SUB)
    vld2 = valid.reshape(t_all, SUB)
    scl2 = scales.reshape(t_all, SUB) if scales is not None else None
    offs = jnp.arange(SUB, dtype=jnp.int32)
    cand_all = (tiles[:, :, None] * SUB + offs[None, None, :]).reshape(
        qp, m_t * SUB)

    # NOTE: this repeats ops/topk._exact_rerank's per-metric refine math
    # rather than calling it — the tile-granular gather shape (contiguous
    # (SUB, d) blocks) and the query chunking are deliberate here; keep
    # the two in sync if the refine conventions ever change.
    def refine_chunk(args):
        t_i, q_i, qs_i, qn_i = args
        rows = db3[t_i].reshape(-1, m_t * SUB, d)
        if rows.dtype != jnp.float32:
            rows = rows.astype(jnp.float32)          # int8/bf16: exact
        dots = jnp.einsum("qcd,qd->qc", rows, q_i,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        if scl2 is not None:
            dots = dots * scl2[t_i].reshape(-1, m_t * SUB)
        if metric is DistanceMetric.EUCLIDEAN:
            s2 = qs_i[:, None] + sq2[t_i].reshape(-1, m_t * SUB) \
                - 2.0 * dots
        elif metric is DistanceMetric.DOT_PRODUCT:
            s2 = -dots
        else:
            qinv = jnp.where(qn_i == 0.0, 0.0, 1.0 / qn_i)
            rn = nrm2[t_i].reshape(-1, m_t * SUB)
            rinv = jnp.where(rn == 0.0, 0.0, 1.0 / rn)
            s2 = -(dots * qinv[:, None] * rinv)
        s2 = jnp.where(vld2[t_i].reshape(-1, m_t * SUB), s2, jnp.inf)
        neg, pos = jax.lax.top_k(-s2, k)
        return -neg, pos

    chunk = qp
    while chunk > 64 and chunk * m_t * SUB * d * 4 > _REFINE_BYTES:
        chunk //= 2
    if chunk < qp:
        c = chunk
        qp2 = ((qp + c - 1) // c) * c
        if qp2 != qp:
            pad = qp2 - qp
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad, m_t), tiles.dtype)], axis=0)
            queries = jnp.concatenate(
                [queries, jnp.zeros((pad, d), queries.dtype)], axis=0)
            qsq = jnp.concatenate([qsq, jnp.zeros((pad,), qsq.dtype)])
            qn = jnp.concatenate([qn, jnp.zeros((pad,), qn.dtype)])
        sk, pos = jax.lax.map(
            refine_chunk,
            (tiles.reshape(qp2 // c, c, m_t),
             queries.reshape(qp2 // c, c, d),
             qsq.reshape(qp2 // c, c), qn.reshape(qp2 // c, c)))
        sk = sk.reshape(qp2, k)[:qp]
        pos = pos.reshape(qp2, k)[:qp]
    else:
        sk, pos = refine_chunk((tiles, queries, qsq, qn))
    idx_out = jnp.take_along_axis(cand_all, pos, axis=1)

    if s_t:
        # Spill region: the SAME rows for every query, so it is scanned
        # once as a shared (Q, spill_rows) block — gathering it per query
        # multiplies the traffic by Q (measured 25 GB at Q=256 with a 2.9%
        # spill) — and merged into the per-query top-k.
        base = (t_all - s_t) * SUB
        db_sp = db[base:]
        if db_sp.dtype != jnp.float32:
            db_sp = db_sp.astype(jnp.float32)        # int8/bf16: exact
        dots = jnp.einsum("qd,cd->qc", queries[:qp], db_sp,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        if scales is not None:
            dots = dots * scales[None, base:]
        if metric is DistanceMetric.EUCLIDEAN:
            s2 = qsq[:qp, None] + db_sq[None, base:] - 2.0 * dots
        elif metric is DistanceMetric.DOT_PRODUCT:
            s2 = -dots
        else:
            qinv = jnp.where(qn[:qp] == 0.0, 0.0, 1.0 / qn[:qp])
            rn = db_norms[None, base:]
            rinv = jnp.where(rn == 0.0, 0.0, 1.0 / rn)
            s2 = -(dots * qinv[:, None] * rinv)
        s2 = jnp.where(valid[None, base:], s2, jnp.inf)
        k_sp = min(k, s_t * SUB)
        neg_sp, pos_sp = jax.lax.top_k(-s2, k_sp)
        idx_sp = pos_sp + base
        all_sk = jnp.concatenate([sk, -neg_sp], axis=1)
        all_idx = jnp.concatenate([idx_out, idx_sp], axis=1)
        neg_m, pos_m = jax.lax.top_k(-all_sk, k)
        sk = -neg_m
        idx_out = jnp.take_along_axis(all_idx, pos_m, axis=1)

    if metric is DistanceMetric.EUCLIDEAN:
        dists = jnp.where(jnp.isfinite(sk),
                          jnp.sqrt(jnp.maximum(sk, 0.0)), jnp.inf)
    elif metric is DistanceMetric.DOT_PRODUCT:
        dists = sk
    else:
        dists = jnp.where(jnp.isfinite(sk),
                          1.0 + jnp.clip(sk, -1.0, 1.0), jnp.inf)
    return dists, idx_out


def ivf_search(queries, db, db_sq, db_norms, valid, centroids,
               metric: DistanceMetric, k: int, nprobe: int, t_c: int,
               s_t: int, scales=None):
    return _ivf_search_jit(queries, db, db_sq, db_norms, valid, centroids,
                           metric.value, int(k), int(nprobe), int(t_c),
                           int(s_t), scales)


__all__ = ["kmeans_fit", "kmeans_assign_topk_all", "assign_preferences",
           "ivf_search"]
