"""Fused flat-scan distance + top-k on device.

Replaces the reference's brute-force scan (src/flat_index.rs:52-65: distance
to every row, full O(n log n) sort, truncate to k) with a single jitted XLA
program per (capacity, d, Q, k, metric) signature:

    (Q, d) @ (d, N) matmul on the MXU
    -> norm corrections fused on the VPU
    -> invalid/filtered slots masked to +inf
    -> jax.lax.top_k   (O(n k) on device, no host round-trip)

Shapes are bucketed to powers of two so the jit cache stays small while
arbitrary Q / k keep working. A Pallas streaming kernel for very large N
lives in ops/flat_kernel.py; this module is the portable XLA path and the
dispatch point.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..distance import DistanceMetric, pairwise_distances


def next_pow2(n: int, floor: int = 1) -> int:
    n = max(int(n), floor)
    return 1 << (n - 1).bit_length()


# "highest" = exact f32 accumulation on the MXU (bf16x6 passes on TPU).
# The flat index's contract is exactness, so this is the default; swap to
# "default" for a ~3x faster approximate scan.
MATMUL_PRECISION = "highest"


@functools.partial(jax.jit, static_argnames=("metric_name", "k"))
def _flat_search_jit(queries, db, db_sq_norms, db_norms, valid, metric_name, k):
    """queries (Q, d), db (N, d), valid bool (N,) -> (dists (Q,k) asc, idx (Q,k))."""
    metric = DistanceMetric(metric_name)
    dists = pairwise_distances(
        jnp, queries, db, metric, db_sq_norms=db_sq_norms, db_norms=db_norms,
        precision=MATMUL_PRECISION,
    )
    dists = jnp.where(valid[None, :], dists, jnp.inf)
    neg_vals, idx = jax.lax.top_k(-dists, k)
    return -neg_vals, idx


def flat_search(queries, db, db_sq_norms, db_norms, valid,
                metric: DistanceMetric, k: int):
    """Single fused search call. All array args device-resident (or numpy).

    ``k`` must be <= db.shape[0]; invalid slots come back with distance +inf
    and must be dropped by the caller.
    """
    return _flat_search_jit(queries, db, db_sq_norms, db_norms, valid,
                            metric.value, int(k))


# Candidate pool for the fast path's coarse pass: at least this many (and
# at least FAST_OVERFETCH * k) rows survive into the exact re-rank.
FAST_OVERFETCH = 8
FAST_MIN_CANDIDATES = 128
# approx_min_k's PartialReduce recall knob: together with the oversampled
# candidate pool this lands ~99.3% top-10 id agreement with the exact scan
# (measured at 2^20 x 768) while costing barely more than the matmul alone.
FAST_RECALL_TARGET = 0.95



def _exact_rerank(queries, db, db_sq_norms, db_norms, valid, cand,
                  metric: DistanceMetric, k: int):
    """Exact f32 re-rank of per-query candidate rows ``cand`` (Q, C):
    returns (dists (Q, k'), ids (Q, k')) ascending, +inf for dead rows.
    Shared by the fast and tiled-exact paths."""
    cand_rows = db[cand]
    # precision="highest" is required: the MXU's default single-pass bf16
    # grade puts ~1e-3-relative error on these dots (measured 2.2e-1 absolute
    # at d=768 vs 1.3e-5 at highest), which would break the exact-distance
    # contract of the refine. The candidate set is tiny, so the cost is nil.
    dots = jnp.einsum("qcd,qd->qc", cand_rows, queries,
                      preferred_element_type=jnp.float32,
                      precision="highest")
    dead = ~valid[cand]
    if metric is DistanceMetric.EUCLIDEAN:
        q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
        exact = jnp.sqrt(jnp.maximum(q_sq + db_sq_norms[cand] - 2.0 * dots,
                                     0.0))
    elif metric is DistanceMetric.DOT_PRODUCT:
        exact = -dots
    else:
        qn = jnp.sqrt(jnp.sum(queries * queries, axis=1, keepdims=True))
        denom = qn * db_norms[cand]
        sim = dots / jnp.where(denom == 0.0, 1.0, denom)
        exact = 1.0 - jnp.clip(sim, -1.0, 1.0)
    exact = jnp.where(dead, jnp.inf, exact)
    neg_vals, pos = jax.lax.top_k(-exact, min(k, exact.shape[1]))
    return -neg_vals, jnp.take_along_axis(cand, pos, axis=1)

@functools.partial(jax.jit, static_argnames=("metric_name", "k"))
def _flat_search_fast_jit(queries, db, db_sq_norms, db_norms, valid,
                          metric_name, k):
    """Two-tier search: full scan reduced with the TPU-native
    ``approx_min_k`` (XLA PartialReduce — costs ~nothing on top of the
    distance matmul, unlike exact top_k which adds ~35% at large Q), then
    an exact f32 re-rank of the surviving candidate pool. Returned
    distances are exact; returned ids match the exact scan for ~99.3% of
    positions at the default knobs (tunable via FAST_* constants)."""
    metric = DistanceMetric(metric_name)
    n = db.shape[0]
    q = queries.shape[0]
    kc = min(max(k * FAST_OVERFETCH, FAST_MIN_CANDIDATES), n)
    # coarse pass at the MXU's native single-pass precision: its error only
    # perturbs which of the kc (>=12.8x oversampled) candidates survive —
    # the exact f32 re-rank restores true distances and ordering. Measured
    # agreement with the exact scan is unchanged vs a full-precision coarse
    # pass (99.3% top-10 at 2^20 x 768), at ~1.7x the throughput.
    coarse = pairwise_distances(jnp, queries, db, metric,
                                db_sq_norms=db_sq_norms, db_norms=db_norms,
                                precision=None)
    coarse = jnp.where(valid[None, :], coarse, jnp.inf)
    _, cand = jax.lax.approx_min_k(coarse, kc,
                                   recall_target=FAST_RECALL_TARGET)
    return _exact_rerank(queries, db, db_sq_norms, db_norms, valid, cand,
                         metric, k)


def flat_search_fast(queries, db, db_sq_norms, db_norms, valid,
                     metric: DistanceMetric, k: int):
    """Two-tier (coarse scan + exact re-rank) search."""
    return _flat_search_fast_jit(queries, db, db_sq_norms, db_norms, valid,
                                 metric.value, int(k))


# Max queries per fallback chunk when certification fails for a few
# queries in a large batch (bounds the (chunk, N) distance matrix).
_FALLBACK_CHUNK = 256

# Below this capacity the 1-pass certified tier is skipped: the bf16x3
# pipeline is already sub-ms there and the extra tier only adds a possible
# fallback round-trip. Overridable for tests.
_EXACT1P_MIN_N = int(os.environ.get("VDB_TPU_EXACT1P_MIN_N", 1 << 18))


def _use_exact1p(device_state: dict, capacity: int, d: int,
                 k_eff: int) -> bool:
    from . import coarse_kernel
    # bf16 storage ignores the capacity gate: tier 1 IS its exact path
    # (the stored db is its own hi mirror, elo_max = 0)
    big_enough = (capacity >= _EXACT1P_MIN_N
                  or bool(device_state.get("bf16_storage")))
    return ("elo_max" in device_state
            and big_enough
            and coarse_kernel.supports_1p(capacity, d, k_eff)
            and os.environ.get("VDB_TPU_EXACT1P", "1") != "0")


def _collect_certified(dists, idx, certified, queries_np, q, fb_state,
                       metric, k):
    """Fetch a certified search's outputs; re-run uncertified rows through
    the next tier (whatever ``fb_state`` still routes to: the bf16x3
    pipeline when only elo_max was stripped, the XLA scan when the mirrors
    were). One device_get for all three outputs — separate fetches pay the
    ~25 ms relay round-trip apiece."""
    d_, i_, cert = jax.device_get((dists, idx, certified))
    cert = cert[:q]
    if bool(np.all(cert)):
        return d_[:q], i_[:q]
    # Certification failed for some queries (k-th neighbor within the
    # rounding margin of the selection boundary). Recompute ONLY those
    # queries, in bounded chunks: a whole-batch rerun at large Q would
    # materialize a (Q, N) matrix on top of the resident mirrors and can
    # exceed HBM.
    d_ = d_[:q].copy()
    i_ = i_[:q].copy()
    bad = np.nonzero(~cert)[0]
    for start in range(0, bad.shape[0], _FALLBACK_CHUNK):
        rows = bad[start:start + _FALLBACK_CHUNK]
        sub_d, sub_i = flat_search_batched(
            np.ascontiguousarray(np.asarray(queries_np)[rows]),
            fb_state, metric, k, mode="exact")
        d_[rows] = sub_d[:, : d_.shape[1]]
        i_[rows] = sub_i[:, : i_.shape[1]]
    return d_, i_


# Row-tile size for the exact tiled path: small tiles keep the refine pool
# (k * EXACT_TILE_ROWS rows/query) tiny while the tile-min reduce fuses
# into the distance matmul.
EXACT_TILE_ROWS = 16


@functools.partial(jax.jit, static_argnames=("metric_name", "k"))
def _flat_search_exact_tiled_jit(queries, db, db_sq_norms, db_norms, valid,
                                 metric_name, k):
    """Provably-exact two-phase search in pure XLA.

    Phase 1 reduces the masked distance matrix to per-tile minima — XLA
    fuses the min into the matmul consumer, so the (Q, N) matrix is never
    materialized and the expensive exact top_k over N disappears. Phase 2
    takes each query's k best tiles: if a row r outside them were in the
    true top-k, each chosen tile's minimum (<= r's distance) would witness
    a closer row — k rows beat r, contradiction. Exact re-rank of the
    k * EXACT_TILE_ROWS candidates finishes the job.
    """
    metric = DistanceMetric(metric_name)
    n = db.shape[0]
    q = queries.shape[0]
    dists = pairwise_distances(jnp, queries, db, metric,
                               db_sq_norms=db_sq_norms, db_norms=db_norms,
                               precision=MATMUL_PRECISION)
    dists = jnp.where(valid[None, :], dists, jnp.inf)
    t = n // EXACT_TILE_ROWS
    minima = dists.reshape(q, t, EXACT_TILE_ROWS).min(axis=-1)
    kt = min(k, t)
    _, tile_idx = jax.lax.top_k(-minima, kt)
    offs = jnp.arange(EXACT_TILE_ROWS, dtype=jnp.int32)
    cand = (tile_idx[:, :, None] * EXACT_TILE_ROWS
            + offs[None, None, :]).reshape(q, kt * EXACT_TILE_ROWS)
    return _exact_rerank(queries, db, db_sq_norms, db_norms, valid, cand,
                         metric, k)


def flat_search_exact_tiled(queries, db, db_sq_norms, db_norms, valid,
                            metric: DistanceMetric, k: int):
    """Exact search via fused tile-min + refine. Requires N to be a
    multiple of EXACT_TILE_ROWS (the packed index guarantees it)."""
    return _flat_search_exact_tiled_jit(queries, db, db_sq_norms, db_norms,
                                        valid, metric.value, int(k))


# Row-block size for the bf16-storage XLA scan: each block is widened to
# f32 on the fly, so the peak extra memory is block * d * 4 bytes.
_BF16_SCAN_BLOCK = 1 << 16


@functools.partial(jax.jit, static_argnames=("metric_name", "k"))
def _flat_search_bf16_jit(queries, db16, db_sq_norms, db_norms, valid,
                          metric_name, k):
    """Exact scan over a bf16-stored database (storage=\"bf16\"): widens
    one row block at a time (a wholesale .astype(f32) would double the
    database's HBM footprint), computes full-precision distances over the
    widened block, and keeps a running top-k across blocks. Exact with
    respect to the stored bf16 values."""
    metric = DistanceMetric(metric_name)
    n = db16.shape[0]
    q = queries.shape[0]
    b = min(_BF16_SCAN_BLOCK, n)
    kk = min(k, n)
    rem = n % b          # trained-IVF capacities ((nlist*t_c+s_t)*SUB)
    if rem:              # need not divide the block size: pad dead rows
        pad = b - rem
        db16 = jnp.concatenate(
            [db16, jnp.zeros((pad, db16.shape[1]), db16.dtype)])
        db_sq_norms = jnp.concatenate(
            [db_sq_norms, jnp.zeros((pad,), db_sq_norms.dtype)])
        db_norms = jnp.concatenate(
            [db_norms, jnp.zeros((pad,), db_norms.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        n += pad
    nb = n // b

    def scan_block(carry, blk):
        run_d, run_i = carry
        db_blk, sq_blk, nrm_blk, v_blk, base = blk
        dists = pairwise_distances(
            jnp, queries, db_blk.astype(jnp.float32), metric,
            db_sq_norms=sq_blk, db_norms=nrm_blk,
            precision=MATMUL_PRECISION)
        dists = jnp.where(v_blk[None, :], dists, jnp.inf)
        neg, idx = jax.lax.top_k(-dists, min(kk, b))
        all_d = jnp.concatenate([run_d, -neg], axis=1)
        all_i = jnp.concatenate([run_i, idx + base], axis=1)
        neg2, pos = jax.lax.top_k(-all_d, kk)
        return (-neg2, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (jnp.full((q, kk), jnp.inf, jnp.float32),
            jnp.zeros((q, kk), jnp.int32))
    blocks = (db16.reshape(nb, b, -1), db_sq_norms.reshape(nb, b),
              db_norms.reshape(nb, b), valid.reshape(nb, b),
              jnp.arange(nb, dtype=jnp.int32) * b)
    (dists, idx), _ = jax.lax.scan(scan_block, init, blocks)
    return dists, idx


def flat_search_bf16(queries, db16, db_sq_norms, db_norms, valid,
                     metric: DistanceMetric, k: int):
    """Blockwise exact scan for bf16-stored databases."""
    return _flat_search_bf16_jit(queries, db16, db_sq_norms, db_norms,
                                 valid, metric.value, int(k))


@functools.partial(jax.jit, static_argnames=("metric_name", "k"))
def _flat_search_int8_jit(queries, db8, scales, db_sq_norms, db_norms,
                          valid, metric_name, k):
    """Exact scan over an int8-stored database (storage=\"int8\"):
    dequantizes one row block at a time (code * pow2 row scale — exact
    in f32, see index/flat._int8_row_scales) and keeps a running top-k.
    Exact with respect to the stored values; peak extra memory is one
    widened block."""
    metric = DistanceMetric(metric_name)
    n = db8.shape[0]
    q = queries.shape[0]
    b = min(_BF16_SCAN_BLOCK, n)
    kk = min(k, n)
    rem = n % b
    if rem:
        pad = b - rem
        db8 = jnp.concatenate(
            [db8, jnp.zeros((pad, db8.shape[1]), db8.dtype)])
        scales = jnp.concatenate([scales, jnp.ones((pad,), scales.dtype)])
        db_sq_norms = jnp.concatenate(
            [db_sq_norms, jnp.zeros((pad,), db_sq_norms.dtype)])
        db_norms = jnp.concatenate(
            [db_norms, jnp.zeros((pad,), db_norms.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        n += pad
    nb = n // b

    def scan_block(carry, blk):
        run_d, run_i = carry
        db_blk, s_blk, sq_blk, nrm_blk, v_blk, base = blk
        rows = db_blk.astype(jnp.float32) * s_blk[:, None]
        dists = pairwise_distances(
            jnp, queries, rows, metric,
            db_sq_norms=sq_blk, db_norms=nrm_blk,
            precision=MATMUL_PRECISION)
        dists = jnp.where(v_blk[None, :], dists, jnp.inf)
        neg, idx = jax.lax.top_k(-dists, min(kk, b))
        all_d = jnp.concatenate([run_d, -neg], axis=1)
        all_i = jnp.concatenate([run_i, idx + base], axis=1)
        neg2, pos = jax.lax.top_k(-all_d, kk)
        return (-neg2, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (jnp.full((q, kk), jnp.inf, jnp.float32),
            jnp.zeros((q, kk), jnp.int32))
    blocks = (db8.reshape(nb, b, -1), scales.reshape(nb, b),
              db_sq_norms.reshape(nb, b), db_norms.reshape(nb, b),
              valid.reshape(nb, b), jnp.arange(nb, dtype=jnp.int32) * b)
    (dists, idx), _ = jax.lax.scan(scan_block, init, blocks)
    return dists, idx


def flat_search_int8(queries, db8, scales, db_sq_norms, db_norms, valid,
                     metric: DistanceMetric, k: int):
    """Blockwise exact scan for int8-stored databases."""
    return _flat_search_int8_jit(queries, db8, scales, db_sq_norms,
                                 db_norms, valid, metric.value, int(k))


class SearchHandle:
    """An in-flight batched search launched by flat_search_batched_submit.

    ``collect()`` blocks on the device result, runs the certified path's
    XLA fallback for any uncertified queries, and returns host numpy
    (dists, idx). Keeping two handles in flight pipelines D2H transfer +
    host post-processing of batch i under device compute of batch i+1
    (the ~25 ms relay round-trip per fetch is then fully hidden)."""

    __slots__ = ("_collect", "_done")

    def __init__(self, collect_fn):
        self._collect = collect_fn
        self._done = None

    def collect(self):
        if self._done is None:
            self._done = self._collect()
        return self._done


def flat_search_batched_submit(queries_np: np.ndarray, device_state: dict,
                               metric: DistanceMetric, k: int,
                               mode: str = "exact") -> SearchHandle:
    """Asynchronous entry point used by FlatIndex (and the pipelined
    benchmark): launches the device program and returns a SearchHandle
    without waiting for results.

    Pads Q up to a power of two and buckets k to bound jit recompiles;
    collect() returns host numpy (dists, idx) trimmed back to the true Q.
    Entries with dist == +inf are "missing" (fewer than k live rows).
    ``mode`` selects the full-precision scan ("exact") or the two-tier
    coarse+re-rank path ("fast").

    When the index maintains bf16 hi/lo mirrors ("hi"/"lo" in
    ``device_state``), both modes route through the fused Pallas coarse
    kernel (ops/coarse_kernel.py): "fast" as a single bf16 pass, "exact"
    as the certified bf16x3 pipeline with an automatic per-batch fallback
    to this module's full-precision scan for any uncertified query batch.
    """
    capacity = int(device_state["db"].shape[0])
    q = queries_np.shape[0]
    q_pad = next_pow2(q, floor=1)
    if q_pad != q:
        queries_np = np.concatenate(
            [queries_np, np.zeros((q_pad - q, queries_np.shape[1]),
                                  dtype=queries_np.dtype)], axis=0)
    k_eff = min(next_pow2(k, floor=1), capacity)
    queries_dev = jnp.asarray(queries_np)

    if device_state.get("int8_storage"):
        from . import coarse_kernel
        # tier 1: the int8-source 1-pass certified pipeline (codes cast
        # to bf16 exactly in VMEM, so the database-side residual is zero
        # — elo_max = 0). Serves both modes: it is already a single MXU
        # pass over the only stored precision. Uncertified rows re-run
        # through the blockwise dequantizing scan below.
        k_pallas = min(int(k), capacity)
        if ("elo_max" in device_state
                and coarse_kernel.supports_1p_int8(
                    capacity, queries_np.shape[1], k_pallas)
                and os.environ.get("VDB_TPU_EXACT1P", "1") != "0"):
            dists, idx, certified = coarse_kernel.coarse_search_1p(
                queries_dev, device_state["db"], device_state["sq_norms"],
                device_state["norms"], device_state["valid"], None,
                device_state["elo_max"], metric, k_pallas,
                scales=device_state["scales"])
            fb_state = {kk: vv for kk, vv in device_state.items()
                        if kk != "elo_max"}
            return SearchHandle(functools.partial(
                _collect_certified, dists, idx, certified, queries_np, q,
                fb_state, metric, k))

        # blockwise dequantizing scan: the exact fallback tier
        out8 = flat_search_int8(
            queries_dev, device_state["db"], device_state["scales"],
            device_state["sq_norms"], device_state["norms"],
            device_state["valid"], metric, k_eff)

        def collect_int8():
            d_, i_ = jax.device_get(out8)
            return d_[:q], i_[:q]
        return SearchHandle(collect_int8)

    if "hi" in device_state or device_state.get("coarse_f32"):
        from . import coarse_kernel
        # the pallas path takes k unbucketed (one compile per distinct k is
        # cheaper than the larger refine pool a pow2-bucketed k drags in)
        k_pallas = min(int(k), capacity)
        if coarse_kernel.supports(capacity, queries_np.shape[1], k_pallas):
            # bf16 storage: "fast" aliases the 1-pass certified path — it
            # is already a single MXU pass over the only stored precision,
            # and the mirrors-layout fast kernel would bill the db buffer
            # twice in the compiled program's arguments (24 GB at 8M)
            if device_state.get("bf16_storage"):
                mode = "exact"
            if mode == "fast":
                if (coarse_kernel.supports_1p(capacity,
                                              queries_np.shape[1],
                                              k_pallas)
                        and os.environ.get("VDB_TPU_FAST1P", "1") != "0"):
                    # fused tile+super minima kernel + hierarchical exact
                    # tile selection: faster than the legacy fast path's
                    # full-minima transpose + approx_min_k, and strictly
                    # better tile recall
                    dists, idx = coarse_kernel.coarse_search_1p_fast(
                        queries_dev, device_state["db"],
                        device_state["sq_norms"], device_state["norms"],
                        device_state["valid"], device_state.get("hi"),
                        metric, k_pallas)
                else:
                    dists, idx, _ = coarse_kernel.coarse_search(
                        queries_dev, device_state["db"],
                        device_state["sq_norms"], device_state["norms"],
                        device_state["valid"], device_state.get("hi"),
                        device_state.get("lo"), metric, k_pallas,
                        exact=False)

                def collect_fast():
                    d_, i_ = jax.device_get((dists, idx))
                    return d_[:q], i_[:q]
                return SearchHandle(collect_fast)

            if _use_exact1p(device_state, capacity, queries_np.shape[1],
                            k_pallas):
                # tier 1: single-pass certified pipeline; uncertified rows
                # re-run through the bf16x3 pipeline (same state minus
                # elo_max), which itself falls back to the XLA scan.
                # bf16 storage has no lo mirror (the db IS its own hi, so
                # tier 1 is already exact-over-stored with elo_max = 0);
                # its uncertified rows go straight to the blockwise bf16
                # XLA scan.
                dists, idx, certified = coarse_kernel.coarse_search_1p(
                    queries_dev, device_state["db"],
                    device_state["sq_norms"], device_state["norms"],
                    device_state["valid"], device_state.get("hi"),
                    device_state["elo_max"], metric, k_pallas)
                if device_state.get("bf16_storage"):
                    drop = ("hi", "lo", "elo_max", "coarse_f32",
                            "bf16_storage")
                else:
                    drop = ("elo_max",)
                fb_state = {kk: vv for kk, vv in device_state.items()
                            if kk not in drop}
                return SearchHandle(functools.partial(
                    _collect_certified, dists, idx, certified, queries_np,
                    q, fb_state, metric, k))

            if device_state.get("bf16_storage"):
                # bf16 storage has no lo mirror — the bf16x3 tier would
                # alias lo = hi and double-count the hi*qhi term (silently
                # wrong scores under a still-passing certificate; advisor
                # finding, round 1). Tier 1 IS bf16 storage's exact path;
                # when it's unavailable (env-disabled or unsupported
                # shape), the blockwise widening scan is the exact one.
                out16 = flat_search_bf16(
                    queries_dev, device_state["db"],
                    device_state["sq_norms"], device_state["norms"],
                    device_state["valid"], metric, k_eff)

                def collect_bf16():
                    d_, i_ = jax.device_get(out16)
                    return d_[:q], i_[:q]
                return SearchHandle(collect_bf16)

            # tier 2: bf16x3 certified pipeline; uncertified rows re-run
            # through the full-precision XLA scan (mirrors stripped)
            dists, idx, certified = coarse_kernel.coarse_search(
                queries_dev, device_state["db"], device_state["sq_norms"],
                device_state["norms"], device_state["valid"],
                device_state.get("hi"), device_state.get("lo"), metric,
                k_pallas, exact=True)
            fb_state = {kk: vv for kk, vv in device_state.items()
                        if kk not in ("hi", "lo", "elo_max", "coarse_f32")}
            return SearchHandle(functools.partial(
                _collect_certified, dists, idx, certified, queries_np, q,
                fb_state, metric, k))

    if device_state["db"].dtype == jnp.bfloat16:
        # bf16 storage without a usable pallas path: blockwise widening
        # scan, exact over the stored values (serves both modes)
        search_fn = flat_search_bf16
    elif mode == "fast":
        search_fn = flat_search_fast
    elif capacity % EXACT_TILE_ROWS == 0:
        # fused tile-min + refine: exact, skips the O(N) top_k
        search_fn = flat_search_exact_tiled
    else:
        search_fn = flat_search
    out = search_fn(
        queries_dev, device_state["db"], device_state["sq_norms"],
        device_state["norms"], device_state["valid"], metric, k_eff)

    def collect_xla():
        d_, i_ = jax.device_get(out)
        return d_[:q], i_[:q]
    return SearchHandle(collect_xla)


def flat_search_batched(queries_np: np.ndarray, device_state: dict,
                        metric: DistanceMetric, k: int,
                        mode: str = "exact"):
    """Synchronous wrapper over flat_search_batched_submit (see there)."""
    return flat_search_batched_submit(queries_np, device_state, metric, k,
                                      mode=mode).collect()


__all__ = ["flat_search", "flat_search_bf16", "flat_search_batched",
           "flat_search_batched_submit", "SearchHandle", "next_pow2"]
