"""Sharded flat scan with a distributed top-k merge.

The database's row axis is sharded across the mesh; queries are replicated
(or sharded over an optional batch axis). Each chip computes distances for
its row block with the same fused MXU kernel as the single-chip path and
reduces them to a local top-k; only (k distances, k global row ids) per
shard leave the chip. The merge is a tiny second top-k over the S*k
candidates — communication is O(S * Q * k), not O(Q * N).

This is the TPU-native equivalent of scaling the reference's single
``VectorStore`` (SURVEY §2 parallelism checklist: DP/TP over the database
row axis; collectives over ICI instead of a communication backend).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..distance import DistanceMetric, pairwise_distances
from ..errors import DimensionMismatchError
from ..ops.topk import MATMUL_PRECISION, next_pow2


def shard_rows(mesh: Mesh, row_axis: str, *arrays, block_multiple: int = 1):
    """Pad the leading (row) axis to a multiple of the shard count (and of
    ``block_multiple`` rows per shard) and device_put each array with rows
    sharded over ``row_axis``.

    Returns (padded_rows, sharded_arrays...). Boolean arrays pad with False
    (so padding rows never match), numeric arrays pad with zeros.
    ``block_multiple=512`` makes every shard block tile-divisible for the
    Pallas coarse kernel (any _tile_cols value divides 512).
    """
    n_shards = mesh.shape[row_axis]
    n = arrays[0].shape[0]
    per_shard = (n + n_shards - 1) // n_shards
    per_shard = ((per_shard + block_multiple - 1)
                 // block_multiple) * block_multiple
    padded = max(per_shard, block_multiple) * n_shards
    out = []
    for arr in arrays:
        if arr.shape[0] != n:
            raise ValueError("all arrays must share the row count")
        if padded != n:
            pad_shape = (padded - n,) + arr.shape[1:]
            filler = np.zeros(pad_shape, dtype=arr.dtype)
            arr = np.concatenate([np.asarray(arr), filler], axis=0)
        spec = P(row_axis, *([None] * (arr.ndim - 1)))
        out.append(jax.device_put(arr, NamedSharding(mesh, spec)))
    return padded, *out


def make_sharded_search(mesh: Mesh, metric: DistanceMetric, k: int,
                        block_rows: int, row_axis: str = "shard",
                        batch_axis: Optional[str] = None,
                        src: str = "f32"):
    """Build the jitted distributed search program for one mesh/shape.

    Returns fn(queries, db, sq_norms, norms, valid) -> (dists (Q,k), global
    row indices (Q,k)), ascending, +inf where fewer than k live rows.
    ``block_rows`` is the per-shard row count (padded_rows / n_row_shards).
    ``src="int8"``: ``db`` is the int8 code matrix and fn takes a trailing
    per-row pow2 ``scales`` vector (sharded like the rows); each shard
    dequantizes its block exactly (code x pow2 scale) before the fused
    scan, so distances stay exact over the stored values.
    """
    n_row_shards = mesh.shape[row_axis]
    k_local = min(k, block_rows)

    def local_scan(queries_blk, db_blk, sq_blk, norms_blk, valid_blk,
                   scales_blk=None):
        """Per-shard fused scan + local top-k. Shapes are per-block."""
        if scales_blk is not None:
            # int8 storage: dequantize the shard block exactly (integer
            # codes <= 127 times a pow2 scale carry no rounding). NOTE:
            # unless XLA fuses this into the matmul, the dequantize
            # materializes a transient f32 copy of the shard block (4x
            # the code footprint) — and the (Q, block_rows) distance
            # matrix below has the same full-materialization shape. This
            # XLA fallback therefore serves SMALL/odd shapes and CPU
            # tests only; the advertised 16M rows/chip (128M on a v5e-8)
            # capacity assumes the pow2 block shapes FlatIndex allocates,
            # which supports_1p_int8 gates into the streaming coarse
            # kernel (sharded_coarse_supported) instead of this path.
            db_blk = db_blk.astype(jnp.float32) * scales_blk[:, None]
        elif db_blk.dtype == jnp.bfloat16:
            # bf16 storage: widen per shard (XLA fuses the convert into
            # the matmul); distances are exact over the stored values
            db_blk = db_blk.astype(jnp.float32)
        dists = pairwise_distances(
            jnp, queries_blk, db_blk, metric,
            db_sq_norms=sq_blk, db_norms=norms_blk,
            precision=MATMUL_PRECISION)
        dists = jnp.where(valid_blk[None, :], dists, jnp.inf)
        neg_vals, idx = jax.lax.top_k(-dists, k_local)
        my_shard = jax.lax.axis_index(row_axis)
        global_idx = idx + my_shard * block_rows
        # leading singleton axis stacks into the global row-shard axis
        return -neg_vals[None], global_idx[None]

    q_spec = P(batch_axis, None) if batch_axis else P(None, None)
    in_specs = (q_spec, P(row_axis, None), P(row_axis,), P(row_axis,),
                P(row_axis,))
    if src == "int8":
        in_specs = in_specs + (P(row_axis,),)
    out_q = batch_axis if batch_axis else None
    out_specs = (P(row_axis, out_q, None), P(row_axis, out_q, None))

    mapped = jax.shard_map(local_scan, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs)

    @jax.jit
    def search(queries, db, sq_norms, norms, valid, *rest):
        # (S, Q, k_local) stacked per-shard candidates
        cand_vals, cand_idx = mapped(queries, db, sq_norms, norms, valid,
                                     *rest)
        s, q, kl = cand_vals.shape
        flat_vals = jnp.transpose(cand_vals, (1, 0, 2)).reshape(q, s * kl)
        flat_idx = jnp.transpose(cand_idx, (1, 0, 2)).reshape(q, s * kl)
        k_final = min(k, s * kl)
        neg_vals, pos = jax.lax.top_k(-flat_vals, k_final)
        return -neg_vals, jnp.take_along_axis(flat_idx, pos, axis=1)

    return search


def make_sharded_search_coarse(mesh: Mesh, metric: DistanceMetric, k: int,
                               block_rows: int, row_axis: str = "shard",
                               interpret: bool = False,
                               batch_axis: Optional[str] = None,
                               src: str = "f32"):
    """Sharded search through the 1-pass certified coarse kernel.

    Each shard runs the same certified pipeline as the single-chip path
    (ops/coarse_kernel.py; ``src="f32"``: no mirrors, hi/lo split in VMEM;
    ``src="bf16"``: the stored bf16 db is its own hi mirror, elo_max = 0)
    over its row block, with its own rigorous margin from its own row
    norms. Cross-shard exactness composes cleanly: the merged global k-th
    distance is <= every shard's local k-th, so if every shard certifies
    locally, no non-refined row anywhere can enter the top-k — the global
    certificate is just the AND of the shard certificates.

    With ``batch_axis``, queries are additionally sharded over that mesh
    axis and each (row, batch) tile runs the kernel on its query block.

    Returns fn(queries, db, sq, norms, valid, elo_max) ->
    (dists (Q,k), global idx (Q,k), certified (Q,)). Uncertified queries
    must be re-run by the caller through the XLA sharded scan.
    """
    from ..ops import coarse_kernel as ck

    k_local = min(k, block_rows)
    m2, m = ck._exact1p_pool(k_local, block_rows // ck.SUB)

    def local_coarse(queries_blk, db_blk, sq_blk, norms_blk, valid_blk,
                     elo_max, scales_blk=None):
        if src in ("bf16", "int8"):
            # placeholder hi arg; these src traces never touch it (bf16:
            # the db is its own hi mirror; int8: codes ARE the source)
            hi_blk = jnp.zeros((1, 1), jnp.bfloat16)
        else:
            hi_blk = db_blk
        d_, i_, c_ = ck._coarse_search_1p_jit(
            queries_blk, db_blk, sq_blk, norms_blk, valid_blk, hi_blk,
            elo_max, metric.value, k_local, m2, m, interpret, src,
            scales=scales_blk)
        my_shard = jax.lax.axis_index(row_axis)
        return d_[None], (i_ + my_shard * block_rows)[None], c_[None]

    q_spec = P(batch_axis, None) if batch_axis else P(None, None)
    out_q = batch_axis if batch_axis else None
    in_specs = (q_spec, P(row_axis, None), P(row_axis,),
                P(row_axis,), P(row_axis,), P())
    if src == "int8":
        in_specs = in_specs + (P(row_axis,),)
    out_specs = (P(row_axis, out_q, None), P(row_axis, out_q, None),
                 P(row_axis, out_q))
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the default vma checker rejects inside shard_map
    mapped = jax.shard_map(local_coarse, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)

    @jax.jit
    def search(queries, db, sq_norms, norms, valid, elo_max, *rest):
        cand_vals, cand_idx, cand_cert = mapped(queries, db, sq_norms,
                                                norms, valid, elo_max,
                                                *rest)
        s, q, kl = cand_vals.shape
        flat_vals = jnp.transpose(cand_vals, (1, 0, 2)).reshape(q, s * kl)
        flat_idx = jnp.transpose(cand_idx, (1, 0, 2)).reshape(q, s * kl)
        k_final = min(k, s * kl)
        neg_vals, pos = jax.lax.top_k(-flat_vals, k_final)
        certified = jnp.all(cand_cert, axis=0)
        return (-neg_vals, jnp.take_along_axis(flat_idx, pos, axis=1),
                certified)

    return search


def make_sharded_pq_scan(mesh: Mesh, metric: DistanceMetric, r: int,
                         chunk: int, block_rows: int,
                         row_axis: str = "shard",
                         recall_target: float = 0.85,
                         with_rot: bool = False):
    """Sharded streaming PQ scan: codes sharded over the mesh row axis,
    each shard runs the same decode-in-VMEM scan as the single-chip path
    (ops/pq.pq_scan_topr) over its block and emits its local top-r
    candidate rows; the merge is one exact top-r over the stacked S*r
    pool. Scores are rank-surrogates whose dropped per-query constants
    are IDENTICAL across shards (|q|^2 / |q| terms), so cross-shard
    comparison is sound; the index's exact host re-rank then fixes
    ordering and distances as usual.

    This is the capacity x multi-chip composition for the PQ family:
    device residency is m bytes/row per shard (v5e-8: 8x the one-chip
    row ceiling), communication is O(S * Q * r).

    Returns fn(queries, codes, bd, cnorm, valid[, rot]) ->
    (scores (Q, r) ascending, global slots (Q, r) int32).
    """
    from ..ops.pq import pq_scan_topr

    if block_rows % chunk:
        raise ValueError(f"block_rows {block_rows} not a multiple of "
                         f"chunk {chunk}")
    if r > chunk:
        # pq_scan_topr raises the same way; silently clamping here would
        # shrink the merged refine pool below the requested size (a
        # recall loss the caller never sees). _scan_r_max() keeps real
        # callers inside this envelope.
        raise ValueError(f"r={r} exceeds per-shard scan chunk {chunk}")
    r_local = r

    def local_scan(queries_blk, codes_blk, bd, cnorm, valid_blk, *rot):
        sv, sl = pq_scan_topr(queries_blk, codes_blk, bd, cnorm,
                              valid_blk, metric, r=r_local, chunk=chunk,
                              recall_target=recall_target,
                              rot=rot[0] if rot else None)
        my_shard = jax.lax.axis_index(row_axis)
        return sv[None], (sl + my_shard * block_rows)[None]

    in_specs = (P(None, None), P(row_axis, None), P(), P(), P(row_axis,))
    if with_rot:
        in_specs = in_specs + (P(),)
    out_specs = (P(row_axis, None, None), P(row_axis, None, None))
    mapped = jax.shard_map(local_scan, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)

    @jax.jit
    def scan(queries, codes, bd, cnorm, valid, *rot):
        sv, sl = mapped(queries, codes, bd, cnorm, valid, *rot)
        s, q, rl = sv.shape
        flat_v = jnp.transpose(sv, (1, 0, 2)).reshape(q, s * rl)
        flat_i = jnp.transpose(sl, (1, 0, 2)).reshape(q, s * rl)
        # exact pooled merge (same argument as pq_scan_topr's final
        # pass: per-shard blocks arrive sorted, approximate selection
        # would bucket-collide their heads)
        r_final = min(r, s * rl)
        neg, pos = jax.lax.top_k(-flat_v, r_final)
        return -neg, jnp.take_along_axis(flat_i, pos, axis=1)

    return scan


def sharded_coarse_supported(block_rows: int, d: int, k: int,
                             src: str = "f32") -> bool:
    from ..ops import coarse_kernel as ck
    if src == "int8":
        return ck.supports_1p_int8(block_rows, d, min(k, block_rows))
    return ck.supports_1p(block_rows, d, min(k, block_rows))


class DistributedFlatIndex:
    """A bulk-loaded, mesh-sharded exact index for large-scale serving.

    Covers the distributed slot in the architecture: load N vectors once
    (sharded over chips), then serve batched exact k-NN with the
    distributed top-k. Row ids are the caller's (position-based).
    """

    def __init__(self, mesh: Mesh, metric: DistanceMetric,
                 row_axis: str = "shard", batch_axis: Optional[str] = None,
                 storage: str = "f32"):
        if storage not in ("f32", "bf16", "int8"):
            raise ValueError(f"unknown storage: {storage!r}")
        self.mesh = mesh
        self.metric = metric
        self.row_axis = row_axis
        self.batch_axis = batch_axis
        # "bf16": rows are quantized to bfloat16 at load — half the HBM
        # per shard (double the rows per chip); search is certified-exact
        # over the STORED values (the db is its own hi mirror, elo_max=0).
        # "int8": per-row pow2-scaled codes at load — 1 byte/element, 4x
        # f32's rows per chip (8 x 16M = 128M rows of 768-d on a v5e-8);
        # search is certified-exact over the stored values (codes cast to
        # bf16 exactly in VMEM per shard, elo_max=0).
        self.storage = storage
        self._n = 0
        self._dim: Optional[int] = None
        self._block_rows = 0
        self._device = None
        self._scales = None
        self._elo_max = None
        self._search_cache = {}

    def load(self, vectors: np.ndarray) -> None:
        """Bulk-load N x d rows, sharding the row axis across the mesh."""
        vectors = np.asarray(vectors, dtype=np.float32)
        n, d = vectors.shape
        scales = None
        if self.storage == "bf16":
            import ml_dtypes
            vectors16 = vectors.astype(ml_dtypes.bfloat16)
            # norms see the stored (quantized) values
            stored = vectors16.astype(np.float32)
            sq = np.einsum("ij,ij->i", stored, stored).astype(np.float32)
            rows = vectors16
        elif self.storage == "int8":
            from ..index.flat import _int8_codes_scales, _quantize_int8
            stored = _quantize_int8(vectors)
            sq = np.einsum("ij,ij->i", stored, stored).astype(np.float32)
            rows, scales = _int8_codes_scales(stored)
        else:
            sq = np.einsum("ij,ij->i", vectors, vectors).astype(np.float32)
            rows = vectors
        norms = np.sqrt(sq)
        valid = np.ones(n, dtype=bool)
        arrays = (rows, sq, norms, valid)
        if scales is not None:
            arrays = arrays + (scales,)
        padded, db, sqs, nrm, vld, *rest = shard_rows(
            self.mesh, self.row_axis, *arrays,
            block_multiple=1024 if self._coarse_enabled() else 1)
        self._n, self._dim = n, d
        self._block_rows = padded // self.mesh.shape[self.row_axis]
        self._device = (db, sqs, nrm, vld)
        # shard_rows zero-pads the scales, and zero padding scales are
        # SAFE: scales are only ever multiplied into code values (never
        # divided — no NaN/inf), and padded slots carry valid=False plus
        # all-zero codes, so their distances are masked to +inf anyway
        self._scales = rest[0] if rest else None
        self._elo_max = None
        if self._coarse_enabled():
            if self.storage in ("bf16", "int8"):
                self._elo_max = jnp.float32(0.0)
            else:
                from ..ops.coarse_kernel import residual_max_norm_f32
                # global residual bound; every shard's margin uses its own
                # norms but shares this (stale-high-safe) residual max
                self._elo_max = residual_max_norm_f32(db)
        self._search_cache.clear()

    def _coarse_enabled(self) -> bool:
        from ..ops.coarse_kernel import interpret_mode
        if os.environ.get("VDB_TPU_NO_PALLAS"):
            return False
        return jax.default_backend() == "tpu" or interpret_mode()

    @property
    def num_rows(self) -> int:
        return self._n

    def _src(self) -> str:
        return self.storage if self.storage in ("bf16", "int8") else "f32"

    def _searcher(self, k: int):
        key = int(k)
        fn = self._search_cache.get(key)
        if fn is None:
            fn = make_sharded_search(
                self.mesh, self.metric, k, self._block_rows,
                self.row_axis, self.batch_axis,
                src="int8" if self.storage == "int8" else "f32")
            self._search_cache[key] = fn
        return fn

    def _coarse_searcher(self, k: int):
        key = ("coarse", int(k))
        fn = self._search_cache.get(key)
        if fn is None:
            from ..ops.coarse_kernel import interpret_mode
            fn = make_sharded_search_coarse(
                self.mesh, self.metric, int(k), self._block_rows,
                self.row_axis, interpret_mode(),
                batch_axis=self.batch_axis, src=self._src())
            self._search_cache[key] = fn
        return fn

    def search_batch(self, queries: np.ndarray,
                     k: int) -> List[List[Tuple[int, float]]]:
        """Exact k-NN for Q queries; returns (row_id, distance) ascending."""
        if self._device is None:
            return [[] for _ in range(len(queries))]
        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim != 2 or queries.shape[1] != self._dim:
            raise DimensionMismatchError(
                self._dim or 0,
                queries.shape[1] if queries.ndim == 2 else 0)
        # pad Q so a batch axis always divides evenly
        q = queries.shape[0]
        q_mult = self.mesh.shape[self.batch_axis] if self.batch_axis else 1
        q_pad = max(((q + q_mult - 1) // q_mult) * q_mult, q_mult)
        if q_pad != q:
            queries = np.concatenate(
                [queries, np.zeros((q_pad - q, self._dim), np.float32)])

        k_true = min(int(k), max(self._n, 1))
        use_coarse = (self._elo_max is not None
                      # pow2 batch-shard counts keep the pow2-padded Q
                      # evenly divisible over the batch axis
                      and (q_mult & (q_mult - 1)) == 0
                      and sharded_coarse_supported(self._block_rows,
                                                   self._dim, k_true,
                                                   self._src()))
        if use_coarse:
            # pow2-pad Q: bounds the jit-signature count AND keeps the
            # refine chunking on even splits (same policy as the
            # single-chip dispatcher in ops/topk.py). A batch axis keeps
            # dividing evenly: pow2 Q over a pow2 (or equal) shard count.
            qc = queries.shape[0]
            qc_pad = next_pow2(qc, floor=1)
            cq = queries
            if qc_pad != qc:
                cq = np.concatenate(
                    [queries, np.zeros((qc_pad - qc, self._dim),
                                       np.float32)])
            extra = (self._scales,) if self._scales is not None else ()
            dists, idx, cert = self._coarse_searcher(k_true)(
                jnp.asarray(cq), *self._device, self._elo_max, *extra)
            dists, idx, cert = (np.asarray(dists)[:q], np.asarray(idx)[:q],
                                np.asarray(cert)[:q])
            bad = np.nonzero(~cert)[0]
            if bad.size:
                # rare: re-run uncertified queries through the XLA scan
                sub_d, sub_i = self._search_xla(
                    np.ascontiguousarray(queries[bad]), k_true)
                dists = dists.copy(); idx = idx.copy()
                dists[bad] = sub_d[:, : dists.shape[1]]
                idx[bad] = sub_i[:, : idx.shape[1]]
        else:
            dists, idx = self._search_xla(queries, k_true)
            dists, idx = dists[:q], idx[:q]

        out: List[List[Tuple[int, float]]] = []
        for qi in range(min(q, dists.shape[0])):
            row = []
            for j in range(dists.shape[1]):
                d = float(dists[qi, j])
                if not np.isfinite(d) or len(row) >= k:
                    break
                row.append((int(idx[qi, j]), d))
            out.append(row)
        return out

    def _search_xla(self, queries: np.ndarray, k: int):
        k_eff = min(next_pow2(k), max(self._n, 1))
        # a batch axis requires Q divisible by its shard count — pad here
        # so callers (e.g. the uncertified-query fallback, whose batch is
        # an arbitrary subset) never trip shard_map's divisibility check
        q = queries.shape[0]
        q_mult = self.mesh.shape[self.batch_axis] if self.batch_axis else 1
        q_pad = max(((q + q_mult - 1) // q_mult) * q_mult, q_mult)
        if q_pad != q:
            queries = np.concatenate(
                [queries, np.zeros((q_pad - q, self._dim), np.float32)])
        extra = (self._scales,) if self._scales is not None else ()
        dists, idx = self._searcher(k_eff)(jnp.asarray(queries),
                                           *self._device, *extra)
        return np.asarray(dists)[:q], np.asarray(idx)[:q]


__all__ = ["shard_rows", "make_sharded_search", "make_sharded_search_coarse",
           "make_sharded_pq_scan", "DistributedFlatIndex"]
