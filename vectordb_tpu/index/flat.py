"""Exact brute-force k-NN over a packed device matrix.

Capability parity with reference src/flat_index.rs:12-74 (add/remove/search/
get_vector/len/iter), redesigned TPU-first:

  * rows live in a packed ``f32[capacity, d]`` host matrix mirrored to HBM,
    with a ``bool[capacity]`` validity mask and precomputed row norms —
    not a HashMap of boxed vectors;
  * search is one fused XLA program (MXU matmul + masked top-k, see
    ops/topk.py) instead of a per-row scalar loop + full sort;
  * insert/delete patch the device mirror in place with donated scatter
    updates; capacity grows by powers of two (amortized recompilation);
  * ``search_masked`` applies a precompiled metadata mask *before* top-k,
    making filtered search exact (reference over-fetches 3x and
    post-filters, src/storage.rs:268-287).
"""

from __future__ import annotations

import math
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..distance import DistanceMetric, validate_cosine_operands
from ..errors import DimensionMismatchError, InvalidVectorError
from ..ops.topk import flat_search_batched_submit, next_pow2
from ..utils.profiling import annotate
from ..ops.update import (scatter_rows, scatter_rows_copy, scatter_values,
                          scatter_values_copy)
from ..vector import Vector, as_f32_array
from .base import Index

_MIN_CAPACITY = 1024
# If more than this fraction of slots is dirty, re-upload wholesale instead
# of scattering.
_FULL_SYNC_FRACTION = 8
# Above this device footprint (f32 db + bf16 hi/lo mirrors = 8 bytes/elem),
# skip the pallas mirrors and stay on the pure-XLA scan.
_PALLAS_MEM_LIMIT = int(
    __import__("os").environ.get("VDB_TPU_PALLAS_MEM_LIMIT", 12 * 10 ** 9))


def _pallas_enabled(mesh) -> bool:
    """Is the fused coarse kernel usable at all? On by default on TPU
    backends (and on CPU when the interpret-mode test flag is set);
    VDB_TPU_NO_PALLAS=1 opts out. Sharded stores run the same certified
    kernel per shard under shard_map (parallel/distributed.py)."""
    import os

    import jax

    if os.environ.get("VDB_TPU_NO_PALLAS"):
        return False
    from ..ops import coarse_kernel
    if coarse_kernel.interpret_mode():
        return True
    return jax.default_backend() == "tpu"


def _quantize_bf16(arr: np.ndarray) -> np.ndarray:
    """Round-trip f32 -> bf16 -> f32 (the stored value set for
    storage=\"bf16\")."""
    import ml_dtypes
    return arr.astype(ml_dtypes.bfloat16).astype(np.float32)


def _int8_row_scales(mat: np.ndarray) -> np.ndarray:
    """Per-row POWER-OF-TWO int8 scale: s = 2^ceil(log2(max|row|/127)).

    A pow2 scale makes the whole scheme exact in f32 arithmetic:
    code * s is exact (|code| <= 127 integer times a power of two), so
    quantization is idempotent, and the scale is recoverable from a
    stored row (max|code| lands in (63.5, 127], so max|stored|/127 is
    in (s/2, s] and ceils back to exactly s) — no side table."""
    mx = np.abs(mat).max(axis=1)
    mx = np.where(mx > 0.0, mx, np.float32(127.0))  # zero rows -> s = 1
    return np.exp2(np.ceil(np.log2(mx / np.float32(127.0)))
                   ).astype(np.float32)


_QUANT_CHUNK = 1 << 20   # rows per chunk: bounds f32 temps to ~3 GB @ 768-d


def _quantize_int8(arr: np.ndarray) -> np.ndarray:
    """Round-trip a row/matrix through per-row pow2-scaled int8 (the
    stored value set for storage=\"int8\"). Chunked over rows so the
    f32 temporaries stay bounded at multi-million-row scale (a whole-
    matrix round trip at 16M x 768 would allocate 2x 48 GB)."""
    squeeze = arr.ndim == 1
    mat = np.atleast_2d(np.asarray(arr, dtype=np.float32))
    out = np.empty_like(mat)
    for lo in range(0, mat.shape[0], _QUANT_CHUNK):
        blk = mat[lo:lo + _QUANT_CHUNK]
        s = _int8_row_scales(blk)
        out[lo:lo + _QUANT_CHUNK] = np.round(blk / s[:, None]) * s[:, None]
    return out[0] if squeeze else out


def _int8_codes_scales(rows: np.ndarray):
    """(int8 codes, f32 pow2 scales) recovered exactly from stored rows.
    Chunked for the same temp-bounding reason as _quantize_int8."""
    n = rows.shape[0]
    codes = np.empty(rows.shape, np.int8)
    scales = np.empty(n, np.float32)
    for lo in range(0, n, _QUANT_CHUNK):
        blk = rows[lo:lo + _QUANT_CHUNK]
        s = _int8_row_scales(blk)
        codes[lo:lo + _QUANT_CHUNK] = np.round(blk / s[:, None])
        scales[lo:lo + _QUANT_CHUNK] = s
    return codes, scales


def _pallas_mirrors_enabled(capacity: int, dim: int, mesh) -> bool:
    """Maintain bf16 hi/lo mirrors (fastest path, +4 bytes/element)? Above
    the memory gate the kernel streams the f32 database instead (the
    coarse_f32 flag — zero extra HBM, in-VMEM hi/lo split)."""
    if not _pallas_enabled(mesh):
        return False
    return capacity * dim * 8 <= _PALLAS_MEM_LIMIT


class SearchBatchHandle:
    """An in-flight index-level batched search (search_batch_submit).

    ``collect()`` blocks on the device result, maps slots to internal ids,
    and releases the index's in-flight mark — exactly once, even if called
    repeatedly or if the device program failed. An abandoned handle
    releases the mark from ``__del__`` so writes don't stay pinned to the
    copy-scatter path forever."""

    __slots__ = ("_fn", "_on_done", "_result", "_has_result")

    def __init__(self, fn, on_done=None):
        self._fn = fn
        self._on_done = on_done
        self._has_result = False
        self._result = None

    @classmethod
    def ready(cls, result) -> "SearchBatchHandle":
        handle = cls(None)
        handle._result = result
        handle._has_result = True
        return handle

    def collect(self):
        if not self._has_result:
            try:
                self._result = self._fn()
                self._has_result = True
            finally:
                self._release()
        return self._result

    def _release(self):
        done, self._on_done = self._on_done, None
        if done is not None:
            done()

    def __del__(self):
        try:
            self._release()
        except Exception:
            pass


def _slots_to_ids(dists, idx, id_of_slot, k_req: int, nq: int
                  ) -> List[List[Tuple[int, float]]]:
    """Map (Q, k) device slot results to per-query [(internal_id, dist)]
    rows, trimming the +inf masked/invalid tail."""
    out: List[List[Tuple[int, float]]] = []
    for qi in range(nq):
        row: List[Tuple[int, float]] = []
        for j in range(dists.shape[1]):
            dist = float(dists[qi, j])
            if math.isinf(dist):
                break  # masked/invalid tail
            if len(row) == k_req:
                break
            row.append((int(id_of_slot[int(idx[qi, j])]), dist))
        out.append(row)
    return out


class FlatIndex(Index):
    """Exact k-NN via fused device flat scan."""

    def __init__(self, metric: DistanceMetric, search_mode: str = "exact",
                 mesh=None, row_axis: str = "shard",
                 storage: str = "f32",
                 host_backing: "Optional[str]" = None):
        if search_mode not in ("exact", "fast"):
            raise ValueError(f"unknown search_mode: {search_mode!r}")
        if storage not in ("f32", "bf16", "int8"):
            raise ValueError(f"unknown storage: {storage!r}")
        # "exact": full-f32 MXU scan + exact top_k. "fast": same scan
        # reduced with approx_min_k into a candidate pool + exact re-rank
        # (~1.4x throughput, exact distances, ~99% top-k id agreement).
        self.search_mode = search_mode
        # storage="bf16": vectors are quantized to bfloat16 AT INSERT
        # (get_vector returns the quantized values) and the device holds a
        # single 2-byte/element buffer — double the rows per chip (8M x
        # 768-d on one 16 GB v5e). Search stays certified-exact with
        # respect to the STORED values: the db is its own hi mirror, so
        # the 1-pass certificate runs with elo_max = 0.
        # storage="int8": per-row pow2-scaled int8 AT INSERT — a 1-byte
        # device buffer, 4x f32's rows per chip (16M x 768-d on one v5e).
        # Search runs the int8-source 1-pass certified coarse kernel
        # (codes cast to bf16 exactly in VMEM -> zero db-side residual,
        # elo_max = 0), exact over the stored values; uncertified rows
        # and unsupported shapes take the blockwise dequantizing scan.
        self.storage = storage
        # Host rows live in the STORAGE dtype for bf16 (r5, the 10M
        # recovery lever): the packed capacity array halves (25.8 GB vs
        # 51.5 GB at 16.7M x 768) and device hydration puts the rows
        # directly instead of casting a tens-of-GB f32 array first.
        # Values are identical — bf16 storage always held exactly the
        # bf16-representable value set; only the container narrows.
        # int8 keeps f32 host rows (codes + scales are derived per sync);
        # subclasses that train/repack on f32 host rows (IVF) reset this.
        if storage == "bf16":
            import ml_dtypes
            self._host_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            self._host_dtype = np.dtype(np.float32)
        # With a jax.sharding.Mesh, the packed arrays live sharded over the
        # mesh's row axis and searches run the distributed per-shard scan +
        # top-k merge (parallel/distributed.py). CRUD semantics unchanged.
        self._mesh = mesh
        self._row_axis = row_axis
        self._sharded_search_cache: dict = {}
        # host_backing: a directory; the packed f32 row matrix lives in a
        # disk-backed np.memmap there instead of RAM. Rows beyond host
        # memory become possible (the OS page cache keeps the hot set);
        # device-side limits per index type are unchanged — the natural
        # pairing is PqFlatIndex, whose device footprint is m bytes/row
        # (32M x 768 = a 98 GB row file + 3 GB of device codes).
        self._host_backing = host_backing
        self._vectors_path: Optional[str] = None
        self._backing_uid: Optional[str] = None
        self._metric = metric
        self._dim: Optional[int] = None
        self._capacity = 0
        self._len = 0
        # host-side packed storage (source of truth)
        self._vectors: Optional[np.ndarray] = None   # host_dtype[capacity, d]
        self._valid: Optional[np.ndarray] = None     # bool[capacity]
        self._sq_norms: Optional[np.ndarray] = None  # f32[capacity]
        self._norms: Optional[np.ndarray] = None     # f32[capacity]
        self._id_of_slot: Optional[np.ndarray] = None  # int64[capacity], -1 free
        self._slot_of_id: dict[int, int] = {}
        self._free_slots: list[int] = []
        self._zero_norm_live = 0  # live rows with zero norm (cosine validation)
        # subclasses that never use the coarse kernel (e.g. IVF) set this
        # False so sync skips the bf16 mirrors / residual bound
        self._want_mirrors = True
        # device mirror + dirty tracking
        self._device: Optional[dict] = None
        self._dirty_slots: set[int] = set()
        # True while an UNLOCKED mirror build is reading the host arrays
        # (prehydrate): mutations in that window must be tracked even
        # though no mirror is installed yet, so the first locked sync
        # re-scatters them. When False and no mirror exists, mutation
        # paths skip dirty bookkeeping entirely — the next sync rebuilds
        # in full anyway, and a 10M-row recovery otherwise builds a
        # 10M-entry Python set for nothing (measured minutes of the 10M
        # reopen apply phase).
        self._build_inflight = False
        self._lock = threading.RLock()
        # readers that copied the device dict and released the lock; while
        # any are in flight, syncs must not donate (see _sync_device)
        self._searches_in_flight = 0

    # -- basic properties ---------------------------------------------------

    @property
    def metric(self) -> DistanceMetric:
        return self._metric

    @property
    def dimension(self) -> Optional[int]:
        return self._dim

    @property
    def capacity(self) -> int:
        return self._capacity

    def __len__(self) -> int:
        return self._len

    def slot_of(self, internal_id: int) -> Optional[int]:
        return self._slot_of_id.get(internal_id)

    def _quantize(self, arr: np.ndarray) -> np.ndarray:
        """Apply the storage mode's insert-time quantization (identity
        for f32)."""
        if self.storage == "bf16":
            return _quantize_bf16(arr)
        if self.storage == "int8":
            return _quantize_int8(arr)
        return arr

    # -- storage management -------------------------------------------------

    def _ensure_storage(self, dim: int, want_rows: int) -> None:
        """Allocate or grow packed storage to hold ``want_rows`` live rows."""
        if self._dim is None:
            self._dim = dim
        needed = max(want_rows, _MIN_CAPACITY)
        if self._capacity >= needed:
            return
        new_cap = next_pow2(needed, floor=_MIN_CAPACITY)
        if self._mesh is not None:
            # pow2 rows PER SHARD (>= 1024): every shard block is tile-
            # and super-tile-divisible for the per-shard coarse kernel
            n_shards = self._mesh.shape[self._row_axis]
            per_shard = next_pow2((needed + n_shards - 1) // n_shards,
                                  floor=_MIN_CAPACITY)
            new_cap = per_shard * n_shards
        old_path = self._vectors_path
        new_vectors = self._alloc_rows(new_cap, self._dim)
        new_valid = np.zeros(new_cap, dtype=bool)
        new_sq = np.zeros(new_cap, dtype=np.float32)
        new_norms = np.zeros(new_cap, dtype=np.float32)
        new_ids = np.full(new_cap, -1, dtype=np.int64)
        if self._capacity:
            if self._host_backing is not None:
                # chunked copy bounds dirty page-cache pressure at the
                # tens-of-GB scale this mode exists for
                for lo in range(0, self._capacity, 1 << 20):
                    hi = min(lo + (1 << 20), self._capacity)
                    new_vectors[lo:hi] = self._vectors[lo:hi]
            else:
                new_vectors[: self._capacity] = self._vectors
            new_valid[: self._capacity] = self._valid
            new_sq[: self._capacity] = self._sq_norms
            new_norms[: self._capacity] = self._norms
            new_ids[: self._capacity] = self._id_of_slot
        self._free_slots.extend(range(new_cap - 1, self._capacity - 1, -1))
        self._vectors, self._valid = new_vectors, new_valid
        self._sq_norms, self._norms, self._id_of_slot = new_sq, new_norms, new_ids
        self._capacity = new_cap
        self._device = None  # full re-upload on next search
        self._dirty_slots.clear()
        if old_path is not None and old_path != self._vectors_path:
            import os
            try:
                os.remove(old_path)
            except OSError:
                pass

    def _alloc_rows(self, rows: int, dim: int) -> np.ndarray:
        """Packed row matrix: RAM by default; a zero-initialized
        disk-backed memmap under ``host_backing`` when set.

        The filename carries a per-instance token: a deterministic
        ``rows_{rows}x{dim}.f32`` name would let two indexes sharing a
        backing directory truncate (mode="w+") each other's live row
        file. Files from crashed processes are NOT reaped automatically
        — the directory may be shared by another live index."""
        if self._host_backing is None:
            return np.zeros((rows, dim), dtype=self._host_dtype)
        import os
        if self._backing_uid is None:
            import uuid
            self._backing_uid = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
        os.makedirs(self._host_backing, exist_ok=True)
        ext = "f32" if self._host_dtype == np.float32 else "bf16"
        path = os.path.join(self._host_backing,
                            f"rows_{self._backing_uid}_{rows}x{dim}.{ext}")
        mm = np.memmap(path, dtype=self._host_dtype, mode="w+",
                       shape=(rows, dim))
        self._vectors_path = path
        return mm

    def _take_slot(self) -> int:
        if not self._free_slots:
            self._ensure_storage(self._dim, self._capacity * 2 if self._capacity else 1)
        return self._free_slots.pop()

    # -- mutation -----------------------------------------------------------

    def add(self, internal_id: int, vector: Vector) -> None:
        with self._lock:
            arr = as_f32_array(vector)
            dim = arr.shape[0]
            if self._dim is not None and dim != self._dim:
                raise DimensionMismatchError(self._dim, dim)
            self._ensure_storage(dim, self._len + 1)
            old_slot = self._slot_of_id.get(internal_id)
            if old_slot is not None:
                self._clear_slot(old_slot)
            slot = self._take_slot()
            self._write_slot(slot, internal_id, arr)

    def add_batch(self, items: Sequence[Tuple[int, "Vector | np.ndarray"]]) -> None:
        """Amortized bulk add: one host pass, one device sync on next search."""
        with self._lock:
            if not items:
                return
            first = as_f32_array(items[0][1])
            dim = first.shape[0]
            if self._dim is not None and dim != self._dim:
                raise DimensionMismatchError(self._dim, dim)
            self._ensure_storage(dim, self._len + len(items))
            ids = np.fromiter((int(i) for i, _ in items), dtype=np.int64,
                              count=len(items))
            distinct = np.unique(ids).size == len(items)
            if self._len == 0 and not self._slot_of_id and distinct:
                self._bulk_load_fresh(ids, items, dim)
                return
            if distinct and not any(int(i) in self._slot_of_id
                                    for i in ids):
                # vectorized APPEND: fresh distinct ids into a live index
                # (the per-row _write_slot path costs ~0.3 ms/row of host
                # Python — hours at 10^7-row ingest)
                self._bulk_append_fresh(ids, items, dim)
                return
            for internal_id, vector in items:
                arr = as_f32_array(vector)
                if arr.shape[0] != self._dim:
                    raise DimensionMismatchError(self._dim, arr.shape[0])
                old_slot = self._slot_of_id.get(internal_id)
                if old_slot is not None:
                    self._clear_slot(old_slot)
                slot = self._take_slot()
                self._write_slot(slot, internal_id, arr)

    def _bulk_append_fresh(self, ids: np.ndarray, items, dim: int) -> None:
        """Vectorized append of fresh distinct ids (lock held, storage
        pre-sized). Keeps reference add_batch semantics: on a dimension
        mismatch the accepted PREFIX is applied before the error surfaces
        (storage.rs:293-298)."""
        n = len(items)
        mat = np.empty((n, dim), dtype=np.float32)
        error = None
        for j, (_, vector) in enumerate(items):
            row = as_f32_array(vector)
            if row.shape[0] != dim:
                error = DimensionMismatchError(dim, row.shape[0])
                n = j
                mat = mat[:n]
                ids = ids[:n]
                break
            mat[j] = row
        if n:
            self._append_matrix_locked(ids, mat)
        if error is not None:
            raise error

    def _append_matrix_locked(self, ids: np.ndarray, mat: np.ndarray,
                              quantized: bool = False) -> None:
        """Append a validated (n, d) f32 matrix of fresh distinct ids
        (lock held, storage pre-sized). The one place append paths touch
        packed storage — subclasses hook here to stamp their per-slot
        state (e.g. PQ mutation ticks). ``quantized``: the rows already
        carry this index's storage quantization (snapshot replay feeds
        back the STORED values), so the idempotent re-quantize — two
        dtype conversions over the whole payload for bf16 — is
        skipped."""
        n = len(ids)
        slots = np.fromiter((self._take_slot() for _ in range(n)),
                            dtype=np.int64, count=n)
        try:
            if not quantized:
                mat = self._quantize(mat)
            self._vectors[slots] = mat
            sq = np.einsum("ij,ij->i", mat, mat).astype(np.float32)
            self._sq_norms[slots] = sq
            self._norms[slots] = np.sqrt(sq)
            self._valid[slots] = True
            self._id_of_slot[slots] = ids
            self._slot_of_id.update(
                zip(ids.tolist(), slots.tolist()))
            self._len += n
            self._zero_norm_live += int((sq == 0.0).sum())
        finally:
            # even on a partial failure, every possibly-touched slot is
            # recorded (stale-dirty is safe; missed-dirty is not)
            if self._device is not None or self._build_inflight:
                self._dirty_slots.update(slots.tolist())
            self._note_appended(slots)

    def _note_appended(self, slots: np.ndarray) -> None:
        """Subclass seam: called (lock held) with the slot array every
        append path just touched — PQ stamps per-slot mutation ticks
        here. Kept separate from ``_dirty_slots`` (device-mirror
        bookkeeping, skipped when no mirror exists)."""

    def reserve(self, n_rows: int, dim: Optional[int] = None) -> None:
        """Pre-size packed storage for ``n_rows`` live rows. The
        recovery fast path calls this with the snapshot's row count
        before the chunked apply: growing chunk-by-chunk instead costs
        ~log2(n/chunk) pow2 doublings, each copying (and zero-filling)
        the whole packed array — tens of GB of memcpy at 10M x 768.
        No-op if the capacity already suffices or the dimension is
        still unknown."""
        with self._lock:
            d = dim if dim is not None else self._dim
            if d is None:
                return
            if self._dim is not None and d != self._dim:
                raise DimensionMismatchError(self._dim, d)
            if n_rows <= self._capacity:
                return
            self._ensure_storage(int(d), int(n_rows))

    def bulk_append_matrix(self, ids: np.ndarray, mat: np.ndarray,
                            quantized: bool = False) -> None:
        """Vectorized append of fresh distinct int64 ids from a validated
        (n, d) f32 matrix into a possibly NON-empty index — the recovery
        fast path (bulk_load_matrix requires an empty index). No per-row
        Python objects: snapshot replay through per-row
        Vector/BatchInsertItem objects costs ~20-50 us/row of pure
        Python, which is most of a 10M-row reopen on a single-core host
        (reference recovery contract src/persistence/engine.rs:44-73 at
        10,000x its scale). ``quantized``: see _append_matrix_locked —
        ONLY for rows that round-tripped through this index's storage
        mode (snapshot replay); raw user rows must quantize."""
        with self._lock:
            mat = np.ascontiguousarray(mat, dtype=np.float32)
            ids = np.ascontiguousarray(ids, dtype=np.int64)
            if mat.ndim != 2:
                raise ValueError("mat must be a (n, d) matrix")
            n, dim = mat.shape
            if ids.shape[0] != n:
                raise ValueError("ids/matrix length mismatch")
            if n == 0:
                return
            if np.unique(ids).size != n:
                raise ValueError("duplicate ids in bulk_append_matrix")
            if self._dim is not None and dim != self._dim:
                raise DimensionMismatchError(self._dim, dim)
            if self._slot_of_id and any(
                    map(self._slot_of_id.__contains__, ids.tolist())):
                raise ValueError(
                    "bulk_append_matrix ids must be fresh (use add_batch "
                    "for upserts)")
            self._ensure_storage(dim, self._len + n)
            self._append_matrix_locked(ids, mat)

    def _bulk_load_fresh(self, ids: np.ndarray, items, dim: int) -> None:
        """Vectorized first-load: an empty index ingesting n distinct IDs
        fills slots 0..n-1 with array slices instead of n Python-level
        _write_slot calls (the per-row path costs minutes at 10^6 rows on
        a single-core host; this is ~100x faster). Called with the lock
        held, after _ensure_storage."""
        n = len(items)
        mat = np.empty((n, dim), dtype=np.float32)
        error = None
        for j, (_, vector) in enumerate(items):
            row = as_f32_array(vector)
            if row.shape[0] != dim:
                # reference add_batch semantics: the accepted PREFIX is
                # applied before the error surfaces (storage.rs:293-298)
                error = DimensionMismatchError(dim, row.shape[0])
                n = j
                mat = mat[:n]
                ids = ids[:n]
                break
            mat[j] = row
        if n == 0 and error is not None:
            raise error
        mat = self._quantize(mat)
        self._vectors[:n] = mat
        sq = np.einsum("ij,ij->i", mat, mat).astype(np.float32)
        self._sq_norms[:n] = sq
        self._norms[:n] = np.sqrt(sq)
        self._valid[:n] = True
        self._id_of_slot[:n] = ids
        self._slot_of_id = {int(ids[j]): j for j in range(n)}
        self._free_slots = [s for s in self._free_slots if s >= n]
        self._len = n
        self._zero_norm_live = int((sq == 0.0).sum())
        self._device = None
        self._dirty_slots.clear()
        if error is not None:
            raise error

    def bulk_load_matrix(self, ids: np.ndarray, mat: np.ndarray) -> None:
        """Vectorized fresh load of a validated (n, d) f32 matrix with
        distinct int64 ids — no per-row conversion loop (the device HNSW
        builder feeds half-million-row matrices; the per-item add_batch
        path costs ~100 µs/row of Python on this host). Requires an
        empty index."""
        with self._lock:
            if self._len or self._slot_of_id:
                raise ValueError("bulk_load_matrix requires an empty index")
            mat = np.ascontiguousarray(mat, dtype=np.float32)
            ids = np.ascontiguousarray(ids, dtype=np.int64)
            n, dim = mat.shape
            if ids.shape[0] != n:
                raise ValueError("ids/matrix length mismatch")
            if np.unique(ids).size != n:
                # duplicates would desync _len from _slot_of_id, leaving
                # an unremovable ghost slot (every sibling bulk path checks)
                raise ValueError("duplicate ids in bulk_load_matrix")
            if self._dim is not None and dim != self._dim:
                raise DimensionMismatchError(self._dim, dim)
            self._ensure_storage(dim, n)
            # quantize CHUNK-WISE straight into the packed storage: a
            # whole-matrix `self._quantize(mat)` materializes a second
            # (n, d) f32 (48 GB at 16M x 768) on top of the caller's
            # matrix and the storage itself. Norms come from the f32
            # quantized chunk (identical values; the packed array may be
            # bf16, where einsum would be wrong-dtype arithmetic).
            for lo in range(0, n, _QUANT_CHUNK):
                sub = self._quantize(mat[lo:lo + _QUANT_CHUNK])
                self._vectors[lo:lo + len(sub)] = sub
                ssq = np.einsum("ij,ij->i", sub, sub).astype(np.float32)
                self._sq_norms[lo:lo + len(sub)] = ssq
                self._norms[lo:lo + len(sub)] = np.sqrt(ssq)
            sq = self._sq_norms[:n]
            self._valid[:n] = True
            self._id_of_slot[:n] = ids
            self._slot_of_id = {int(ids[j]): j for j in range(n)}
            self._free_slots = [s for s in self._free_slots if s >= n]
            self._len = n
            self._zero_norm_live = int((sq == 0.0).sum())
            self._device = None
            self._dirty_slots.clear()

    def bulk_load_stream(self, n: int, dim: int, chunks) -> None:
        """Fresh bulk load from an ITERATOR of (c, d) f32 row chunks
        totaling exactly ``n`` rows, with ids 0..n-1. The beyond-RAM
        ingest path: chunks are written straight into the packed storage
        (which under ``host_backing`` is a disk memmap), so no second
        n x d matrix ever exists — ``bulk_load_matrix`` requires the
        caller to materialize one, which at 32M x 768 is 98 GB.
        Requires an empty index."""
        with self._lock:
            if self._len or self._slot_of_id:
                raise ValueError("bulk_load_stream requires an empty index")
            if n < 1:
                raise ValueError("n must be >= 1")
            if self._dim is not None and dim != self._dim:
                # an emptied index keeps its dimension; fail with the
                # typed error up front (bulk_load_matrix parity) instead
                # of a mid-ingest numpy broadcast error
                raise DimensionMismatchError(self._dim, dim)
            self._ensure_storage(dim, n)
            pos = 0
            for blk in chunks:
                blk = np.ascontiguousarray(blk, dtype=np.float32)
                if blk.ndim != 2 or blk.shape[1] != dim:
                    raise DimensionMismatchError(
                        dim, blk.shape[-1] if blk.ndim else 0)
                if pos + len(blk) > n:
                    raise ValueError("chunks exceed declared row count")
                for lo in range(0, len(blk), _QUANT_CHUNK):
                    sub = self._quantize(blk[lo:lo + _QUANT_CHUNK])
                    self._vectors[pos + lo:pos + lo + len(sub)] = sub
                    sq = np.einsum("ij,ij->i", sub, sub).astype(np.float32)
                    self._sq_norms[pos + lo:pos + lo + len(sub)] = sq
                    self._norms[pos + lo:pos + lo + len(sub)] = np.sqrt(sq)
                pos += len(blk)
            if pos != n:
                raise ValueError(f"chunks yielded {pos} rows, declared {n}")
            self._valid[:n] = True
            ids = np.arange(n, dtype=np.int64)
            self._id_of_slot[:n] = ids
            self._slot_of_id = {j: j for j in range(n)}
            self._free_slots = [s for s in self._free_slots if s >= n]
            self._len = n
            self._zero_norm_live = int((self._sq_norms[:n] == 0.0).sum())
            self._device = None
            self._dirty_slots.clear()

    def bulk_attach_memmap(self, path: str, n: int, dim: int,
                           sq_norms: Optional[np.ndarray] = None) -> None:
        """Adopt an EXISTING packed row file as this index's storage —
        the beyond-RAM reopen path. A prior ``host_backing`` run's row
        file (tens of GB) attaches in place instead of being re-streamed
        through ``bulk_load_stream``; rows get ids 0..n-1 (same contract
        as the stream load). Reference parity note: this is the
        attach-don't-rebuild idea of persistence reopen
        (src/persistence/engine.rs:44-73) applied one level down, at the
        row-file layer, where rewriting the file would cost hours.

        Requirements: an empty single-chip f32 index constructed with
        ``host_backing``; the file must hold exactly the capacity
        ``bulk_load_stream(n)`` would have allocated (``next_pow2(n)``
        rows of ``dim`` f32s, row i at byte offset ``i*dim*4``).
        ``sq_norms`` (shape ``(n,)``) skips the one streaming pass over
        the file that otherwise recomputes the per-row norm caches —
        callers at the 100 GB scale cache them beside the file."""
        import os
        with self._lock:
            if self._len or self._slot_of_id:
                raise ValueError("bulk_attach_memmap requires an empty "
                                 "index")
            if self._host_backing is None:
                raise ValueError("bulk_attach_memmap requires "
                                 "host_backing")
            if self.storage != "f32":
                raise ValueError("bulk_attach_memmap supports f32 "
                                 "storage only")
            if self._mesh is not None:
                raise ValueError("bulk_attach_memmap is single-chip only")
            if n < 1:
                raise ValueError("n must be >= 1")
            if self._dim is not None and dim != self._dim:
                raise DimensionMismatchError(self._dim, dim)
            cap = next_pow2(max(n, _MIN_CAPACITY), floor=_MIN_CAPACITY)
            want = cap * dim * 4
            have = os.path.getsize(path)
            if have != want:
                raise ValueError(
                    f"row file holds {have} bytes; capacity {cap} x "
                    f"{dim} f32 rows needs {want}")
            mm = np.memmap(path, dtype=np.float32, mode="r+",
                           shape=(cap, dim))
            if sq_norms is not None:
                sq = np.ascontiguousarray(sq_norms, np.float32)
                if sq.shape != (n,):
                    raise ValueError(f"sq_norms must have shape ({n},)")
            else:
                sq = np.empty(n, np.float32)
                for lo in range(0, n, _QUANT_CHUNK):
                    blk = mm[lo:min(lo + _QUANT_CHUNK, n)]
                    sq[lo:lo + len(blk)] = np.einsum(
                        "ij,ij->i", blk, blk).astype(np.float32)
            self._dim = dim
            self._capacity = cap
            self._vectors = mm
            self._vectors_path = path
            self._sq_norms = np.zeros(cap, np.float32)
            self._sq_norms[:n] = sq
            self._norms = np.zeros(cap, np.float32)
            self._norms[:n] = np.sqrt(sq)
            self._valid = np.zeros(cap, dtype=bool)
            self._valid[:n] = True
            self._id_of_slot = np.full(cap, -1, np.int64)
            self._id_of_slot[:n] = np.arange(n, dtype=np.int64)
            self._slot_of_id = {j: j for j in range(n)}
            self._free_slots = list(range(cap - 1, n - 1, -1))
            self._len = n
            self._zero_norm_live = int((sq == 0.0).sum())
            self._device = None
            self._dirty_slots.clear()

    def _write_slot(self, slot: int, internal_id: int, arr: np.ndarray) -> None:
        arr = self._quantize(arr)   # norms below see the stored values
        self._vectors[slot] = arr
        sq = float(np.dot(arr, arr))
        self._sq_norms[slot] = sq
        self._norms[slot] = math.sqrt(sq)
        self._valid[slot] = True
        self._id_of_slot[slot] = internal_id
        self._slot_of_id[internal_id] = slot
        self._len += 1
        if sq == 0.0:
            self._zero_norm_live += 1
        if self._device is not None or self._build_inflight:
            self._dirty_slots.add(slot)

    def _clear_slot(self, slot: int) -> None:
        internal_id = int(self._id_of_slot[slot])
        if self._sq_norms[slot] == 0.0 and self._valid[slot]:
            self._zero_norm_live -= 1
        self._valid[slot] = False
        self._id_of_slot[slot] = -1
        self._slot_of_id.pop(internal_id, None)
        self._free_slots.append(slot)
        self._len -= 1
        if self._device is not None or self._build_inflight:
            self._dirty_slots.add(slot)

    def remove(self, internal_id: int) -> None:
        with self._lock:
            slot = self._slot_of_id.get(internal_id)
            if slot is None:
                return  # unknown IDs are a no-op, like the reference HashMap remove
            self._clear_slot(slot)

    # -- lookup -------------------------------------------------------------

    def get_vector(self, internal_id: int) -> Optional[Vector]:
        with self._lock:
            slot = self._slot_of_id.get(internal_id)
            if slot is None:
                return None
            return Vector(self._vectors[slot].copy())

    def iter_items(self) -> Iterator[Tuple[int, Vector]]:
        with self._lock:
            slots = np.nonzero(self._valid)[0] if self._valid is not None else []
            pairs = [(int(self._id_of_slot[s]), Vector(self._vectors[s].copy()))
                     for s in slots]
        return iter(pairs)

    # -- device mirror ------------------------------------------------------

    def _build_device_full(self) -> dict:
        """Build a complete device mirror from the host arrays and RETURN
        it (no installation, no dirty-slot bookkeeping — callers own
        both). Factored out of _sync_device so ``prehydrate`` can run the
        multi-GB transfers outside the index lock."""
        if self._mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            row2d = NamedSharding(self._mesh, P(self._row_axis, None))
            row1d = NamedSharding(self._mesh, P(self._row_axis))
            rows = self._vectors
            scales = None
            if self.storage == "bf16":
                import ml_dtypes
                # host rows already live in bf16 (r5): put directly —
                # no tens-of-GB cast pass before the sharded transfer
                rows = self._vectors
                if rows.dtype != ml_dtypes.bfloat16:
                    rows = rows.astype(ml_dtypes.bfloat16)
            elif self.storage == "int8":
                # host-side requantization (exact — values were pow2-
                # quantized at insert): 1-byte codes + a f32 scale per
                # row, both sharded over the mesh row axis — 8x16M =
                # 128M rows of 768-d on a v5e-8
                rows, scales = _int8_codes_scales(self._vectors)
            dev = {
                "db": jax.device_put(rows, row2d),
                "sq_norms": jax.device_put(self._sq_norms, row1d),
                "norms": jax.device_put(self._norms, row1d),
                "valid": jax.device_put(self._valid, row1d),
            }
            if scales is not None:
                dev["scales"] = jax.device_put(scales, row1d)
                dev["int8_storage"] = True
            if _pallas_enabled(self._mesh):
                # arm the per-shard certified coarse path: each shard
                # runs its own 1-pass margin; the residual bound is
                # global (stale-high-safe)
                if self.storage == "bf16":
                    dev["bf16_storage"] = True
                    dev["elo_max"] = jnp.float32(0.0)
                elif self.storage == "int8":
                    # codes cast to bf16 exactly in VMEM per shard:
                    # zero db-side residual
                    dev["elo_max"] = jnp.float32(0.0)
                else:
                    from ..ops.coarse_kernel import residual_max_norm_f32
                    dev["elo_max"] = residual_max_norm_f32(dev["db"])
            return dev
        if self.storage == "int8":
            # host-side requantization: a 1-byte transfer per element
            # (values were already pow2-quantized at insert, so the
            # codes are exact) plus a 4-byte/row scale vector
            codes, scales = _int8_codes_scales(self._vectors)
            dev = {
                "db": jnp.asarray(codes),
                "scales": jnp.asarray(scales),
                "sq_norms": jnp.asarray(self._sq_norms),
                "norms": jnp.asarray(self._norms),
                "valid": jnp.asarray(self._valid),
                "int8_storage": True,
            }
            if _pallas_enabled(self._mesh):
                # arm the int8-source 1-pass certified tier: codes
                # cast to bf16 exactly in VMEM, so the database-side
                # residual bound is zero
                dev["elo_max"] = jnp.float32(0.0)
            return dev
        if self.storage == "bf16":
            import ml_dtypes
            # host rows already live in bf16 (r5): a 2-byte transfer with
            # no cast pass and no f32 device temp
            rows16 = self._vectors
            if rows16.dtype != ml_dtypes.bfloat16:
                rows16 = rows16.astype(ml_dtypes.bfloat16)
            db16 = jnp.asarray(rows16)
            dev = {
                "db": db16,
                "sq_norms": jnp.asarray(self._sq_norms),
                "norms": jnp.asarray(self._norms),
                "valid": jnp.asarray(self._valid),
            }
            if _pallas_enabled(self._mesh):
                # the db IS its own hi mirror; certified-exact over
                # the stored values with a zero residual bound
                dev["hi"] = db16
                dev["bf16_storage"] = True
                dev["elo_max"] = jnp.float32(0.0)
            return dev
        dev = {
            "db": jnp.asarray(self._vectors),
            "sq_norms": jnp.asarray(self._sq_norms),
            "norms": jnp.asarray(self._norms),
            "valid": jnp.asarray(self._valid),
        }
        if not self._want_mirrors:
            pass
        elif _pallas_mirrors_enabled(self._capacity, self._dim,
                                     self._mesh):
            from ..ops.coarse_kernel import (residual_max_norm,
                                             split_hi_lo)
            hi, lo = split_hi_lo(dev["db"])
            dev["hi"] = hi
            dev["lo"] = lo
            dev["elo_max"] = residual_max_norm(dev["db"], hi)
        elif _pallas_enabled(self._mesh):
            from ..ops.coarse_kernel import residual_max_norm_f32
            dev["coarse_f32"] = True
            dev["elo_max"] = residual_max_norm_f32(dev["db"])
        return dev

    def prehydrate(self) -> None:
        """Build the device mirror OUTSIDE the index lock and install it
        if no sync got there first — the recovery overlap: WAL-tail
        replay mutates host arrays on one thread while the multi-GB H2D
        transfers run on another. Rows written during the unlocked build
        may be read torn into the mirror, but every such slot is in
        ``_dirty_slots`` (never cleared here) and the next locked sync
        re-scatters it. If storage GREW mid-build (the host arrays were
        reallocated), the mirror is discarded — the identity check below
        catches it — and the first search pays the normal full sync."""
        with self._lock:
            if self._device is not None or self._len == 0:
                return
            vec0 = self._vectors
            # mutations during the unlocked build window must land in
            # _dirty_slots (they may be read torn into the mirror); with
            # no build in flight and no mirror, mutation paths skip the
            # dirty bookkeeping entirely
            self._build_inflight = True
        try:
            dev = self._build_device_full()
        except Exception:
            with self._lock:
                self._build_inflight = False
            return  # first search will surface the real error
        with self._lock:
            self._build_inflight = False
            if self._device is None and self._vectors is vec0:
                self._device = dev

    def start_progressive_hydration(self, n_rows: int):
        """Mesh-mode recovery overlap: returns a hydrator whose put
        thread transfers each device-shard PIECE as soon as the caller's
        ``advance(watermark)`` shows that piece's slot range fully
        applied — H2D rides under the snapshot apply's disk IO and
        Python decode instead of after them. Caller contract (the
        engine's streaming recovery): storage pre-sized via ``reserve``
        (no realloc before ``finish``), slots fill 0..n_rows-1 in order,
        ``finish()`` called after the WAL tail replays (it assembles the
        sharded arrays and installs the mirror; tail rows that raced a
        piece put are in ``_dirty_slots`` and the first locked sync
        repairs them piece-wise). Returns None when not applicable
        (no mesh, mirror already built, or unknown dimension). Only the
        plain flat family may use this — subclasses with extra device
        state (PQ codes) own their mirrors."""
        if self._mesh is None:
            return None
        with self._lock:
            if (self._device is not None or self._dim is None
                    or self._capacity == 0 or self._build_inflight):
                return None
            self._build_inflight = True
            try:
                return _ProgressiveMeshHydrator(self, int(n_rows))
            except Exception:
                self._build_inflight = False
                return None

    def _mesh_piece_resync(self) -> bool:
        """Partial mirror resync for mesh mode: rebuild only the device
        pieces whose row ranges contain dirty slots, reusing every
        untouched piece's buffer as-is (zero copy, zero transfer). A
        100k-row WAL tail replayed after a 10M-row recovery dirties 1 of
        8 shard pieces; the wholesale re-put this replaces transferred
        all of them (~26 GB again). Returns False when every piece is
        affected (a full rebuild is the same work) or the layout is not
        piece-decomposable — the caller then falls back to
        _build_device_full. Lock held."""
        import jax
        dev = self._device
        if len(self._dirty_slots) * 4 > self._capacity:
            # most slots dirty: a wholesale rebuild transfers barely
            # more and skips the per-piece bookkeeping (and the f32
            # lane's patched-rows residual pass over a near-capacity
            # gather)
            return False
        dirty = np.fromiter(self._dirty_slots, dtype=np.int64)

        def row_range(sh):
            sl = sh.index[0]
            lo = sl.start if sl.start is not None else 0
            hi = sl.stop if sl.stop is not None else self._capacity
            return lo, hi

        try:
            shards0 = list(dev["db"].addressable_shards)
        except Exception:
            return False
        hit = [bool(((dirty >= lo) & (dirty < hi)).any())
               for lo, hi in map(row_range, shards0)]
        if all(hit):
            return False

        piece_cache: dict = {}

        def int8_piece(lo, hi):
            if (lo, hi) not in piece_cache:
                piece_cache[(lo, hi)] = _int8_codes_scales(
                    self._vectors[lo:hi])
            return piece_cache[(lo, hi)]

        def make_piece(key, lo, hi):
            if key == "sq_norms":
                return self._sq_norms[lo:hi]
            if key == "norms":
                return self._norms[lo:hi]
            if key == "valid":
                return self._valid[lo:hi]
            if key == "scales":
                return int8_piece(lo, hi)[1]
            # key == "db"
            if self.storage == "int8":
                return int8_piece(lo, hi)[0]
            if self.storage == "bf16":
                import ml_dtypes
                rows = self._vectors[lo:hi]
                if rows.dtype != ml_dtypes.bfloat16:
                    rows = rows.astype(ml_dtypes.bfloat16)
                return rows
            return self._vectors[lo:hi]

        keys = [key for key in ("db", "sq_norms", "norms", "valid",
                                "scales") if key in dev]
        new: dict = {}
        for key in keys:
            arr = dev[key]
            pieces = []
            for sh in arr.addressable_shards:
                lo, hi = row_range(sh)
                if ((dirty >= lo) & (dirty < hi)).any():
                    pieces.append(jax.device_put(make_piece(key, lo, hi),
                                                 sh.device))
                else:
                    pieces.append(sh.data)
            new[key] = jax.make_array_from_single_device_arrays(
                arr.shape, arr.sharding, pieces)
        if "elo_max" in dev and self.storage == "f32":
            # patched rows can only RAISE the residual bound (stale-high
            # is safe — the per-shard 1-pass margin just widens)
            from ..ops.coarse_kernel import residual_max_norm_f32
            patched = np.ascontiguousarray(
                self._vectors[np.sort(dirty)], dtype=np.float32)
            dev["elo_max"] = jnp.maximum(
                dev["elo_max"], residual_max_norm_f32(jnp.asarray(patched)))
        dev.update(new)
        return True

    def _sync_device(self) -> dict:
        """Bring the HBM mirror up to date. Called with the lock held."""
        if self._mesh is not None:
            # sharded mode: piece-level resync when only some shard
            # ranges are dirty (reuses clean pieces' buffers); wholesale
            # re-put otherwise
            if self._device is None:
                self._device = self._build_device_full()
                self._dirty_slots.clear()
            elif self._dirty_slots:
                if not self._mesh_piece_resync():
                    self._device = self._build_device_full()
                self._dirty_slots.clear()
            return self._device
        if self._device is None:
            self._device = self._build_device_full()
            self._dirty_slots.clear()
            return self._device
        if self._dirty_slots:
            if len(self._dirty_slots) * _FULL_SYNC_FRACTION > self._capacity:
                self._device = None
                return self._sync_device()
            idx = np.fromiter(self._dirty_slots, dtype=np.int32)
            dev = self._device
            if self._searches_in_flight > 0:
                # a reader still holds the old buffers — copy, don't donate
                s_rows, s_vals = scatter_rows_copy, scatter_values_copy
            else:
                s_rows, s_vals = scatter_rows, scatter_values
            if self.storage == "int8":
                # patched rows as int8 codes + scales (1-byte transfer)
                codes, scales = _int8_codes_scales(self._vectors[idx])
                dev["db"] = s_rows(dev["db"], idx, jnp.asarray(codes))
                dev["scales"] = s_vals(dev["scales"], idx, scales)
                dev["sq_norms"] = s_vals(dev["sq_norms"], idx,
                                         self._sq_norms[idx])
                dev["norms"] = s_vals(dev["norms"], idx, self._norms[idx])
                dev["valid"] = s_vals(dev["valid"], idx, self._valid[idx])
                self._dirty_slots.clear()
                return self._device
            # ONE H2D transfer of the patched rows, shared by the db
            # scatter, the mirror scatter, and the residual-bound update
            # (each transfer costs a ~25 ms relay round-trip)
            rows_dev = jnp.asarray(self._vectors[idx])
            if self.storage == "bf16":
                # exact cast (values were quantized at insert); db and hi
                # alias the same buffer, so both keys track the new array
                new_db = s_rows(dev["db"], idx,
                                rows_dev.astype(jnp.bfloat16))
                dev["db"] = new_db
                if "hi" in dev:
                    dev["hi"] = new_db
                dev["sq_norms"] = s_vals(dev["sq_norms"], idx,
                                         self._sq_norms[idx])
                dev["norms"] = s_vals(dev["norms"], idx, self._norms[idx])
                dev["valid"] = s_vals(dev["valid"], idx, self._valid[idx])
                self._dirty_slots.clear()
                return self._device
            dev["db"] = s_rows(dev["db"], idx, rows_dev)
            dev["sq_norms"] = s_vals(dev["sq_norms"], idx, self._sq_norms[idx])
            dev["norms"] = s_vals(dev["norms"], idx, self._norms[idx])
            dev["valid"] = s_vals(dev["valid"], idx, self._valid[idx])
            if "hi" in dev:
                from ..ops.coarse_kernel import (scatter_hi_lo,
                                                 scatter_hi_lo_copy)
                s_hl = (scatter_hi_lo_copy if self._searches_in_flight > 0
                        else scatter_hi_lo)
                dev["hi"], dev["lo"] = s_hl(dev["hi"], dev["lo"], idx,
                                            rows_dev)
            if "elo_max" in dev:
                # patched rows can only RAISE the recorded residual bound
                # (stale-high is safe: the 1-pass margin just widens)
                from ..ops.coarse_kernel import residual_max_norm_f32
                dev["elo_max"] = jnp.maximum(
                    dev["elo_max"], residual_max_norm_f32(rows_dev))
            self._dirty_slots.clear()
        return self._device

    # -- search -------------------------------------------------------------

    def search(self, query: Vector, k: int) -> List[Tuple[int, float]]:
        results = self.search_batch(as_f32_array(query).reshape(1, -1), k)
        return results[0]

    def search_batch(self, queries: np.ndarray, k: int,
                     slot_mask: Optional[np.ndarray] = None,
                     mask_layout_version: Optional[int] = None
                     ) -> List[List[Tuple[int, float]]]:
        """Q queries in one fused device call; optional pre-top-k slot mask.

        ``mask_layout_version`` guards against TOCTOU on the mask: callers
        that compiled ``slot_mask`` against a slot layout pass the version
        they compiled for, and the search raises StaleSlotMaskError (under
        the index lock, before snapshotting device state) if a concurrent
        repack has since reordered the slots."""
        # non-polymorphic: subclasses (IVF) route their submit back through
        # their own search_batch, so dispatching here would recurse
        return FlatIndex.search_batch_submit(
            self, queries, k, slot_mask=slot_mask,
            mask_layout_version=mask_layout_version).collect()

    def search_batch_submit(self, queries: np.ndarray, k: int,
                            slot_mask: Optional[np.ndarray] = None,
                            mask_layout_version: Optional[int] = None
                            ) -> "SearchBatchHandle":
        """Asynchronous ``search_batch``: snapshots device state under the
        index lock, launches the fused device program, and returns a handle
        whose ``collect()`` blocks on the device and maps slots to internal
        ids. Keeping one handle in flight while the caller parses/formats
        the neighbouring batch pipelines host work under device compute
        (the serving front-end's depth-2 drain loop,
        server/native_http.py). Mutations racing an in-flight handle take
        the copy-scatter path (``_searches_in_flight``), so collected
        results always reflect the snapshot point."""
        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim != 2:
            raise InvalidVectorError("queries must be a (Q, d) array")
        with self._lock:
            if (slot_mask is not None and mask_layout_version is not None
                    and mask_layout_version != self.slot_layout_version):
                from ..errors import StaleSlotMaskError
                raise StaleSlotMaskError(mask_layout_version,
                                         self.slot_layout_version)
            if self._len == 0 or k <= 0:
                return SearchBatchHandle.ready(
                    [[] for _ in range(queries.shape[0])])
            if queries.shape[1] != self._dim:
                raise DimensionMismatchError(self._dim, queries.shape[1])
            if self._metric is DistanceMetric.COSINE:
                qn = np.sqrt(np.sum(queries * queries, axis=1))
                validate_cosine_operands(self._metric, float(qn.min()),
                                         self._zero_norm_live)
            dev = dict(self._sync_device())
            id_of_slot = self._id_of_slot.copy()
            live = self._len
            self._searches_in_flight += 1
        try:
            if slot_mask is not None:
                mask = np.asarray(slot_mask, dtype=bool)
                if mask.shape[0] != dev["valid"].shape[0]:
                    padded = np.zeros(int(dev["valid"].shape[0]), dtype=bool)
                    padded[: min(mask.shape[0], padded.shape[0])] = \
                        mask[: padded.shape[0]]
                    mask = padded
                dev["valid"] = jnp.logical_and(dev["valid"],
                                               jnp.asarray(mask))
            k_req = min(int(k), live)
            if self._mesh is not None:
                # the sharded path materializes synchronously; release the
                # in-flight mark and hand back a ready handle
                with annotate("vdb/flat.sharded_search"):
                    dists, idx = self._sharded_search(queries, dev, k_req)
                out = _slots_to_ids(dists, idx, id_of_slot, k_req,
                                    queries.shape[0])
                self._search_done()
                return SearchBatchHandle.ready(out)
            with annotate("vdb/flat.submit"):
                handle = flat_search_batched_submit(
                    queries, dev, self._metric, k_req,
                    mode=self.search_mode)
        except BaseException:
            self._search_done()
            raise
        nq = queries.shape[0]

        def _collect():
            with annotate("vdb/flat.collect"):
                dists, idx = handle.collect()
                return _slots_to_ids(dists, idx, id_of_slot, k_req, nq)

        return SearchBatchHandle(_collect, on_done=self._search_done)

    def _search_done(self) -> None:
        with self._lock:
            self._searches_in_flight -= 1

    def _sharded_search(self, queries: np.ndarray, dev: dict, k_req: int):
        """Distributed per-shard search + top-k merge over the mesh.

        Default route: the 1-pass certified coarse kernel per shard under
        shard_map (same pipeline as the single-chip flagship); queries
        whose certificate fails anywhere re-run through the sharded XLA
        scan. Falls back to the XLA scan wholesale when the signature is
        unsupported (k too large, tiny shards, pallas unavailable)."""
        from ..parallel.distributed import (make_sharded_search_coarse,
                                            sharded_coarse_supported)
        q = queries.shape[0]
        q_pad = next_pow2(q, floor=1)
        if q_pad != q:
            queries = np.concatenate(
                [queries, np.zeros((q_pad - q, queries.shape[1]),
                                   dtype=queries.dtype)], axis=0)
        block_rows = self._capacity // self._mesh.shape[self._row_axis]
        src = ("int8" if dev.get("int8_storage")
               else "bf16" if dev.get("bf16_storage") else "f32")
        if (dev.get("elo_max") is not None
                and sharded_coarse_supported(block_rows, self._dim, k_req,
                                             src)):
            key = ("coarse", k_req, self._capacity, src)
            fn = self._sharded_search_cache.get(key)
            if fn is None:
                from ..ops.coarse_kernel import interpret_mode
                fn = make_sharded_search_coarse(
                    self._mesh, self._metric, k_req, block_rows,
                    self._row_axis, interpret_mode(), src=src)
                self._sharded_search_cache[key] = fn
            extra = (dev["scales"],) if src == "int8" else ()
            dists, idx, cert = fn(jnp.asarray(queries), dev["db"],
                                  dev["sq_norms"], dev["norms"],
                                  dev["valid"], dev["elo_max"], *extra)
            dists = np.asarray(dists)[:q]
            idx = np.asarray(idx)[:q]
            bad = np.nonzero(~np.asarray(cert)[:q])[0]
            if bad.size:
                # rare: re-run uncertified queries through the XLA scan
                sub_d, sub_i = self._sharded_search_xla(
                    np.ascontiguousarray(queries[bad]), dev, k_req)
                dists = dists.copy(); idx = idx.copy()
                dists[bad] = sub_d[:, : dists.shape[1]]
                idx[bad] = sub_i[:, : idx.shape[1]]
            return dists, idx
        return self._sharded_search_xla(queries[:q], dev, k_req)

    def _sharded_search_xla(self, queries: np.ndarray, dev: dict,
                            k_req: int):
        """Sharded full-precision scan + top-k merge (fallback path);
        int8 storage dequantizes per shard (exact pow2 scales)."""
        from ..parallel.distributed import make_sharded_search
        k_eff = min(next_pow2(k_req, floor=1), self._capacity)
        src = "int8" if dev.get("int8_storage") else "f32"
        key = (k_eff, self._capacity, src)
        fn = self._sharded_search_cache.get(key)
        if fn is None:
            block_rows = self._capacity // self._mesh.shape[self._row_axis]
            fn = make_sharded_search(self._mesh, self._metric, k_eff,
                                     block_rows, self._row_axis, src=src)
            self._sharded_search_cache[key] = fn
        q = queries.shape[0]
        q_pad = next_pow2(q, floor=1)
        if q_pad != q:
            queries = np.concatenate(
                [queries, np.zeros((q_pad - q, queries.shape[1]),
                                   dtype=queries.dtype)], axis=0)
        extra = (dev["scales"],) if src == "int8" else ()
        dists, idx = fn(jnp.asarray(queries), dev["db"], dev["sq_norms"],
                        dev["norms"], dev["valid"], *extra)
        return np.asarray(dists)[:q], np.asarray(idx)[:q]

    def search_masked(self, query: Vector, k: int, slot_mask: np.ndarray,
                      mask_layout_version: Optional[int] = None
                      ) -> Optional[List[Tuple[int, float]]]:
        results = self.search_batch(as_f32_array(query).reshape(1, -1), k,
                                    slot_mask=slot_mask,
                                    mask_layout_version=mask_layout_version)
        return results[0]

    # -- introspection helpers (used by persistence / benchmarks) -----------

    def packed_arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(vectors[capacity,d], valid[capacity], id_of_slot[capacity])
        host copies. Vectors come back as f32 regardless of the host
        container dtype (bf16 storage keeps rows in bf16 on the host)."""
        with self._lock:
            if self._vectors is None:
                return (np.zeros((0, 0), np.float32), np.zeros(0, bool),
                        np.zeros(0, np.int64))
            return (self._vectors.astype(np.float32), self._valid.copy(),
                    self._id_of_slot.copy())

    def __repr__(self) -> str:
        return (f"FlatIndex(metric={self._metric.value}, len={self._len}, "
                f"dim={self._dim}, capacity={self._capacity})")


class _ProgressiveMeshHydrator:
    """Recovery-overlap helper for mesh-sharded FlatIndex (see
    FlatIndex.start_progressive_hydration). A put thread transfers each
    device-shard piece the moment the apply watermark passes that
    piece's slot range; ``finish()`` assembles the pieces into sharded
    arrays (jax.make_array_from_single_device_arrays — zero extra copy)
    and installs the mirror. Reference contract: recovery hydration is
    the TPU analogue of src/persistence/engine.rs:44-73's re-insert
    replay; overlap has no reference counterpart (no device there)."""

    def __init__(self, index: FlatIndex, n_rows: int):
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        self._ix = index
        self._n = n_rows
        self._vec0 = index._vectors
        self._C, self._d = index._capacity, index._dim
        mesh, axis = index._mesh, index._row_axis
        self._row2d = NamedSharding(mesh, P(axis, None))
        self._row1d = NamedSharding(mesh, P(axis))
        imap = self._row2d.addressable_devices_indices_map(
            (self._C, self._d))
        # [(device, lo, hi)] — put order is ascending hi so each piece
        # becomes ready as early as possible
        self._plan = []
        for dev, idx in imap.items():
            sl = idx[0]
            lo = sl.start if sl.start is not None else 0
            hi = sl.stop if sl.stop is not None else self._C
            self._plan.append((dev, lo, hi))
        self._order = sorted(range(len(self._plan)),
                             key=lambda j: self._plan[j][2])
        self._wm = 0
        self._done = False
        self._error: Optional[BaseException] = None
        self._result: Optional[dict] = None
        self._cv = threading.Condition()
        self._thread = threading.Thread(
            target=self._run, name="vdb-hydrate", daemon=True)
        self._thread.start()

    def advance(self, watermark: int) -> None:
        """Applied-row watermark (slots [0, watermark) are final modulo
        the WAL tail). Cheap; called once per applied chunk."""
        with self._cv:
            if watermark > self._wm:
                self._wm = watermark
                self._cv.notify_all()

    def _run(self) -> None:
        import jax
        try:
            pieces: dict = {}
            for j in self._order:
                device, lo, hi = self._plan[j]
                need = min(hi, self._n)
                with self._cv:
                    while self._wm < need and not self._done:
                        self._cv.wait(1.0)
                pieces[j] = self._put_piece(device, lo, hi)
            self._result = pieces
        except BaseException as e:  # noqa: BLE001 — reported in finish
            self._error = e

    def _put_piece(self, device, lo: int, hi: int) -> dict:
        import jax
        ix = self._ix
        out: dict = {}
        if ix.storage == "int8":
            codes, scales = _int8_codes_scales(
                np.asarray(ix._vectors[lo:hi], np.float32))
            out["db"] = jax.device_put(codes, device)
            out["scales"] = jax.device_put(scales, device)
        elif ix.storage == "bf16":
            import ml_dtypes
            rows = ix._vectors[lo:hi]
            if rows.dtype != ml_dtypes.bfloat16:
                rows = rows.astype(ml_dtypes.bfloat16)
            out["db"] = jax.device_put(rows, device)
        else:
            out["db"] = jax.device_put(ix._vectors[lo:hi], device)
        out["sq_norms"] = jax.device_put(ix._sq_norms[lo:hi], device)
        out["norms"] = jax.device_put(ix._norms[lo:hi], device)
        out["valid"] = jax.device_put(ix._valid[lo:hi], device)
        return out

    def finish(self) -> bool:
        """Join the put thread, assemble + install the mirror. Returns
        True if the mirror was installed (False: a sync built one first,
        storage was reallocated, or a put failed — the next search then
        pays the normal full sync). Always clears the build flag."""
        import jax
        with self._cv:
            self._done = True
            if self._n > self._wm:
                self._wm = self._n
            self._cv.notify_all()
        self._thread.join()
        ix = self._ix
        try:
            if self._error is not None or self._result is None:
                return False
            dev: dict = {}
            keys = ["db", "sq_norms", "norms", "valid"]
            if ix.storage == "int8":
                keys.append("scales")
            for key in keys:
                if key == "db":
                    shape, sh = (self._C, self._d), self._row2d
                else:
                    shape, sh = (self._C,), self._row1d
                dev[key] = jax.make_array_from_single_device_arrays(
                    shape, sh,
                    [self._result[j][key]
                     for j in range(len(self._plan))])
            if ix.storage == "int8":
                dev["int8_storage"] = True
            if _pallas_enabled(ix._mesh):
                if ix.storage == "bf16":
                    dev["bf16_storage"] = True
                    dev["elo_max"] = jnp.float32(0.0)
                elif ix.storage == "int8":
                    dev["elo_max"] = jnp.float32(0.0)
                else:
                    from ..ops.coarse_kernel import residual_max_norm_f32
                    dev["elo_max"] = residual_max_norm_f32(dev["db"])
            with ix._lock:
                if ix._device is None and ix._vectors is self._vec0:
                    ix._device = dev
                    return True
                return False
        except Exception:
            return False
        finally:
            with ix._lock:
                ix._build_inflight = False
