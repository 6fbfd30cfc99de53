"""PQ-Flat: product-quantized flat index — the beyond-HBM capacity lane.

An index family beyond the reference (flat + HNSW, src/lib.rs:30-47),
motivated by the chip's memory hierarchy: HBM capacity, not FLOPs, caps
one-chip database size (f32 rows ~4M x 768, bf16 8M, int8 16M —
BASELINE.md). PQ codes at 1 byte per subspace cut device storage to
``m`` bytes/row (96 B at 768-d with the default 8-dim subspaces — 32x
less than f32), so tens of millions of rows fit on one chip.

Architecture (ops/pq.py holds the device programs):

* The DEVICE holds only codes (uint8[capacity, m]) + the codebook +
  validity. The streaming scan decodes tiles in VMEM via one-hot MXU
  matmuls and returns the top-R candidate slots per query.
* The HOST keeps the full-precision rows (FlatIndex's packed array — the
  source of truth that already exists for persistence) and exactly
  re-ranks the R candidates per query, so RETURNED DISTANCES ARE EXACT
  f32 values over the true stored rows; recall is governed only by
  candidate coverage (``refine``), exactly like IVF's nprobe.
* An OPQ pre-rotation (``rotate=True`` default; ops/pq.fit_opq_rotation)
  is learned at train time and folded into the device encode/scan
  programs. Better codes shrink the refine pool a target recall needs —
  and the host re-rank, the measured dominant query cost
  (benchmarks/exp_pq_profile.py), is linear in refine. Measured at
  refine=16 on spread-signal intrinsic-dim-16 data: 0.80 -> 0.999
  recall@10. Distances are rotation-invariant; the re-rank always uses
  the true unrotated rows.

Mutations follow FlatIndex slot semantics unchanged — PQ never repacks
slots (slot_layout_version never bumps), so store-compiled filter masks
stay valid across training. Post-train writes re-encode on the next
search sync through the one device encode program (small deltas pad to
a fixed chunk). Searches
racing mutations reflect the snapshot point: candidate slots mutated
mid-flight are dropped via a per-slot mutation stamp rather than mixing
old candidacy with new row values.

Filtered searches run the masked PQ scan (mask ANDed into validity
before top-R) + exact re-rank: filters stay exact in the same sense as
the unmasked path.

``_PqCodesCore`` factors the code storage / encode / device-sync /
scan-dispatch / exact-re-rank machinery out of ``PqFlatIndex`` so
``IvfPqIndex`` (index/ivfpq.py — IVF layout + residual codes, the
clustered-data lane) shares it; the hooks each concrete index overrides
are ``train``, ``_encode_slots``, ``_scan_state``/``_scan_call``, and
the trained-state persistence pair.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..distance import DistanceMetric, validate_cosine_operands
from ..errors import IndexOpError
from .flat import FlatIndex

_TRAIN_SAMPLE_MAX = 1 << 18
_SCAN_CHUNK = 16384         # rows per streamed scan chunk (pow2): the
                            # chip A/B measured 884 ms/batch at 16384 vs
                            # 1015 at 4096 (rt=0.85, 1M x 768, Q=4096) —
                            # fewer per-chunk selection calls
_MAX_REFINE = 1024          # r beyond this falls back to the exact scan
_CAND_BYTES = 1 << 32       # (Q, nc*r) stacked-candidate budget -> Q
                            # sub-batching at huge N. Generous on purpose:
                            # every sub-batch call re-decodes the whole
                            # database (decode cost is per-row per-CALL),
                            # so splitting Q multiplies the scan's decode
                            # share
_ENC_CHUNK_MIN = 256        # floor pad size for small encode batches:
                            # one fixed jit signature for write deltas
_ENC_SLAB = 1 << 20         # rows per host->device encode transfer
_SCORE_BYTES = 1 << 28      # budget for (m, chunk, ksub) score tensors
_ONEHOT_BYTES = 1 << 30     # budget for (chunk, m, ksub) bf16 one-hots
_SCATTER_MAX = 1 << 15      # beyond this many dirty codes, re-put wholesale
_RERANK_QBLOCK = 512
_RERANK_DEV_ROW_BYTES = 12 << 30   # device re-rank row-mirror budget: the
                                   # f32 rows live in HBM beside the codes
                                   # (12 GB = the measured 4M x 768 f32
                                   # single-chip ceiling)
_MASKED_EXACT_MAX = 2048    # filters with at most max(r, this) eligible
                            # rows answer via the exact host scan — the
                            # masked device scan's positional candidate
                            # buckets can under-return on that few rows
_MASKED_STREAM_CHUNK = 8192  # eligible rows per chunk in the streaming
                             # exact safety net
_HOST_DIST_BYTES = 1 << 29   # working-set bound for host distance blocks


def _pow2_floor(n: int) -> int:
    return 1 << (max(int(n), 1).bit_length() - 1)


class _PqCodesCore:
    """Shared PQ-codes machinery (mixin over a FlatIndex-family base).

    Holds: the uint8 code array + its device mirror, the (device-only)
    encode path, per-slot mutation
    stamps, the scan dispatch loop with query sub-batching, and the
    exact host re-rank. Concrete indexes provide ``train`` (codebook
    fit), ``_encode_slots`` (rows vs residuals), and the scan state/call
    pair."""

    # -- shared state ----------------------------------------------------------

    def _pq_init(self, m: Optional[int], ksub: int, refine: int,
                 train_iters: int, auto_train_min: int, seed: int,
                 scan_recall: float, rotate: bool = False,
                 rerank: str = "auto") -> None:
        self._want_mirrors = False
        # where the exact re-rank runs. "device": gather the candidate
        # rows from the HBM row mirror and compute exact f32 top-k on
        # chip (ops/pq.pq_rerank_topk) — the host re-rank is the measured
        # dominant PQ query cost and is linear in refine. "host": the
        # original host-NumPy path (required for host_backing, where no
        # device row copy exists, and for the mesh). "auto": device on
        # the TPU backend when the rows fit _RERANK_DEV_ROW_BYTES and
        # neither mesh nor host_backing is set, else host — a
        # deterministic function of (config, capacity, backend), so
        # reopen on the same backend reproduces the same path
        # bit-identically.
        if rerank not in ("auto", "device", "host"):
            raise ValueError(f"unknown rerank mode: {rerank!r}")
        self.rerank_mode = rerank
        if m is not None and m < 1:
            raise ValueError("m must be >= 1")
        if not 2 <= ksub <= 256:
            raise ValueError("ksub must be in [2, 256] (codes are uint8)")
        if refine < 1:
            raise ValueError("refine must be >= 1")
        self._m_arg = m
        self.ksub = int(ksub)
        # top-R candidate pool re-ranked exactly per query (the recall
        # knob; effective R = max(refine, k), rounded up to a pow2)
        self.refine = int(refine)
        self.train_iters = int(train_iters)
        self.auto_train_min = int(auto_train_min)
        # approx_min_k recall target for the scan's candidate selection.
        # 0.85 measured 2.7x faster than 0.95 on chip (the aggregation
        # step shrinks) at negligible top-k cost: selection misses
        # concentrate near the pool BOUNDARY, while the true top-k rank
        # deep inside the pool; the exact re-rank then fixes ordering.
        if not 0.0 < scan_recall <= 1.0:
            raise ValueError("scan_recall must be in (0, 1]")
        self.scan_recall = float(scan_recall)
        self._seed = int(seed)
        # OPQ pre-rotation (ops/pq.fit_opq_rotation): learned at train
        # time, applied inside the device encode/scan programs; the
        # exact host re-rank always uses the true unrotated rows
        self._rotate = bool(rotate)
        self._rot: Optional[np.ndarray] = None        # (d, d) f32
        self._rot_dev = None
        # trained state
        self._trained = False
        self._m = 0
        self._codebook: Optional[np.ndarray] = None   # (m, ksub, dsub) f32
        self._codebook_dev = None
        self._bd_dev = None          # grouped block-diag decode matrices
        self._cnorm_dev = None       # (m, ksub) codeword sq-norms
        self._codes: Optional[np.ndarray] = None      # uint8[capacity, m]
        self._codes_dev = None
        self._pq_valid_dev = None
        self._pq_valid_dirty = True
        self._pq_dirty: set[int] = set()
        self._pq_full_reencode = False
        # per-slot mutation stamps: searches snapshot the tick at submit
        # and drop candidates whose slot mutated after it
        self._tick = 0
        self._slot_tick: Optional[np.ndarray] = None  # int64[capacity]

    # -- configuration --------------------------------------------------------

    @property
    def is_trained(self) -> bool:
        return self._trained

    def _resolve_m(self, d: int) -> int:
        if self._m_arg is not None:
            if d % self._m_arg:
                raise IndexOpError(
                    f"PQ m={self._m_arg} must divide dimension {d}")
            return self._m_arg
        for dsub in (8, 4, 2, 1):
            if d % dsub == 0:
                return d // dsub
        return d  # unreachable (dsub=1 always divides)

    @staticmethod
    def _fit_chunk(m: int, ksub: int, s: int) -> int:
        return min(_pow2_floor(s),
                   max(256, _pow2_floor(_SCORE_BYTES // (m * ksub * 4))))

    @staticmethod
    def _enc_chunk(m: int, ksub: int) -> int:
        return max(256, _pow2_floor(_SCORE_BYTES // (m * ksub * 4)))

    def _scan_chunk(self) -> int:
        cap = self._capacity
        if self._mesh is not None:
            # per-shard chunking: the sharded scan streams each shard's
            # block (pow2 / pow2 keeps divisibility)
            cap = cap // self._mesh.shape[self._row_axis]
        chunk = min(_SCAN_CHUNK, _pow2_floor(cap),
                    max(256, _pow2_floor(_ONEHOT_BYTES
                                         // (self._m * self.ksub * 2))))
        return max(chunk, 1)

    def _fit_codebook(self, sample: np.ndarray, m: int,
                      rot: Optional[np.ndarray] = None) -> np.ndarray:
        """Batched subspace k-means over ``sample`` rows (wrap-padded to
        a chunk multiple); with ``rot`` the fit runs in the rotated
        space (the rotation matmul rides the device program)."""
        chunk = self._fit_chunk(m, self.ksub, len(sample))
        pad = (-len(sample)) % chunk
        if pad:
            # wrap-pad to a chunk multiple (duplicates re-weight at
            # most chunk-1 of >=ksub rows — negligible for k-means)
            sample = np.concatenate([sample, sample[:pad]])
        import jax
        from ..ops.pq import pq_fit
        return np.asarray(pq_fit(
            jnp.asarray(np.ascontiguousarray(sample, np.float32)),
            jax.random.PRNGKey(self._seed), m=m, ksub=self.ksub,
            iters=self.train_iters, chunk=chunk,
            rot=None if rot is None else jnp.asarray(rot)))

    # -- encoding --------------------------------------------------------------

    def _encode_rot(self):
        """Rotation ``pq_encode`` applies to encode inputs. Hook:
        IvfPqIndex returns None — it folds the rotation into its host
        residual computation so residuals live in the scan's own basis
        (encoding vs the bf16-rounded ROTATED centroid table; rotating
        raw-space residuals instead would leave a per-cluster
        c@R - bf16(c@R) reconstruction bias the codes cannot express)."""
        return self._rot_dev_arr()

    def _encode_rows(self, rows: np.ndarray) -> np.ndarray:
        """(n, d) f32 -> (n, m) uint8 via the trained codebook, ALWAYS
        through the device program. A batch-size-dependent host shortcut
        would make codes depend on write-batch history: host BLAS and
        the MXU einsum round near-tie subspace distances differently, so
        a row host-encoded live could flip its code when recovery
        re-encodes it in a device slab — breaking the bit-identical
        reopen contract (export_trained_state). One path means codes are
        a function of (codebook, row bytes, backend) only. Small batches
        pad to one fixed chunk so incremental write syncs reuse a single
        compiled signature instead of compiling per delta size."""
        n = len(rows)
        if n == 0:
            return np.empty((0, self._m), np.uint8)
        from ..ops.pq import pq_encode
        if self._codebook_dev is None:
            self._codebook_dev = jnp.asarray(self._codebook)
        chunk = self._enc_chunk(self._m, self.ksub)
        out = np.empty((n, self._m), np.uint8)
        for a in range(0, n, _ENC_SLAB):
            blk = np.ascontiguousarray(rows[a:a + _ENC_SLAB], np.float32)
            bn = len(blk)
            c = min(chunk, max(_ENC_CHUNK_MIN, _pow2_floor(bn)))
            pad = (-bn) % c
            if pad:
                blk = np.concatenate(
                    [blk, np.zeros((pad, blk.shape[1]), np.float32)])
            codes = np.asarray(pq_encode(jnp.asarray(blk),
                                         self._codebook_dev, chunk=c,
                                         rot=self._encode_rot()))
            out[a:a + bn] = codes[:bn]
        return out

    def _rot_dev_arr(self):
        if self._rot is None:
            return None
        if self._rot_dev is None:
            self._rot_dev = self._pq_replicated(self._rot)
        return self._rot_dev

    def _encode_slots(self, slots: np.ndarray) -> np.ndarray:
        """Codes for the given slots. Hook: PqFlatIndex encodes the raw
        stored rows; IvfPqIndex encodes residuals vs the owning
        centroid."""
        return self._encode_rows(self._vectors[slots])

    def _reencode_all(self) -> None:
        live = np.nonzero(self._valid)[0]
        for a in range(0, live.size, _ENC_SLAB):
            idx = live[a:a + _ENC_SLAB]
            self._codes[idx] = self._encode_slots(idx)

    # -- mutation hooks ----------------------------------------------------------

    def _stamp(self, slot: int) -> None:
        self._tick += 1
        if self._slot_tick is not None:
            self._slot_tick[slot] = self._tick

    def _ensure_storage(self, dim: int, want_rows: int) -> None:
        old_cap = self._capacity
        super()._ensure_storage(dim, want_rows)
        if self._capacity != old_cap:
            nt = np.zeros(self._capacity, np.int64)
            if self._slot_tick is not None:
                nt[:old_cap] = self._slot_tick
            self._slot_tick = nt
            if self._trained:
                nc = np.zeros((self._capacity, self._m), np.uint8)
                nc[:old_cap] = self._codes
                self._codes = nc
                self._codes_dev = None
                self._pq_valid_dirty = True

    def _write_slot(self, slot: int, internal_id: int,
                    arr: np.ndarray) -> None:
        super()._write_slot(slot, internal_id, arr)
        self._stamp(slot)
        if self._trained:
            self._pq_dirty.add(slot)
            self._pq_valid_dirty = True

    def _clear_slot(self, slot: int) -> None:
        super()._clear_slot(slot)
        self._stamp(slot)
        if self._trained:
            self._pq_valid_dirty = True

    def _note_appended(self, slots: np.ndarray) -> None:
        # the one seam every append path funnels through (per-item
        # add_batch prefixes, bulk_append_matrix recovery chunks) — stamp
        # ticks / PQ dirtiness for exactly the slots it touched
        if len(slots):
            self._tick += 1
            self._slot_tick[slots] = self._tick
            if self._trained:
                self._pq_dirty.update(slots.tolist())
                self._pq_valid_dirty = True

    def _bulk_load_fresh(self, ids: np.ndarray, items, dim: int) -> None:
        super()._bulk_load_fresh(ids, items, dim)
        self._after_bulk_load()

    def bulk_load_matrix(self, ids: np.ndarray, mat: np.ndarray) -> None:
        super().bulk_load_matrix(ids, mat)
        with self._lock:
            self._after_bulk_load()

    def bulk_load_stream(self, n: int, dim: int, chunks) -> None:
        super().bulk_load_stream(n, dim, chunks)
        with self._lock:
            self._after_bulk_load()

    def bulk_attach_memmap(self, *args, **kwargs) -> None:
        super().bulk_attach_memmap(*args, **kwargs)
        with self._lock:
            # attach bypasses _ensure_storage, so the PQ-side per-slot
            # arrays are sized here
            if (self._slot_tick is None
                    or len(self._slot_tick) != self._capacity):
                self._slot_tick = np.zeros(self._capacity, np.int64)
            self._after_bulk_load()

    def _after_bulk_load(self) -> None:
        self._tick += 1
        self._slot_tick[:self._len] = self._tick
        if self._trained:
            self._pq_dirty.clear()
            self._pq_full_reencode = True
            self._codes_dev = None
            self._pq_valid_dirty = True

    # -- device sync -------------------------------------------------------------

    def _pq_replicated(self, arr):
        """Small arrays (codebook tables, rotation) replicate across the
        mesh; plain device arrays otherwise."""
        if self._mesh is None:
            return jnp.asarray(arr)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(np.asarray(arr),
                              NamedSharding(self._mesh, P()))

    def _pq_sync(self):
        """Bring codes/codebook/validity device copies current (lock
        held). Returns (codes_dev, bd_dev, cnorm_dev, valid_dev).
        One body for single-chip and mesh: with a mesh, codes/validity
        device_put sharded over the row axis (wholesale re-put on
        mutation — same policy as the sharded flat sync; a scatter
        across a sharded buffer would reshard anyway) and the codebook
        tables replicate."""
        sharded = self._mesh is not None
        # _bd_dev checked too: an encode (which installs _codebook_dev
        # alone via _encode_rows) may run before the first search sync
        if self._codebook_dev is None or self._bd_dev is None:
            from ..ops.pq import pack_codebook
            self._codebook_dev = self._pq_replicated(self._codebook)
            bd, _ = pack_codebook(self._codebook)
            self._bd_dev = self._pq_replicated(bd)
            self._cnorm_dev = self._pq_replicated(
                np.sum(self._codebook * self._codebook, axis=-1,
                       dtype=np.float32))
        if self._pq_full_reencode:
            self._reencode_all()
            self._pq_full_reencode = False
            self._pq_dirty.clear()
            self._codes_dev = None
        if self._pq_dirty:
            slots = np.fromiter(self._pq_dirty, np.int64,
                                count=len(self._pq_dirty))
            self._pq_dirty.clear()
            self._codes[slots] = self._encode_slots(slots)
            if (not sharded and self._codes_dev is not None
                    and len(slots) <= _SCATTER_MAX):
                from ..ops.topk import next_pow2
                from ..ops.update import scatter_rows, scatter_rows_copy
                n = len(slots)
                npad = next_pow2(n, floor=1)
                if npad != n:   # idempotent duplicate writes pad the shape
                    slots = np.concatenate(
                        [slots, np.full(npad - n, slots[0], np.int64)])
                rows = self._codes[slots]
                op = (scatter_rows if self._searches_in_flight == 0
                      else scatter_rows_copy)
                self._codes_dev = op(self._codes_dev,
                                     jnp.asarray(slots), jnp.asarray(rows))
            else:
                self._codes_dev = None
        if self._codes_dev is None:
            self._codes_dev = self._pq_put_rows(self._codes)
            self._pq_valid_dirty = True
        if self._pq_valid_dirty or self._pq_valid_dev is None:
            self._pq_valid_dev = self._pq_put_vec(self._valid)
            self._pq_valid_dirty = False
        return (self._codes_dev, self._bd_dev, self._cnorm_dev,
                self._pq_valid_dev)

    def _pq_put_rows(self, arr):
        if self._mesh is None:
            return jnp.asarray(arr)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(
            arr, NamedSharding(self._mesh, P(self._row_axis, None)))

    def _pq_put_vec(self, arr):
        if self._mesh is None:
            return jnp.asarray(arr)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(
            arr, NamedSharding(self._mesh, P(self._row_axis)))

    # -- scan dispatch hooks -----------------------------------------------------

    def _scan_state(self) -> dict:
        """Device arrays the scan needs (lock held)."""
        codes, bd, cnorm, valid = self._pq_sync()
        return {"codes": codes, "bd": bd, "cnorm": cnorm, "valid": valid}

    def _scan_pool_cols(self, r: int) -> int:
        """Stacked-candidate columns per query (bounds the per-dispatch
        query count)."""
        return max(self._capacity // self._scan_chunk(), 1) * r

    def _scan_bytes_per_query(self, r: int) -> int:
        return self._scan_pool_cols(r) * 8

    def _scan_call(self, state: dict, qb, r: int):
        """One scan dispatch -> (scores (Qb, r) dev, slots (Qb, r) dev).
        With a mesh: the sharded per-shard scan + exact merged top-r
        (parallel/distributed.make_sharded_pq_scan)."""
        rot = self._rot_dev_arr()
        if self._mesh is not None:
            fn = self._sharded_pq_scanner(r, rot is not None)
            extra = (rot,) if rot is not None else ()
            return fn(qb, state["codes"], state["bd"], state["cnorm"],
                      state["valid"], *extra)
        from ..ops.pq import _use_pallas_decode, pq_scan_topr
        return pq_scan_topr(qb, state["codes"], state["bd"],
                            state["cnorm"], state["valid"], self._metric,
                            r=r, chunk=self._scan_chunk(),
                            recall_target=self.scan_recall,
                            rot=rot,
                            pallas_decode=_use_pallas_decode(
                                self._capacity, self._m,
                                self._scan_chunk()))

    def _sharded_pq_scanner(self, r: int, with_rot: bool):
        # scan_recall is baked into the compiled closure, so it belongs
        # in the cache key (the single-chip path reads it per call)
        key = ("pqscan", r, self._capacity, with_rot, self.scan_recall)
        fn = self._sharded_search_cache.get(key)
        if fn is None:
            from ..parallel.distributed import make_sharded_pq_scan
            block_rows = (self._capacity
                          // self._mesh.shape[self._row_axis])
            fn = make_sharded_pq_scan(
                self._mesh, self._metric, r, self._scan_chunk(),
                block_rows, self._row_axis,
                recall_target=self.scan_recall, with_rot=with_rot)
            self._sharded_search_cache[key] = fn
        return fn

    def _scan_r_max(self) -> int:
        """Largest refine pool the scan program supports."""
        return min(self._scan_chunk(), _MAX_REFINE)

    def _rerank_venue(self) -> str:
        """Resolve where the exact re-rank runs (lock held). Deterministic
        in (config, capacity, backend) — see _pq_init. Three lanes:

        * "mirror": rows are HBM-resident — gather + distances + top-k
          all on chip (ops/pq.pq_rerank_topk), (Q, k) D2H only.
        * "gathered": no HBM row copy exists (host_backing, or rows past
          _RERANK_DEV_ROW_BYTES) and rerank="device" was requested
          explicitly — the host gathers the (Qb, r, d) candidate rows
          (disk memmap / page cache), ships them, and the chip computes
          exact distances + top-k (ops/pq.pq_rerank_gathered) while the
          host gathers the next block. MEASURED r5 at 2^25 x 768 on the
          relayed chip (benchmarks/pq25_rerank_ab.py, same caches, same
          recall at every point): the host venue beats it 3.2-4.6x
          (936/757/429 vs 290/168/94 QPS at refine 32/64/128, Q=4096) —
          with the Pallas VMEM decode the scan is cheap enough that
          shipping the gathered rows through the ~25 ms-per-dispatch
          relay dominates the host BLAS it replaces. So "auto" resolves
          to HOST here; "device" keeps the gathered lane for hosts whose
          H2D is not relay-priced.
        * "host": the NumPy re-rank over the gathered rows (the mesh
          lane, non-TPU backends, beyond-mirror capacities, and
          rerank="host").
        """
        if self.rerank_mode == "host":
            return "host"
        if self._mesh is not None:
            if self.rerank_mode == "device":
                raise IndexOpError(
                    "rerank='device' is single-chip only (the sharded "
                    "path re-ranks on host after the shard merge)")
            return "host"
        if (self._host_backing is not None
                or self._capacity * (self._dim or 0) * 4
                > _RERANK_DEV_ROW_BYTES):
            return ("gathered" if self.rerank_mode == "device"
                    else "host")
        if self.rerank_mode == "device":
            return "mirror"
        import jax
        return "mirror" if jax.default_backend() == "tpu" else "host"

    def _device_rerank_active(self) -> bool:
        return self._rerank_venue() == "mirror"

    def _pq_fallback_search(self, queries: np.ndarray, k: int, **fb):
        """Exact-scan fallback while untrained / for out-of-envelope r.
        Hook: IvfPqIndex bypasses IvfFlatIndex's probed path."""
        return super().search_batch(queries, k, **fb)

    # -- search --------------------------------------------------------------------

    def search_batch_submit(self, queries: np.ndarray, k: int,
                            slot_mask: Optional[np.ndarray] = None,
                            mask_layout_version: Optional[int] = None):
        """PQ's scan + host re-rank pipeline is synchronous (the re-rank
        needs the candidate slots on host), so the async contract is
        served eagerly — inheriting FlatIndex's launcher would silently
        swap the PQ lane for a full exact scan (same note as IVF)."""
        from .flat import SearchBatchHandle
        return SearchBatchHandle.ready(self.search_batch(
            queries, k, slot_mask=slot_mask,
            mask_layout_version=mask_layout_version))

    def search_batch(self, queries: np.ndarray, k: int,
                     slot_mask: Optional[np.ndarray] = None,
                     refine: Optional[int] = None,
                     mask_layout_version: Optional[int] = None
                     ) -> List[List[Tuple[int, float]]]:
        if slot_mask is not None:
            # NO auto-train here even though PQ training preserves slot
            # layout — keep the same policy surface as IVF (training
            # mid-filtered-query is surprising latency, not a bug risk)
            with self._lock:
                trained = self._trained
            if not trained:
                return self._pq_fallback_search(
                    queries, k, slot_mask=slot_mask,
                    mask_layout_version=mask_layout_version)
            return self._pq_search(queries, k, refine, slot_mask,
                                   mask_layout_version)
        with self._lock:
            if (not self._trained
                    and self._len >= max(self.auto_train_min, self.ksub)):
                self.train()
            trained = self._trained
        if not trained:
            return self._pq_fallback_search(queries, k)
        return self._pq_search(queries, k, refine, None, None)

    def _pq_search(self, queries: np.ndarray, k: int,
                   refine: Optional[int],
                   slot_mask: Optional[np.ndarray],
                   mask_layout_version: Optional[int]
                   ) -> List[List[Tuple[int, float]]]:
        fb: dict = ({} if slot_mask is None else
                    {"slot_mask": slot_mask,
                     "mask_layout_version": mask_layout_version})
        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim != 2:
            from ..errors import InvalidVectorError
            raise InvalidVectorError("queries must be a (Q, d) array")
        with self._lock:
            if (mask_layout_version is not None
                    and mask_layout_version != self.slot_layout_version):
                from ..errors import StaleSlotMaskError
                raise StaleSlotMaskError(mask_layout_version,
                                         self.slot_layout_version)
            if self._len == 0 or k <= 0:
                return [[] for _ in range(queries.shape[0])]
            if queries.shape[1] != self._dim:
                from ..errors import DimensionMismatchError
                raise DimensionMismatchError(self._dim, queries.shape[1])
            if self._metric is DistanceMetric.COSINE:
                qn = np.sqrt(np.sum(queries * queries, axis=1))
                validate_cosine_operands(self._metric,
                                         float(qn.min(initial=np.inf)),
                                         self._zero_norm_live)
            from ..ops.topk import next_pow2
            k_req = min(int(k), self._len)
            r_eff = max(int(refine if refine is not None else self.refine),
                        k_req)
            r = next_pow2(min(r_eff, self._capacity), floor=1)
            if r > self._scan_r_max():
                # huge k / tiny index: the exact scan is the better
                # program than a multi-thousand-row host re-rank
                return self._pq_fallback_search(queries, k, **fb)
            state = self._scan_state()
            mk = None
            exact_args = None
            if slot_mask is not None:
                cap = int(state["valid"].shape[0])
                mk = np.asarray(slot_mask, dtype=bool)
                if mk.shape[0] < cap:
                    mk = np.concatenate(
                        [mk, np.zeros(cap - mk.shape[0], bool)])
                mk = mk[:cap]
                ne = min(cap, self._capacity)
                elig = np.nonzero(mk[:ne] & self._valid[:ne])[0]
                if elig.size == 0:
                    return [[] for _ in range(queries.shape[0])]
                if elig.size <= max(r, _MASKED_EXACT_MAX):
                    # selective filter: the masked scan's per-chunk
                    # approx selection buckets by POSITION, so eligible
                    # rows stored contiguously can collide into few
                    # buckets and silently under-return; this small an
                    # eligible set is exactly one host re-rank's worth
                    # of work, so scan nothing and answer exactly.
                    # Gather a consistent snapshot under the lock;
                    # compute outside it.
                    exact_args = (
                        np.ascontiguousarray(self._vectors[elig],
                                             np.float32),
                        self._id_of_slot[elig].copy())
                else:
                    state = dict(state)
                    state["valid"] = jnp.logical_and(state["valid"],
                                                     jnp.asarray(mk))
            # bound the stacked per-query device footprint per dispatch
            max_q = max(256, _pow2_floor(
                _CAND_BYTES // max(self._scan_bytes_per_query(r), 1)))
            tick0 = self._tick
            lv0 = self.slot_layout_version
            rr_rows = None
            if exact_args is None:
                if self._device_rerank_active():
                    # sync the f32 row mirror under the SAME lock hold as
                    # the codes sync above: rows and candidacy then form
                    # one consistent snapshot, so the device re-rank
                    # needs no per-slot mutation stamps — old candidacy
                    # meets old values by construction
                    rr_rows = self._sync_device()["db"]
                self._searches_in_flight += 1
        if exact_args is not None:
            return self._masked_exact_host(queries, k_req, *exact_args)
        try:
            import jax

            from ..utils.profiling import annotate
            q = queries.shape[0]
            svs, sls = [], []
            dev_out = []
            with annotate("vdb/pq.scan"):
                for a in range(0, q, max_q):
                    qb = queries[a:a + max_q]
                    q_pad = next_pow2(len(qb), floor=1)
                    if q_pad != len(qb):
                        qb = np.concatenate(
                            [qb, np.zeros((q_pad - len(qb), qb.shape[1]),
                                          np.float32)])
                    qb_dev = jnp.asarray(qb)
                    sv, sl = self._scan_call(state, qb_dev, r)
                    got = min(max_q, q - a)
                    if rr_rows is not None:
                        from ..ops.pq import pq_rerank_topk
                        with annotate("vdb/pq.rerank_dev"):
                            # state["valid"] already carries the filter
                            # mask when one was given
                            dv, ds = pq_rerank_topk(
                                qb_dev, rr_rows, sl, sv, state["valid"],
                                self._metric, k_req)
                        dev_out.append(
                            (np.asarray(jax.device_get(dv))[:got],
                             np.asarray(jax.device_get(ds))[:got],
                             sv, sl, got))
                    else:
                        svs.append(np.asarray(jax.device_get(sv))[:got])
                        sls.append(np.asarray(jax.device_get(sl))[:got])
        finally:
            with self._lock:
                self._searches_in_flight -= 1
        if rr_rows is not None:
            res = self._collect_device_rerank(queries, dev_out, k_req,
                                              tick0, lv0, mk)
        else:
            scan_scores = np.concatenate(svs)
            slots = np.concatenate(sls).astype(np.int64)
            with annotate("vdb/pq.rerank"):
                if self._rerank_venue() == "gathered":
                    res = self._rerank_gathered(queries, scan_scores,
                                                slots, k_req, tick0, lv0,
                                                slot_mask=mk)
                else:
                    res = self._rerank(queries, scan_scores, slots,
                                       k_req, tick0, lv0, slot_mask=mk)
        if res is not None and mk is not None:
            res = self._fill_masked_short(res, queries, k_req, mk, lv0)
        if res is not None:
            return res
        # the layout repacked mid-flight (e.g. an IVF retrain): the
        # candidate slots address the OLD packing — re-ranking would
        # read the wrong rows. Masked callers get the stale-mask
        # error the probed path raises (their mask was compiled
        # against the old layout too).
        if slot_mask is not None:
            from ..errors import StaleSlotMaskError
            raise StaleSlotMaskError(mask_layout_version,
                                     self.slot_layout_version)
        return self._pq_search(queries, k, refine, None, None)

    def _collect_device_rerank(self, queries: np.ndarray, dev_out,
                               k_req: int, tick0: int, lv0: int,
                               slot_mask: Optional[np.ndarray]
                               ) -> Optional[List[List[Tuple[int, float]]]]:
        """Map the device re-rank's (Q, k) results to ids. The device
        computed exact distances over the SNAPSHOT rows (synced with the
        codes under one lock hold), so values and candidacy are already
        consistent; what remains is the id mapping, which must not
        attribute a distance to a slot whose occupant changed after the
        snapshot. Slots mutated after ``tick0`` are dropped, and any
        query that lost results that way (rare: a concurrent write raced
        this search) is re-answered through the host re-rank over its
        full candidate pool, which the dispatch loop kept alive on
        device for exactly this repair."""
        import jax

        out: List[List[Tuple[int, float]]] = []
        a = 0
        for dv, ds, sv_dev, sl_dev, got in dev_out:
            sl = ds.astype(np.int64)
            with self._lock:
                if self.slot_layout_version != lv0:
                    return None
                ok = self._slot_tick[sl] <= tick0
                ok &= self._valid[sl]
                if slot_mask is not None:
                    ok &= slot_mask[sl]
                ids = self._id_of_slot[sl]
            finite = np.isfinite(dv)
            dropped = finite & ~ok
            fixed: dict = {}
            if dropped.any():
                qidx = np.nonzero(dropped.any(axis=1))[0]
                sv_h = np.asarray(jax.device_get(sv_dev))[:got]
                sl_h = np.asarray(
                    jax.device_get(sl_dev))[:got].astype(np.int64)
                rows = self._rerank(
                    np.ascontiguousarray(queries[a + qidx]),
                    sv_h[qidx], sl_h[qidx], k_req, tick0, lv0,
                    slot_mask=slot_mask)
                if rows is None:
                    return None
                fixed = dict(zip(qidx.tolist(), rows))
            for qi in range(got):
                if qi in fixed:
                    out.append(fixed[qi])
                    continue
                row: List[Tuple[int, float]] = []
                for j in range(dv.shape[1]):
                    if not finite[qi, j]:
                        break
                    row.append((int(ids[qi, j]), float(dv[qi, j])))
                out.append(row)
            a += got
        return out

    def _rerank_gathered(self, queries: np.ndarray,
                         scan_scores: np.ndarray, slots: np.ndarray,
                         k_req: int, tick0: int, lv0: int,
                         slot_mask: Optional[np.ndarray] = None
                         ) -> Optional[List[List[Tuple[int, float]]]]:
        """Pipelined gathered-device re-rank (venue "gathered"): per
        query block, the host gathers the candidate rows + consistency
        mask under the lock (the one part that must touch host state),
        submits the exact-distance + top-k program, and gathers the NEXT
        block while the device computes — disk IO and H2D/compute
        overlap instead of serializing with the host einsum/sort.

        Same contract as ``_rerank``: candidates mutated after ``tick0``
        are dropped (the ok mask the device receives), distances are
        exact f32 over the gathered snapshot rows, and the id mapping
        uses the ids gathered under the same lock hold as the rows —
        old candidacy meets old values by construction. Returns None if
        the slot layout repacked mid-flight.

        Blocks are padded to a fixed ``_RERANK_QBLOCK`` so every
        dispatch reuses ONE compiled signature per (r, k, metric)."""
        import jax

        from ..ops.pq import pq_rerank_gathered
        metric = self._metric
        q_total, r = slots.shape
        out: List[List[Tuple[int, float]]] = []
        pending: list = []            # (dists_dev, pos_dev, ids, got)

        def collect_one(entry) -> None:
            dv_dev, pos_dev, ids, got = entry
            dv = np.asarray(jax.device_get(dv_dev))[:got]
            pos = np.asarray(jax.device_get(pos_dev))[:got]
            for qi in range(got):
                row: List[Tuple[int, float]] = []
                for j in range(dv.shape[1]):
                    dvj = float(dv[qi, j])
                    if not np.isfinite(dvj):
                        break
                    row.append((int(ids[qi, pos[qi, j]]), dvj))
                out.append(row)

        blk = _RERANK_QBLOCK
        for a in range(0, q_total, blk):
            qb = queries[a:a + blk]
            sl = slots[a:a + blk]
            got = len(qb)
            with self._lock:
                if self.slot_layout_version != lv0:
                    return None
                ok = np.isfinite(scan_scores[a:a + blk])
                ok &= self._slot_tick[sl] <= tick0
                ok &= self._valid[sl]
                if slot_mask is not None:
                    ok &= slot_mask[sl]
                # THE disk gather (host_backing: page cache / disk) —
                # runs while the previous block computes on device
                rows = np.ascontiguousarray(self._vectors[sl],
                                            np.float32)
                ids = self._id_of_slot[sl]
            if got < blk:             # fixed jit signature: pad the tail
                pad = blk - got
                qb = np.concatenate(
                    [qb, np.zeros((pad, qb.shape[1]), np.float32)])
                rows = np.concatenate(
                    [rows, np.zeros((pad, r, rows.shape[2]),
                                    np.float32)])
                ok = np.concatenate([ok, np.zeros((pad, r), bool)])
            dv_dev, pos_dev = pq_rerank_gathered(
                jnp.asarray(qb), jnp.asarray(rows), jnp.asarray(ok),
                metric, k_req)
            pending.append((dv_dev, pos_dev, ids, got))
            if len(pending) >= 2:     # depth-2: one block in flight
                collect_one(pending.pop(0))
        for entry in pending:
            collect_one(entry)
        return out

    def _rerank(self, queries: np.ndarray, scan_scores: np.ndarray,
                slots: np.ndarray, k_req: int, tick0: int, lv0: int,
                slot_mask: Optional[np.ndarray] = None
                ) -> Optional[List[List[Tuple[int, float]]]]:
        """Exact f32 re-rank of the candidate slots on the true stored
        rows. Candidates whose slot mutated after the scan snapshot
        (stamp > tick0) are dropped, so results never mix old candidacy
        with new row values. ``slot_mask`` re-applies the filter per
        slot (defense in depth — the scan already masked on device; this
        keeps filter exactness independent of candidate granularity).

        The re-rank is the measured dominant cost of a PQ query (BLAS
        over Q*r gathered rows), so the lock is held only per-block for
        the snapshot gather — the einsum/sort run lock-free and
        concurrent searches/writers interleave between blocks. Each
        block re-checks the slot layout version under its lock; returns
        None if the layout repacked mid-rerank (caller restarts or
        raises the stale-mask error)."""
        out: List[List[Tuple[int, float]]] = []
        metric = self._metric
        for a in range(0, queries.shape[0], _RERANK_QBLOCK):
            qb = queries[a:a + _RERANK_QBLOCK]
            sl = slots[a:a + _RERANK_QBLOCK]
            with self._lock:
                if self.slot_layout_version != lv0:
                    return None
                ok = np.isfinite(scan_scores[a:a + _RERANK_QBLOCK])
                ok &= self._slot_tick[sl] <= tick0
                ok &= self._valid[sl]
                if slot_mask is not None:
                    ok &= slot_mask[sl]
                rows = self._vectors[sl]                  # (qb, r, d) copy
                ids = self._id_of_slot[sl]
            # everything below derives from the gathered ROW VALUES only
            # (not the stored sq-norm caches): recovery re-inserts rows
            # through a different bulk path whose cached norms can differ
            # in the last ulp, and PQ's recovery contract is bit-identical
            # results. The difference form also avoids the |q|^2+|x|^2-2qx
            # cancellation outright.
            if metric is DistanceMetric.EUCLIDEAN:
                diff = rows - qb[:, None, :]
                dist = np.sqrt(np.einsum("qrd,qrd->qr", diff, diff,
                                         optimize=True))
            elif metric is DistanceMetric.DOT_PRODUCT:
                dist = -np.einsum("qrd,qd->qr", rows, qb, optimize=True)
            else:
                dots = np.einsum("qrd,qd->qr", rows, qb, optimize=True)
                qn = np.sqrt(np.sum(qb * qb, axis=1))[:, None]
                xn = np.sqrt(np.einsum("qrd,qrd->qr", rows, rows,
                                       optimize=True))
                denom = np.maximum(qn * xn, 1e-30)
                dist = 1.0 - np.clip(dots / denom, -1.0, 1.0)
            dist = np.where(ok, dist, np.inf).astype(np.float32)
            order = np.argsort(dist, axis=1, kind="stable")[:, :k_req]
            for qi in range(len(qb)):
                row: List[Tuple[int, float]] = []
                for j in order[qi]:
                    dv = float(dist[qi, j])
                    if not np.isfinite(dv):
                        break
                    row.append((int(ids[qi, j]), dv))
                out.append(row)
        return out

    def _host_dists(self, qb: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """(q, d) x (c, d) -> (q, c) exact f32 distances in the same
        direct forms as the re-rank (metric parity, no |q|^2+|x|^2-2qx
        cancellation). Callers bound q*c*d to _HOST_DIST_BYTES."""
        metric = self._metric
        if metric is DistanceMetric.EUCLIDEAN:
            diff = rows[None, :, :] - qb[:, None, :]
            return np.sqrt(np.einsum("qcd,qcd->qc", diff, diff,
                                     optimize=True)).astype(np.float32)
        if metric is DistanceMetric.DOT_PRODUCT:
            return (-(qb @ rows.T)).astype(np.float32)
        dots = qb @ rows.T
        qn = np.sqrt(np.sum(qb * qb, axis=1))[:, None]
        xn = np.sqrt(np.einsum("cd,cd->c", rows, rows))[None, :]
        denom = np.maximum(qn * xn, 1e-30)
        return (1.0 - np.clip(dots / denom, -1.0, 1.0)).astype(np.float32)

    def _masked_exact_host(self, queries: np.ndarray, k_req: int,
                           rows: np.ndarray, ids: np.ndarray
                           ) -> List[List[Tuple[int, float]]]:
        """Exact host k-NN over a SMALL eligible row set (selective
        filters), gathered under the lock by the caller — correct by
        construction where the masked device scan could under-return,
        and cheaper than a device dispatch at this size."""
        out: List[List[Tuple[int, float]]] = []
        c, d = rows.shape
        qblk = max(1, min(_RERANK_QBLOCK,
                          _HOST_DIST_BYTES // max(c * d * 4, 1)))
        kk = min(k_req, c)
        for a in range(0, len(queries), qblk):
            dist = self._host_dists(queries[a:a + qblk], rows)
            order = np.argsort(dist, axis=1, kind="stable")[:, :kk]
            for qi in range(dist.shape[0]):
                out.append([(int(ids[j]), float(dist[qi, j]))
                            for j in order[qi]])
        return out

    def _fill_masked_short(self, res: List[List[Tuple[int, float]]],
                           queries: np.ndarray, k_req: int,
                           mk: np.ndarray, lv0: int
                           ) -> Optional[List[List[Tuple[int, float]]]]:
        """Safety net for masked scans: any query that came back with
        fewer than k results (positional bucket collisions in the
        per-chunk approx selection can starve the candidate pool even
        when plenty of eligible rows exist) is re-answered by an exact
        host stream over the eligible slots. Returns None when the slot
        layout repacked underneath (caller raises stale-mask)."""
        short = [qi for qi, row in enumerate(res) if len(row) < k_req]
        if not short:
            return res
        with self._lock:
            if self.slot_layout_version != lv0:
                return None
            ne = min(mk.shape[0], self._capacity)
            elig = np.nonzero(mk[:ne] & self._valid[:ne])[0]
            if elig.size == 0:
                return res
            fixed = self._masked_exact_stream(
                np.ascontiguousarray(queries[short]), k_req, elig)
        for qi, row in zip(short, fixed):
            if len(row) > len(res[qi]):
                res[qi] = row
        return res

    def _masked_exact_stream(self, qs: np.ndarray, k_req: int,
                             elig: np.ndarray
                             ) -> List[List[Tuple[int, float]]]:
        """Exact host k-NN streamed over a LARGE eligible slot set with
        a running top-k (lock held by the caller — the gather and the
        result must be one consistent snapshot)."""
        q = len(qs)
        best_d = np.full((q, k_req), np.inf, np.float32)
        best_i = np.full((q, k_req), -1, np.int64)
        for a in range(0, elig.size, _MASKED_STREAM_CHUNK):
            sl = elig[a:a + _MASKED_STREAM_CHUNK]
            rows = np.ascontiguousarray(self._vectors[sl], np.float32)
            ids = self._id_of_slot[sl]
            qblk = max(1, _HOST_DIST_BYTES // max(rows.size * 4, 1))
            for b in range(0, q, qblk):
                dist = self._host_dists(qs[b:b + qblk], rows)
                cat_d = np.concatenate([best_d[b:b + qblk], dist], axis=1)
                cat_i = np.concatenate(
                    [best_i[b:b + qblk],
                     np.broadcast_to(ids, dist.shape)], axis=1)
                sel = np.argpartition(cat_d, k_req - 1, axis=1)[:, :k_req]
                best_d[b:b + qblk] = np.take_along_axis(cat_d, sel, axis=1)
                best_i[b:b + qblk] = np.take_along_axis(cat_i, sel, axis=1)
        out: List[List[Tuple[int, float]]] = []
        for qi in range(q):
            pairs = sorted(
                (float(dv), int(iv))
                for dv, iv in zip(best_d[qi], best_i[qi])
                if np.isfinite(dv))
            out.append([(iv, dv) for dv, iv in pairs])
        return out

    def calibrate_refine(self, target_recall: float, *, k: int = 10,
                         sample: int = 256,
                         candidates=(16, 32, 64, 128, 256, 512),
                         queries: Optional[np.ndarray] = None,
                         set_default: bool = True, seed: int = 0) -> dict:
        """Pick the smallest refine pool whose measured recall@k meets
        ``target_recall`` — the PQ analogue of IvfFlatIndex's
        calibrate_nprobe (a production knob: "give me >=0.95 recall"
        instead of hand-tuning refine, which directly prices the host
        re-rank, the dominant query cost).

        Ground truth is an exact host stream over the live stored rows
        (ivf.py uses the device exact scan, but PQ exists precisely at
        scales where no full-precision device copy fits — host_backing
        memmaps stream fine). Probe queries default to a random sample
        of stored rows (slightly optimistic — a stored row's own code
        matches itself exactly; pass real ``queries`` for an unbiased
        estimate). Returns ``{"refine", "recall", "curve"}``; when no
        candidate reaches the target the largest is returned with its
        recall. ``set_default`` installs the winner."""
        if not 0.0 < float(target_recall) <= 1.0:
            raise IndexOpError("target_recall must be in (0, 1]")
        with self._lock:
            if not self._trained:
                if self._len < self.ksub:
                    raise IndexOpError(
                        "calibrate_refine needs a trained index "
                        f"(or >= ksub={self.ksub} rows to train one)")
                self.train()
        rng = np.random.default_rng(seed)
        with self._lock:
            live = np.flatnonzero(self._valid[:self._capacity])
            if queries is None:
                take = min(int(sample), live.size)
                sel = np.sort(rng.choice(live.size, size=take,
                                         replace=False))
                queries = np.ascontiguousarray(
                    self._vectors[live[sel]], np.float32)
            else:
                queries = np.ascontiguousarray(queries, np.float32)
            k_eff = min(int(k), self._len)
            truth = self._masked_exact_stream(queries, k_eff, live)
        truth_sets = [set(i for i, _ in row) for row in truth]
        curve: dict = {}
        chosen = None
        rmax = self._scan_r_max()
        for cand in sorted({max(1, min(int(c), rmax))
                            for c in candidates}):
            got = self.search_batch(queries, k_eff, refine=cand)
            hits = sum(len(ts & {i for i, _ in row}) / max(len(ts), 1)
                       for ts, row in zip(truth_sets, got))
            curve[cand] = recall = hits / max(len(truth_sets), 1)
            if recall >= float(target_recall):
                chosen = cand
                break
        if chosen is None:
            chosen = max(curve)
        if set_default:
            self.refine = int(chosen)
        return {"refine": int(chosen), "recall": curve[chosen],
                "curve": curve}

    def search_with_refine(self, query, k: int,
                           refine: int) -> List[Tuple[int, float]]:
        """Per-call recall/latency knob (the PQ analogue of HNSW's
        search_with_ef / IVF's search_with_nprobe): re-rank the top
        ``refine`` PQ candidates exactly. Passed through as an argument —
        mutating self.refine would race concurrent searches."""
        from ..vector import as_f32_array
        return self.search_batch(as_f32_array(query).reshape(1, -1), k,
                                 refine=int(refine))[0]


class PqFlatIndex(_PqCodesCore, FlatIndex):
    """Product-quantized flat index with exact host re-rank."""

    def __init__(self, metric: DistanceMetric, m: Optional[int] = None,
                 ksub: int = 256, refine: int = 64, train_iters: int = 15,
                 auto_train_min: int = 8192, seed: int = 0,
                 host_backing: Optional[str] = None,
                 scan_recall: float = 0.85, rotate: bool = True,
                 mesh=None, row_axis: str = "shard",
                 rerank: str = "auto"):
        # host_backing (FlatIndex option): keep the full-precision rows in
        # a disk-backed memmap — the natural pairing for PQ, whose device
        # footprint is m bytes/row while the re-rank touches only R rows
        # per query (OS page cache serves the hot set)
        # rotate: learn an OPQ pre-rotation at train time
        # (ops/pq.fit_opq_rotation) — better codes need a smaller refine
        # pool for the same recall, and the host re-rank (the measured
        # dominant query cost) is linear in refine
        # mesh: shard the CODE matrix over the mesh row axis — each shard
        # streams its block through the same decode-in-VMEM scan and the
        # merge is one exact top-r over the S*r pool; the exact host
        # re-rank is unchanged. Device residency per shard is m bytes/row
        # (v5e-8: 8x the one-chip PQ row ceiling — 268M rows at 768-d);
        # the exact-scan fallback (untrained / huge r) runs the sharded
        # f32 path.
        # rerank: venue for the exact candidate re-rank — "auto" runs it
        # on device (ops/pq.pq_rerank_topk) when the f32 rows are device-
        # resident on the TPU backend, host-NumPy otherwise (see _pq_init)
        super().__init__(metric, search_mode="exact", storage="f32",
                         host_backing=host_backing, mesh=mesh,
                         row_axis=row_axis)
        self._pq_init(m, ksub, refine, train_iters, auto_train_min, seed,
                      scan_recall, rotate=rotate, rerank=rerank)

    # -- training --------------------------------------------------------------

    def train(self) -> None:
        """Fit the subspace codebooks on the live rows and encode them.

        Unlike IVF training this never repacks slots: codes live beside
        the packed rows, so filter masks and slot ids stay valid."""
        with self._lock:
            n = self._len
            if n < self.ksub:
                raise IndexOpError(
                    f"need at least ksub={self.ksub} vectors to train PQ")
            d = self._dim
            m = self._resolve_m(d)
            live = np.nonzero(self._valid)[0]
            smax = min(live.size, _TRAIN_SAMPLE_MAX)
            if live.size > smax:
                sel = np.random.default_rng(self._seed).choice(
                    live, smax, replace=False)
                sample = self._vectors[np.sort(sel)]
            elif live.size == n and n and int(live[-1]) == n - 1:
                sample = self._vectors[:n]      # contiguous prefix: a view
            else:
                sample = self._vectors[live]
            rot = None
            if self._rotate:
                from ..ops.pq import fit_opq_rotation
                rot = fit_opq_rotation(sample, m)
            codebook = self._fit_codebook(sample, m, rot)

            self._m = m
            self._codebook = codebook
            self._codebook_dev = None
            self._rot = rot
            self._rot_dev = None
            self._codes = np.zeros((self._capacity, m), np.uint8)
            self._trained = True
            self._pq_dirty.clear()
            self._pq_full_reencode = True
            self._codes_dev = None
            self._pq_valid_dirty = True

    # -- persistence -----------------------------------------------------------

    def export_trained_state(self) -> Optional[dict]:
        """The codebook is the whole trained state: codes are a
        DETERMINISTIC function of (codebook, rows, backend) — every
        encode runs the one device program regardless of batch size (see
        _encode_rows) — so recovery re-encodes instead of persisting
        gigabytes of codes: reopen never retrains and search results are
        bit-identical on the same jax backend (engine.rs:44-73 parity,
        same contract as IVF's import)."""
        with self._lock:
            if not self._trained:
                return None
            state = {"codebook": self._codebook.copy(),
                     "ksub": np.int64(self.ksub)}
            if self._rot is not None:
                state["rotation"] = self._rot.copy()
            return state

    def import_trained_state(self, tables: dict) -> None:
        with self._lock:
            import ml_dtypes
            # idempotent for pq_fit output (already bf16 values); protects
            # the exact-decode invariant against hand-built codebooks
            cb = np.asarray(tables["codebook"], np.float32) \
                .astype(ml_dtypes.bfloat16).astype(np.float32)
            if cb.ndim != 3:
                raise IndexOpError("pq state: codebook must be 3-D")
            m, ksub, dsub = cb.shape
            if self._dim is not None and m * dsub != self._dim:
                raise IndexOpError(
                    f"pq state: codebook covers {m * dsub} dims, index "
                    f"holds {self._dim}")
            rot = tables.get("rotation")
            if rot is not None:
                rot = np.ascontiguousarray(rot, np.float32)
                if rot.shape != (m * dsub, m * dsub):
                    raise IndexOpError(
                        f"pq state: rotation shape {rot.shape} does not "
                        f"match dimension {m * dsub}")
            self._m = m
            self.ksub = ksub
            self._codebook = cb
            self._codebook_dev = None
            # self._rotate (the constructor's preference for FUTURE
            # trains) is deliberately NOT overwritten: importing a
            # rotation-less snapshot into a rotate=True index must not
            # silently drop OPQ from later retrains
            self._rot = rot
            self._rot_dev = None
            self._trained = True
            self._codes = np.zeros((self._capacity, m), np.uint8)
            self._pq_dirty.clear()
            self._pq_full_reencode = True
            self._codes_dev = None
            self._pq_valid_dirty = True
