"""IVF-PQ: inverted-file layout + product-quantized RESIDUAL codes.

The clustered-data accuracy lane of the PQ family (both beyond the
reference, which ships flat + HNSW — src/lib.rs:30-47). Plain PQ
(index/pq.py) quantizes raw rows: on hard-clustered data the rows of a
tight cluster differ only by deviations that sit below global
quantization resolution, so their codes TIE and recall plateaus
regardless of the refine budget (measured ~0.55 at 1M x 768
hard-clustered, benchmarks/pq_bench.py --data clustered). IVF-PQ
re-centers the codebook on exactly those deviations: rows encode as
``x ~= c + r_hat`` where ``c`` is the owning IVF cluster's centroid and
``r_hat`` the PQ-decoded residual.

Composition (everything reused, nothing re-implemented):

* ``IvfFlatIndex`` provides training (MXU k-means + balanced
  assignment), the cluster-contiguous slot repack, post-train write
  routing (cluster free slots -> spill -> retrain), and the trained-
  layout persistence contract.
* ``_PqCodesCore`` (index/pq.py) provides code storage + device sync,
  encode paths, mutation stamps, the scan dispatch loop, and the exact
  host re-rank (returned distances are exact f32 over the true stored
  rows; recall is governed by ``refine``).
* ``ops/pq.ivfpq_scan_topr`` is the device program: a streaming
  residual-corrected scan that exploits the IVF layout — each cluster's
  ``q . c`` is computed once in a hoisted (Q, nlist) matmul and reused
  by all of its rows, so the residual correction adds ~no MXU work.

Unlike IvfFlatIndex, search does NOT probe (the scan streams all codes:
at m bytes/row the full pass is cheap and recall never depends on
cluster routing); ``nprobe`` therefore does not apply — ``refine`` is
the recall knob. Unlike PqFlatIndex, training REPACKS slots
(slot_layout_version bumps), and searches racing a retrain re-run over
the new layout.

Scale envelope: device codes are m bytes/row, but TRAINING ships the
f32 rows to the device once for assignment, so the practical one-chip
ceiling is the f32 training pass (~4M x 768), not the code storage.
The >16M-row capacity lane remains plain PQ; pairing residual coding
with storage-composed training is a known next step.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..distance import DistanceMetric
from ..errors import IndexOpError
from .flat import FlatIndex
from .ivf import SUB, IvfFlatIndex
from .pq import _MAX_REFINE, _ONEHOT_BYTES, _SCAN_CHUNK, _PqCodesCore

# host-vs-device threshold for nearest-centroid resolution (FLOP-ish:
# rows * nlist * d); single-row writes stay host, bulk goes device
_NEAREST_HOST_MAX = 1 << 28


def _round_bf16(arr: np.ndarray) -> np.ndarray:
    import ml_dtypes
    return np.asarray(arr, np.float32).astype(
        ml_dtypes.bfloat16).astype(np.float32)


class IvfPqIndex(_PqCodesCore, IvfFlatIndex):
    """IVF-repacked layout + PQ residual codes + exact host re-rank."""

    # the scan streams ALL clusters — nprobe does not exist here; the
    # store's knob validation keys off attribute presence
    search_with_nprobe = None
    calibrate_nprobe = None

    def __init__(self, metric: DistanceMetric, nlist: Optional[int] = None,
                 m: Optional[int] = None, ksub: int = 256,
                 refine: int = 64, train_iters: int = 12,
                 spill_frac: float = 0.02, auto_train_min: int = 8192,
                 seed: int = 0, scan_recall: float = 0.85,
                 assign_mode: str = "auto",
                 balance_slack: float = 1.5, rotate: bool = True,
                 rerank: str = "auto"):
        # rotate: learn an OPQ pre-rotation on the RESIDUAL sample
        # (ops/pq.fit_opq_rotation) and run the whole scan in the rotated
        # space — codes approximate rotated residuals, the scan's
        # centroid table is the rotated (bf16-rounded) one, queries
        # rotate at scan entry. Distances are rotation-invariant, so
        # candidates carry over; the exact host re-rank always uses the
        # true unrotated rows. Residual deviations on clustered data are
        # exactly where balanced subspace energy pays (round-2 verdict
        # item 3); A/B via benchmarks/pq_bench.py --family ivfpq --opq.
        super().__init__(metric, nlist=nlist, train_iters=train_iters,
                         spill_frac=spill_frac,
                         auto_train_min=auto_train_min, seed=seed,
                         storage="f32", assign_mode=assign_mode,
                         balance_slack=balance_slack)
        self._pq_init(m, ksub, refine, train_iters, auto_train_min, seed,
                      scan_recall, rotate=rotate, rerank=rerank)
        # nearest-centroid ids for SPILL slots (residuals there are taken
        # vs the row's nearest centroid — the assigned-cluster equivalent
        # does not exist); -1 = unresolved, filled lazily at encode time
        self._spill_cid: Optional[np.ndarray] = None
        self._cid_sp_dev = None
        self._cid_sp_dirty = True
        self._cents_scan_host: Optional[np.ndarray] = None
        self._cents_scan_dev = None
        self._csq_dev = None

    # -- geometry helpers ------------------------------------------------------

    def _scan_cents(self) -> np.ndarray:
        """The centroid table the SCAN reconstructs against: the
        bf16-rounded ROTATED centroids under OPQ (the unrotated bf16
        table otherwise). Residuals are computed vs THIS table so
        ``x_hat = c_scan + decode(code)`` carries no per-cluster
        c@R - bf16(c@R) bias (code-review finding, round 3). Derived
        deterministically from (centroids, rotation), so recovery
        rebuilds it bit-identically without persisting it."""
        if self._cents_scan_host is None:
            c = self._centroids
            if self._rot is not None:
                c = _round_bf16(
                    c.astype(np.float32) @ self._rot)
            self._cents_scan_host = np.ascontiguousarray(c, np.float32)
        return self._cents_scan_host

    def _encode_rot(self):
        # residuals are pre-rotated on host vs the scan table — the
        # device encode program must NOT rotate again
        return None

    @property
    def _span(self) -> int:
        return self._t_c * SUB

    @property
    def _spill_base(self) -> int:
        return self._nlist * self._span

    def _nearest_cids(self, rows: np.ndarray) -> np.ndarray:
        """Nearest (rounded) centroid per row; host BLAS for small
        batches, chunked device argmin for bulk."""
        n = len(rows)
        c = self._centroids
        if n * c.shape[0] * c.shape[1] <= _NEAREST_HOST_MAX:
            csq = np.sum(c * c, axis=1)
            out = np.empty(n, np.int32)
            for a in range(0, n, 8192):
                blk = np.ascontiguousarray(rows[a:a + 8192], np.float32)
                sc = csq[None, :] - 2.0 * (blk @ c.T)
                out[a:a + len(blk)] = np.argmin(sc, axis=1)
            return out
        import jax
        from ..ops.ivf import _assign_topk_chunk
        from ..ops.topk import next_pow2
        if self._centroids_dev is None:
            self._centroids_dev = jnp.asarray(self._centroids)
        out = np.empty(n, np.int32)
        chunk = 1 << 16
        for a in range(0, n, chunk):
            blk = np.ascontiguousarray(rows[a:a + chunk], np.float32)
            bn = len(blk)
            pad = next_pow2(max(bn, 256)) - bn
            if pad:
                blk = np.concatenate(
                    [blk, np.zeros((pad, blk.shape[1]), np.float32)])
            pref = _assign_topk_chunk(jnp.asarray(blk),
                                      self._centroids_dev, 1)
            out[a:a + bn] = np.asarray(jax.device_get(pref))[:bn, 0]
        return out

    # -- training --------------------------------------------------------------

    def train(self) -> None:
        """IVF repack (cluster-contiguous slots) + residual codebook fit.

        One call trains both stages, so ``_trained`` means "layout AND
        codebook ready". If the codebook fit fails the index stays
        correct but degraded: searches fall back to the exact flat scan
        over the repacked layout (the validity mask is intact)."""
        with self._lock:
            IvfFlatIndex.train(self)          # repack; bumps layout_version
            self._trained = False             # not PQ-searchable yet
            # bf16-round the centroids (they are arbitrary, so this is
            # free) — makes the scan's centroid terms exact in bf16
            # arithmetic, the same invariant as the codewords
            self._centroids = _round_bf16(self._centroids)
            self._centroids_dev = None
            self._cents_scan_dev = None
            self._cents_scan_host = None
            # repack rewrote every slot: fresh stamps at a new tick so
            # in-flight searches drop all stale candidates
            self._tick += 1
            self._slot_tick = np.full(self._capacity, self._tick, np.int64)

            d = self._dim
            m = self._resolve_m(d)
            live = np.nonzero(self._valid)[0]
            sb = self._spill_base
            self._spill_cid = np.full(self._capacity - sb, -1, np.int32)
            self._cid_sp_dirty = True
            sp_live = live[live >= sb]
            if sp_live.size:
                self._spill_cid[sp_live - sb] = self._nearest_cids(
                    self._vectors[sp_live])

            from .pq import _TRAIN_SAMPLE_MAX
            smax = min(live.size, _TRAIN_SAMPLE_MAX)
            if live.size > smax:
                sel = np.sort(np.random.default_rng(self._seed).choice(
                    live, smax, replace=False))
            else:
                sel = live
            rows = self._vectors[sel].astype(np.float32)
            cids = np.where(sel < sb, sel // self._span, 0).astype(np.int64)
            sp = sel >= sb
            if sp.any():
                cids[sp] = self._spill_cid[sel[sp] - sb]
            res = rows - self._centroids[cids]
            rot = None
            if self._rotate:
                # OPQ on the residual distribution (NOT the raw rows —
                # the codebook models residuals, so residual energy is
                # what the subspaces must balance)
                from ..ops.pq import fit_opq_rotation
                rot = fit_opq_rotation(res, m)
            self._rot = rot
            self._rot_dev = None
            self._cents_scan_host = None
            if rot is not None:
                # fit (and later encode) residuals in the SCAN's basis:
                # rotated rows minus the bf16-rounded rotated centroid
                # table — see _scan_cents
                res = rows @ rot - self._scan_cents()[cids]
            codebook = self._fit_codebook(res, m)

            self._m = m
            self._codebook = codebook
            self._codebook_dev = None
            self._codes = np.zeros((self._capacity, m), np.uint8)
            self._pq_dirty.clear()
            self._pq_full_reencode = True
            self._codes_dev = None
            self._pq_valid_dirty = True
            self._trained = True

    # -- encoding (residuals) ---------------------------------------------------

    def _encode_slots(self, slots: np.ndarray) -> np.ndarray:
        slots = np.asarray(slots, np.int64)
        sb = self._spill_base
        cids = np.where(slots < sb, slots // self._span, 0).astype(np.int64)
        sp = np.nonzero(slots >= sb)[0]
        if sp.size:
            spi = slots[sp] - sb
            unknown = self._spill_cid[spi] < 0
            if unknown.any():
                rows_u = self._vectors[slots[sp[unknown]]]
                self._spill_cid[spi[unknown]] = self._nearest_cids(rows_u)
                self._cid_sp_dirty = True
            cids[sp] = self._spill_cid[spi]
        rows = self._vectors[slots].astype(np.float32)
        if self._rot is not None:
            # the scan's basis (see _scan_cents): rotate, then subtract
            # the table the scan adds back
            res = rows @ self._rot - self._scan_cents()[cids]
        else:
            res = rows - self._centroids[cids]
        return self._encode_rows(res)

    # -- mutation hooks (spill-cid hygiene) --------------------------------------

    def _write_slot(self, slot: int, internal_id: int,
                    arr: np.ndarray) -> None:
        if self._trained and slot >= self._spill_base:
            self._spill_cid[slot - self._spill_base] = -1
            self._cid_sp_dirty = True
        super()._write_slot(slot, internal_id, arr)

    def _clear_slot(self, slot: int) -> None:
        if self._trained and slot >= self._spill_base:
            self._spill_cid[slot - self._spill_base] = -1
            self._cid_sp_dirty = True
        super()._clear_slot(slot)

    # -- device sync --------------------------------------------------------------

    def _pq_sync(self):
        out = super()._pq_sync()
        if self._cents_scan_dev is None:
            # the scan runs in the OPQ-rotated space when a rotation is
            # trained; _scan_cents is the one table both the encode-time
            # residuals and the scan reconstruction share
            cents = self._scan_cents()
            self._cents_scan_dev = jnp.asarray(cents)
            self._csq_dev = jnp.asarray(np.sum(
                cents * cents, axis=1, dtype=np.float32))
        if self._cid_sp_dirty or self._cid_sp_dev is None:
            self._cid_sp_dev = jnp.asarray(self._spill_cid)
            self._cid_sp_dirty = False
        return out

    # -- scan dispatch -------------------------------------------------------------

    def _scan_cpc(self) -> int:
        """Clusters per scan chunk: target ~_SCAN_CHUNK rows, bounded by
        the one-hot VMEM budget."""
        budget_rows = max(1, _ONEHOT_BYTES // (self._m * self.ksub * 2))
        cpc = max(1, min(_SCAN_CHUNK, budget_rows) // self._span)
        return min(cpc, self._nlist)

    def _scan_r_max(self) -> int:
        return min(self._scan_cpc() * self._span, _MAX_REFINE)

    def _scan_pool_cols(self, r: int) -> int:
        nchunks = -(-self._nlist // self._scan_cpc())     # main + tail
        return (nchunks + 1) * r                          # + spill

    def _scan_bytes_per_query(self, r: int) -> int:
        s_rows = self._capacity - self._spill_base
        # stacked candidates + the hoisted (Q, nlist) q.c table + the
        # dense (Q, S) spill score block
        return self._scan_pool_cols(r) * 8 + (self._nlist + s_rows) * 4

    def _scan_state(self) -> dict:
        codes, bd, cnorm, valid = self._pq_sync()
        return {"codes": codes, "bd": bd, "cnorm": cnorm, "valid": valid,
                "cents": self._cents_scan_dev, "csq": self._csq_dev,
                "cid_sp": self._cid_sp_dev, "span": self._span,
                "nlist": self._nlist, "cpc": self._scan_cpc()}

    def _scan_call(self, state: dict, qb, r: int):
        from ..ops.pq import _use_pallas_decode, ivfpq_scan_topr
        return ivfpq_scan_topr(qb, state["codes"], state["bd"],
                               state["cnorm"], state["valid"],
                               state["cents"], state["csq"],
                               state["cid_sp"], self._metric, r=r,
                               cpc=state["cpc"], span=state["span"],
                               nlist=state["nlist"],
                               recall_target=self.scan_recall,
                               rot=self._rot_dev_arr(),
                               pallas_decode=_use_pallas_decode(
                                   self._capacity, self._m,
                                   state["cpc"] * state["span"]))

    def _pq_fallback_search(self, queries: np.ndarray, k: int, **fb):
        # bypass IvfFlatIndex's path entirely: its probed refine gathers
        # f32 rows (defeating the code-only device residency) and its
        # auto-train would leave the PQ codebook behind. The exact flat
        # scan over the current layout is always correct.
        return FlatIndex.search_batch(self, queries, k, **fb)

    # -- trained-state persistence (engine checkpoint/recovery) --------------

    def export_trained_state(self) -> Optional[dict]:
        """IVF layout tables + the residual codebook + the spill rows'
        nearest-centroid ids. Codes are a deterministic function of
        (codebook, centroids, rows, spill cids), so recovery re-encodes
        instead of persisting gigabytes of codes — reopen never retrains
        and search results are bit-identical (the spill cids are
        persisted rather than recomputed because host-BLAS and device
        argmin can break distance ties differently)."""
        with self._lock:
            if not self._trained:
                return None
            tables = IvfFlatIndex.export_trained_state(self)
            tables["codebook"] = self._codebook.copy()
            tables["ksub"] = np.int64(self.ksub)
            tables["spill_cid"] = self._spill_cid.copy()
            if self._rot is not None:
                tables["rotation"] = self._rot.copy()
            return tables

    def import_trained_state(self, tables: dict,
                             rows_by_id: dict, dim: int) -> None:
        with self._lock:
            IvfFlatIndex.import_trained_state(self, tables, rows_by_id,
                                              dim)
            self._trained = False
            self._centroids = _round_bf16(self._centroids)
            self._centroids_dev = None
            self._cents_scan_dev = None
            self._tick += 1
            self._slot_tick = np.full(self._capacity, self._tick, np.int64)

            import ml_dtypes
            cb = np.asarray(tables["codebook"], np.float32) \
                .astype(ml_dtypes.bfloat16).astype(np.float32)
            if cb.ndim != 3:
                raise IndexOpError("ivfpq state: codebook must be 3-D")
            m, ksub, dsub = cb.shape
            if m * dsub != dim:
                raise IndexOpError(
                    f"ivfpq state: codebook covers {m * dsub} dims, "
                    f"snapshot holds {dim}")
            spill_cid = np.asarray(tables["spill_cid"], np.int32).copy()
            if spill_cid.shape[0] != self._capacity - self._spill_base:
                raise IndexOpError(
                    "ivfpq state: spill_cid/layout size mismatch")
            rot = tables.get("rotation")
            if rot is not None:
                rot = np.ascontiguousarray(rot, np.float32)
                if rot.shape != (dim, dim):
                    raise IndexOpError(
                        f"ivfpq state: rotation shape {rot.shape} does "
                        f"not match dimension {dim}")
            # _rotate (future-train preference) deliberately untouched —
            # importing a rotation-less snapshot must not silently drop
            # OPQ from later retrains (code-review finding, round 3)
            self._rot = rot
            self._rot_dev = None
            self._cents_scan_host = None
            self._spill_cid = spill_cid
            self._cid_sp_dirty = True
            self._m = m
            self.ksub = ksub
            self._codebook = cb
            self._codebook_dev = None
            self._codes = np.zeros((self._capacity, m), np.uint8)
            self._pq_dirty.clear()
            self._pq_full_reencode = True
            self._codes_dev = None
            self._pq_valid_dirty = True
            self._trained = True

    def search(self, query, k: int) -> List[Tuple[int, float]]:
        from ..vector import as_f32_array
        return self.search_batch(as_f32_array(query).reshape(1, -1), k)[0]


__all__ = ["IvfPqIndex"]
