"""StorageEngine: crash-safe database = VectorStore + WAL + snapshots.

Capability parity with reference src/persistence/engine.rs:15-228:
  * ``open``: mkdir, load snapshot, replay WAL on top (engine.rs:44-73)
  * WAL-first durable writes for insert/delete (engine.rs:107-160)
  * auto-checkpoint every ``checkpoint_interval`` WAL entries, default 1000
    (engine.rs:22-29, 199-204); checkpoint = snapshot save -> Checkpoint
    entry -> WAL truncate (engine.rs:187-196)
  * persistence is paired with the flat index (engine.rs:33)

Improvements over the reference (documented gaps in SURVEY §2 row 11):
  * metadata IS persisted, in both WAL entries and snapshots (the reference
    drops it: engine.rs:136-140, :224)
  * ``next_id`` is saved faithfully instead of ``store.len()``
    (engine.rs:226), so internal-ID monotonicity survives restarts
  * snapshot writes are atomic (tmp+rename+fsync)
  * recovery hydrates the packed device shard in one bulk transfer instead
    of row-at-a-time re-inserts
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

from ..distance import DistanceMetric
from ..errors import VectorNotFoundError
from ..metadata import Metadata
from ..store import BatchInsertItem, SearchResult, VectorStore
from ..vector import Vector
from .serialization import (WAL_CHECKPOINT, WAL_DELETE, WAL_INSERT,
                            DatabaseSnapshot, WalEntry)
from .snapshot import SnapshotManager
from .wal import WriteAheadLog

WAL_FILE = "wal.log"


class _ChunkedInserter:
    """Accumulate BatchInsertItems and flush them through the store's
    vectorized bulk path in fixed-size chunks — recovery applies rows
    ~100x faster than per-entry inserts while keeping peak memory at one
    chunk. Serves both recovery loops (WAL replay, snapshot stream)."""

    def __init__(self, store: VectorStore, chunk_size: int):
        self._store = store
        self._size = int(chunk_size)
        self._items: List[BatchInsertItem] = []

    def add(self, item: BatchInsertItem) -> None:
        self._items.append(item)
        if len(self._items) >= self._size:
            self.flush()

    def flush(self) -> None:
        if self._items:
            self._store.insert_batch(self._items)
            self._items = []


@dataclass
class EngineConfig:
    """Engine tuning (reference: engine.rs:15-29).

    ``index_type`` extends the reference (which hard-wires persistence to
    the flat index, engine.rs:33): "hnsw" additionally checkpoints the
    graph tables and "ivf" the trained cluster layout (centroids + slot
    assignment), so reopen restores the EXACT pre-crash index — no
    rebuild, no retrain, identical search results. ``mesh`` (a
    jax.sharding.Mesh) makes recovery hydrate the packed database directly
    into row-sharded device storage — the multi-chip resume path; it
    composes with index_type="flat" (any storage mode incl. int8) and
    "pq" (sharded codes).
    """
    checkpoint_interval: int = 1000
    metric: DistanceMetric = DistanceMetric.EUCLIDEAN
    index_type: str = "flat"   # "flat" | "hnsw" | "ivf" | "pq" | "ivfpq"
    hnsw_params: Optional[object] = None
    mesh: Optional[object] = None   # jax.sharding.Mesh for sharded storage
    search_mode: str = "exact"      # flat scan mode: "exact" | "fast"
    # flat/ivf vector storage mode ("f32" | "bf16" | "int8"): quantization
    # happens at insert and is IDEMPOTENT (pow2 scales / bf16 round-trip),
    # so WAL replay and snapshot re-insert reproduce the stored values
    # bit-exactly on recovery
    storage: str = "f32"


class StorageEngine:
    def __init__(self, data_dir: "str | Path", config: Optional[EngineConfig] = None):
        self.config = config or EngineConfig()
        self.data_dir = Path(data_dir)
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.snapshots = SnapshotManager(self.data_dir)
        self.wal = WriteAheadLog.open(self.data_dir / WAL_FILE)
        if self.config.mesh is not None and self.config.index_type in (
                "hnsw", "ivf", "ivfpq"):
            # a silently ignored mesh would read as sharded durability
            # without being one; only flat (f32/bf16/int8) and pq shard
            raise ValueError(
                f"index_type={self.config.index_type!r} does not "
                "support mesh= (sharded lanes: 'flat' and 'pq')")
        if self.config.index_type == "hnsw":
            from ..index.hnsw import HnswIndex, HnswParams
            params = self.config.hnsw_params or HnswParams()
            self.store = VectorStore.with_index(
                HnswIndex(self.config.metric, params))
        elif self.config.index_type == "ivf":
            from ..index.ivf import IvfFlatIndex
            self.store = VectorStore.with_index(
                IvfFlatIndex(self.config.metric,
                             storage=self.config.storage))
        elif self.config.index_type == "pq":
            if self.config.storage != "f32":
                raise ValueError(
                    "index_type='pq' owns its device representation "
                    "(codes); storage quantization modes do not compose")
            from ..index.pq import PqFlatIndex
            self.store = VectorStore.with_index(
                PqFlatIndex(self.config.metric, mesh=self.config.mesh))
        elif self.config.index_type == "ivfpq":
            if self.config.storage != "f32":
                raise ValueError(
                    "index_type='ivfpq' owns its device representation "
                    "(codes); storage quantization modes do not compose")
            from ..index.ivfpq import IvfPqIndex
            self.store = VectorStore.with_index(
                IvfPqIndex(self.config.metric))
        elif self.config.index_type == "flat":
            from ..index.flat import FlatIndex
            self.store = VectorStore.with_index(FlatIndex(
                self.config.metric, search_mode=self.config.search_mode,
                mesh=self.config.mesh, storage=self.config.storage))
        else:
            raise ValueError(
                f"unknown index_type: {self.config.index_type!r}")
        self._wal_count = 0
        self._recover()

    @classmethod
    def open(cls, data_dir: "str | Path",
             config: Optional[EngineConfig] = None) -> "StorageEngine":
        return cls(data_dir, config)

    # -- recovery (reference: engine.rs:44-104) ------------------------------

    def _recover(self) -> None:
        import os
        import sys
        import time as _time
        timing = bool(os.environ.get("VDB_RECOVER_TIMING"))
        t0 = _time.perf_counter()

        def _mark(label: str) -> None:
            if timing:
                print(f"[recover] {label}: "
                      f"{_time.perf_counter() - t0:.1f}s",
                      file=sys.stderr, flush=True)

        self._recover_mark = _mark
        self._hydrator = None
        if self.config.index_type in ("flat", "pq"):
            # streaming apply: the 10M x 768 lane — never materializes
            # the 30 GB payload or a 10M-element object list. PQ recovers
            # through the same path: its trained state is just the
            # codebook (installed below, after replay — codes re-encode
            # deterministically from the recovered rows)
            reader = self.snapshots.open_stream()
            if reader is not None:
                with reader:
                    self._apply_snapshot_stream(reader)
            self._recover_mark("snapshot applied")
        else:
            # hnsw/ivf import needs the whole snapshot (graph/layout
            # tables bind to the full id set); these families checkpoint
            # at far smaller row counts
            snap = self.snapshots.load()
            if snap is not None:
                if not (self._try_import_graph(snap)
                        or self._try_import_ivf(snap)
                        or self._try_import_ivfpq(snap)):
                    self._apply_snapshot(snap)
        # overlap device hydration with the WAL tail: the snapshot rows
        # (the bulk of the database) are final in host storage now, so
        # the multi-GB H2D transfers run on a side thread while the tail
        # replays host-side; rows the replay touches are re-scattered by
        # the first locked sync (FlatIndex.prehydrate)
        hydrator = None
        index = self.store.index
        if (self._hydrator is None
                and self.config.index_type == "flat" and len(self.store)
                and hasattr(index, "prehydrate")):
            import threading
            hydrator = threading.Thread(target=index.prehydrate,
                                        daemon=True)
            hydrator.start()
        # batch consecutive WAL inserts through the store's vectorized
        # bulk path (per-entry apply costs ~0.3 ms/row in slot writes —
        # almost an hour for a 10M-row log). Deletes flush the pending
        # chunk first so apply order is preserved exactly; within-chunk
        # duplicate ids keep upsert semantics because insert_batch
        # applies items sequentially.
        pending = _ChunkedInserter(self.store, self._APPLY_CHUNK)
        for entry in self.wal.iter_replay():
            if entry.kind == WAL_INSERT:
                pending.add(BatchInsertItem(
                    id=entry.string_id, vector=Vector(entry.data),
                    metadata=Metadata(entry.metadata)))
                self._wal_count += 1
            else:
                pending.flush()
                self._apply_wal_entry(entry)
        pending.flush()
        self._recover_mark("wal replayed")
        if self._hydrator is not None:
            installed = self._hydrator.finish()
            self._hydrator = None
            self._recover_mark(
                f"progressive hydration finished (installed={installed})")
        if hydrator is not None:
            hydrator.join()
            self._recover_mark("hydration joined")
        self._try_import_pq()

    GRAPH_FILE = "hnsw_graph.npz"
    IVF_FILE = "ivf_state.npz"
    PQ_FILE = "pq_state.npz"
    IVFPQ_FILE = "ivfpq_state.npz"

    def _graph_path(self) -> Path:
        return self.data_dir / self.GRAPH_FILE

    def _ivf_path(self) -> Path:
        return self.data_dir / self.IVF_FILE

    def _pq_path(self) -> Path:
        return self.data_dir / self.PQ_FILE

    def _ivfpq_path(self) -> Path:
        return self.data_dir / self.IVFPQ_FILE

    def _try_import_pq(self) -> bool:
        """Restore a trained PQ codebook so reopen never retrains. Unlike
        the HNSW/IVF tables the codebook is a pure quantizer — valid for
        ANY row set of the right dimension, with codes re-derived
        deterministically — so it needs no snapshot-digest binding, only
        metric + dimension agreement."""
        if self.config.index_type != "pq" or not self._pq_path().exists():
            return False
        try:
            import numpy as np
            with np.load(self._pq_path()) as z:
                tables = {key: z[key] for key in z.files}
            if str(tables.get("metric", "")) != self.config.metric.value:
                return False
            cb = np.asarray(tables["codebook"], np.float32)
            dim = self.store.dimension
            # an empty store fixes its dimension on first insert, so a
            # stale codebook of ANY other dimensionality would wedge
            # every later search (the index is "trained" and never
            # self-heals); with zero rows there is nothing to encode —
            # skip the import and let auto-train refit
            if dim is None:
                return False
            if cb.shape[0] * cb.shape[2] != dim:
                return False
            self.store.index.import_trained_state(tables)
            return True
        except Exception:
            return False  # stale/corrupt state: retrain on first search

    def _try_import_graph(self, snap: DatabaseSnapshot) -> bool:
        """Fast HNSW reopen: restore the serialized graph tables instead of
        re-inserting every row (O(read) vs O(rebuild)). Falls back to the
        rebuild path on any mismatch."""
        if self.config.index_type != "hnsw" or not self._graph_path().exists():
            return False
        try:
            import numpy as np
            from ..index.hnsw import HnswIndex
            index: HnswIndex = self.store.index
            with np.load(self._graph_path()) as z:
                tables = {key: z[key] for key in z.files}
            params = index.params
            if (int(tables["m"]) != params.m
                    or int(tables["m_max0"]) != params.m_max0
                    or int(tables["max_layers"]) != params.max_layers
                    or str(tables["metric"]) != self.config.metric.value):
                return False
            # the graph must belong to EXACTLY this snapshot: a crash
            # between the snapshot and graph writes (or an intervening
            # rebuild that remapped internal ids) leaves a stale graph
            # whose id set can still collide — the content digest cannot
            if str(tables.get("snapshot_digest", "")) != \
                    self._snapshot_digest():
                return False
            graph_ids = {int(i) for i in tables["id_of_slot"][
                np.asarray(tables["valid"], dtype=bool)]}
            snap_ids = {sv.internal_id for sv in snap.vectors}
            if graph_ids != snap_ids:
                return False
            index.graph.import_padded_tables(tables)
            self.store.adopt_index_state(
                {sv.internal_id: sv.string_id for sv in snap.vectors},
                snap.metadata, snap.next_id, snap.dimension)
            return True
        except Exception:
            return False  # any inconsistency -> rebuild from the snapshot

    def _try_import_ivf(self, snap: DatabaseSnapshot) -> bool:
        """Restore a trained IVF layout (centroids + slot assignment)
        instead of retraining on first search — recovery must reproduce
        the EXACT pre-crash search behavior (reference parity:
        engine.rs:44-73 replays to identical state)."""
        return self._try_import_layout(snap, "ivf", self._ivf_path())

    def _try_import_ivfpq(self, snap: DatabaseSnapshot) -> bool:
        """Same contract for IVF-PQ: layout tables + residual codebook +
        spill nearest-centroid ids; codes re-encode deterministically
        from the recovered rows."""
        return self._try_import_layout(snap, "ivfpq", self._ivfpq_path())

    def _try_import_layout(self, snap: DatabaseSnapshot, index_type: str,
                           path: Path) -> bool:
        if self.config.index_type != index_type or not path.exists():
            return False
        try:
            import numpy as np
            with np.load(path) as z:
                tables = {key: z[key] for key in z.files}
            if str(tables.get("metric", "")) != self.config.metric.value:
                return False
            # state must belong to EXACTLY this snapshot (same rationale
            # as the HNSW graph digest binding above)
            if str(tables.get("snapshot_digest", "")) != \
                    self._snapshot_digest():
                return False
            id_of_slot = np.asarray(tables["id_of_slot"], np.int64)
            state_ids = {int(i) for i in id_of_slot[id_of_slot >= 0]}
            snap_ids = {sv.internal_id for sv in snap.vectors}
            if state_ids != snap_ids:
                return False
            rows_by_id = {sv.internal_id: sv.data for sv in snap.vectors}
            self.store.index.import_trained_state(
                tables, rows_by_id, int(snap.dimension))
            self.store.adopt_index_state(
                {sv.internal_id: sv.string_id for sv in snap.vectors},
                snap.metadata, snap.next_id, snap.dimension)
            return True
        except Exception:
            return False  # any inconsistency -> rebuild from the snapshot

    _APPLY_CHUNK = 65536

    def _apply_snapshot_stream(self, reader) -> None:
        """Vectorized chunked restore from a SnapshotStreamReader (flat/
        pq lane): matrix chunks with their ORIGINAL internal ids go
        through the store's no-per-row-object fast path
        (restore_snapshot_chunk), and a pread readahead thread overlaps
        the disk IO with the Python decode walk (mmap page faults hold
        the GIL; pread does not). Bounded memory: one 64k-row chunk."""
        import threading
        stop = threading.Event()
        ra = threading.Thread(target=reader.readahead, args=(stop,),
                              daemon=True)
        ra.start()
        try:
            metadata = reader.read_metadata()
            self._recover_mark("metadata walk")
            if reader.count and reader.dimension:
                # one allocation up front: chunk-by-chunk growth costs
                # ~log2(n/chunk) pow2 doublings, each copying the whole
                # packed array (tens of GB of memcpy at 10M x 768)
                self.store.reserve(reader.count, reader.dimension)
                if self.config.index_type == "flat":
                    # mesh lane: shard pieces transfer under the apply's
                    # disk IO / decode (FlatIndex.start_progressive_
                    # hydration); non-mesh keeps the post-apply thread
                    start = getattr(self.store.index,
                                    "start_progressive_hydration", None)
                    if start is not None:
                        self._hydrator = start(reader.count)
            applied = 0
            t_decode = t_apply = 0.0
            import time as _t
            t_mark = _t.perf_counter()
            for iids, sids, rows in reader.vector_chunks(
                    self._APPLY_CHUNK):
                now = _t.perf_counter()
                t_decode += now - t_mark
                self.store.restore_snapshot_chunk(iids, sids, rows,
                                                  metadata)
                t_mark = _t.perf_counter()
                t_apply += t_mark - now
                applied += len(iids)
                if self._hydrator is not None:
                    self._hydrator.advance(applied)
            self._recover_mark(
                f"apply split: decode+IO {t_decode:.0f}s / "
                f"store-apply {t_apply:.0f}s")
        finally:
            stop.set()
            ra.join()
        self.store.restore_next_internal_id(reader.next_id)

    def _apply_snapshot(self, snap: DatabaseSnapshot) -> None:
        items = [
            BatchInsertItem(
                id=sv.string_id,
                vector=Vector(sv.data),
                metadata=Metadata(snap.metadata.get(sv.internal_id) or {}),
            )
            for sv in snap.vectors
        ]
        if items:
            self.store.insert_batch(items)
        # preserve internal-ID monotonicity across restarts
        self.store.restore_next_internal_id(snap.next_id)

    def _apply_wal_entry(self, entry: WalEntry) -> None:
        if entry.kind == WAL_INSERT:
            self.store.insert_with_metadata(
                entry.string_id, Vector(entry.data), Metadata(entry.metadata))
            self._wal_count += 1
        elif entry.kind == WAL_DELETE:
            try:
                self.store.delete(entry.string_id)
            except VectorNotFoundError:
                pass  # the logged delete may have failed at runtime too
            self._wal_count += 1
        elif entry.kind == WAL_CHECKPOINT:
            pass

    # -- durable writes (reference: engine.rs:107-160) -----------------------

    def insert(self, id: str, vector: Vector) -> None:
        self.insert_with_metadata(id, vector, Metadata())

    def insert_with_metadata(self, id: str, vector: Vector,
                             metadata: Metadata) -> None:
        # validate BEFORE logging: a WAL entry the store would reject would
        # abort every future recovery (the store re-raises during replay)
        expected = self.store.dimension
        if expected is not None and vector.dimension != expected:
            from ..errors import DimensionMismatchError
            raise DimensionMismatchError(expected, vector.dimension)
        internal_id = self.store.next_internal_id
        self.wal.append(WalEntry.insert(str(id), internal_id,
                                        vector.as_array(), metadata.fields()))
        self._wal_count += 1
        self.store.insert_with_metadata(id, vector, metadata)
        self._maybe_checkpoint()

    def insert_batch(self, items: List[BatchInsertItem]) -> None:
        """Durable bulk insert: one group-committed WAL write (single
        fsync), then one batched store apply. Dimensions are validated
        before logging so the WAL never records entries the store would
        reject — replay and runtime state stay identical."""
        expected = self.store.dimension
        accepted: List[BatchInsertItem] = []
        error = None
        for item in items:
            dim = item.vector.dimension
            if expected is None:
                expected = dim
            elif dim != expected:
                from ..errors import DimensionMismatchError
                error = DimensionMismatchError(expected, dim)
                break
            accepted.append(item)
        if accepted:
            base = self.store.next_internal_id
            entries = [
                WalEntry.insert(str(item.id), base + i,
                                item.vector.as_array(),
                                item.metadata.fields())
                for i, item in enumerate(accepted)
            ]
            self.wal.append_batch(entries)
            self._wal_count += len(entries)
            self.store.insert_batch(accepted)
            self._maybe_checkpoint()
        if error is not None:
            raise error

    def delete(self, id: str) -> Vector:
        self.wal.append(WalEntry.delete(str(id)))
        self._wal_count += 1
        removed = self.store.delete(id)
        self._maybe_checkpoint()
        return removed

    # -- reads (proxied to the store) ----------------------------------------
    # The full VectorStore read surface is exposed so the engine can sit
    # directly behind the HTTP AppState (durable serving via
    # ``serve --durable-dir`` — beyond the reference, whose server cannot
    # persist: main.rs:100-102 rejects serve + --data-dir).

    def search(self, query: Vector, k: int, *, ef: Optional[int] = None,
               nprobe: Optional[int] = None,
               refine: Optional[int] = None,
               filter=None) -> List[SearchResult]:
        return self.store.search(query, k, ef=ef, nprobe=nprobe,
                                 refine=refine, filter=filter)

    def search_with_filter(self, query: Vector, k: int, filter, *,
                           ef: Optional[int] = None,
                           nprobe: Optional[int] = None,
                           refine: Optional[int] = None
                           ) -> List[SearchResult]:
        return self.store.search_with_filter(query, k, filter, ef=ef,
                                             nprobe=nprobe, refine=refine)

    def search_radius(self, query: Vector, radius: float, *,
                      limit: int = 100, filter=None) -> List[SearchResult]:
        return self.store.search_radius(query, radius, limit=limit,
                                        filter=filter)

    def search_batch(self, queries, *, ef: Optional[int] = None,
                     nprobe: Optional[int] = None,
                     refine: Optional[int] = None):
        return self.store.search_batch(queries, ef=ef, nprobe=nprobe,
                                       refine=refine)

    def search_batch_submit(self, queries, *, ef: Optional[int] = None,
                            nprobe: Optional[int] = None,
                            refine: Optional[int] = None):
        return self.store.search_batch_submit(queries, ef=ef,
                                              nprobe=nprobe, refine=refine)

    def search_batch_with_filter(self, queries, filter, *,
                                 ef: Optional[int] = None,
                                 nprobe: Optional[int] = None,
                                 refine: Optional[int] = None):
        return self.store.search_batch_with_filter(
            queries, filter, ef=ef, nprobe=nprobe, refine=refine)

    @property
    def metric(self) -> DistanceMetric:
        return self.store.metric

    @property
    def dimension(self) -> Optional[int]:
        return self.store.dimension

    def get(self, id: str) -> Optional[Vector]:
        return self.store.get(id)

    def get_metadata(self, id: str) -> Optional[Metadata]:
        return self.store.get_metadata(id)

    def __len__(self) -> int:
        return len(self.store)

    def is_empty(self) -> bool:
        return self.store.is_empty()

    def list_ids(self) -> List[str]:
        return self.store.list_ids()

    # -- checkpointing (reference: engine.rs:187-228) ------------------------

    def _maybe_checkpoint(self) -> None:
        if self._wal_count < self.config.checkpoint_interval:
            return
        try:
            self.checkpoint()
        except Exception as e:
            # A failed auto-checkpoint must not surface as a failed
            # write: by the time we get here the WAL append and the
            # store apply already succeeded, so the row IS durable —
            # recovery replays the (uncompacted) WAL. Warn, skip the
            # compaction, and retry after another full interval so a
            # persistent fault (e.g. a desynced id map aborting the
            # stream writer) cannot turn every subsequent insert into
            # an O(N) failed snapshot attempt. An EXPLICIT checkpoint()
            # call still raises.
            import warnings
            warnings.warn(
                f"auto-checkpoint failed ({e!r}); the write is durable "
                f"in the WAL; retrying after the next "
                f"{self.config.checkpoint_interval} entries")
            self._wal_count = 0

    def checkpoint(self) -> None:
        self._save_snapshot_stream()
        self._save_graph()
        self._save_ivf()
        self._save_pq()
        self.wal.append(WalEntry.checkpoint())
        self.wal.truncate()
        self._wal_count = 0

    def _save_snapshot_stream(self) -> None:
        """Stream the snapshot straight from the index to disk (same bytes
        as the materialized path, ~64 MB peak instead of 2x payload —
        checkpointing a 10M x 768 store was an OOM before this)."""
        id_map = self.store.internal_to_string_ids()
        metadata: dict = {}

        def rows():
            for internal_id, vector in self.store.index.iter_items():
                string_id = id_map.get(internal_id)
                if string_id is None:
                    # out-of-sync id map: yields fewer rows than the
                    # header count, so the writer aborts (and the tmp
                    # file is discarded) instead of persisting a
                    # corrupt snapshot
                    continue
                meta = self.store.get_metadata(string_id)
                if meta is not None and not meta.is_empty():
                    metadata[internal_id] = meta.fields()
                yield internal_id, string_id, vector.as_array()

        self.snapshots.save_stream(rows(), metadata,
                                   self.store.next_internal_id,
                                   self.store.dimension, len(self.store))

    def _snapshot_digest(self) -> str:
        import hashlib
        h = hashlib.sha256()
        try:
            with open(self.snapshots.snapshot_path, "rb") as f:
                while True:
                    blk = f.read(64 << 20)
                    if not blk:
                        return h.hexdigest()
                    h.update(blk)
        except OSError:
            return ""

    def _save_graph(self) -> None:
        """Serialize the HNSW graph tables beside the snapshot so reopen
        can import instead of rebuilding."""
        if self.config.index_type != "hnsw":
            return
        import io

        import numpy as np

        from .snapshot import _durable_write
        index = self.store.index
        tables = index.graph.export_padded_tables()
        params = index.params
        buf = io.BytesIO()
        np.savez(buf, m=params.m, m_max0=params.m_max0,
                 max_layers=params.max_layers,
                 metric=self.config.metric.value,
                 snapshot_digest=self._snapshot_digest(), **tables)
        _durable_write(self._graph_path(), buf.getvalue())

    def _save_ivf(self) -> None:
        """Serialize the trained IVF layout (centroids + slot assignment;
        tiny next to the vectors) beside the snapshot so reopen restores
        it instead of retraining. The same path serializes IVF-PQ state
        (layout tables + residual codebook + spill cids)."""
        if self.config.index_type == "ivf":
            path = self._ivf_path()
        elif self.config.index_type == "ivfpq":
            path = self._ivfpq_path()
        else:
            return
        state = self.store.index.export_trained_state()
        if state is None:
            # untrained: remove any stale file so recovery can't bind a
            # previous layout to a newer snapshot
            path.unlink(missing_ok=True)
            return
        import io

        import numpy as np

        from .snapshot import _durable_write
        buf = io.BytesIO()
        np.savez(buf, metric=self.config.metric.value,
                 snapshot_digest=self._snapshot_digest(), **state)
        _durable_write(path, buf.getvalue())

    def _save_pq(self) -> None:
        """Serialize the trained PQ codebook (a few hundred KB) beside the
        snapshot so reopen re-encodes instead of retraining."""
        if self.config.index_type != "pq":
            return
        state = self.store.index.export_trained_state()
        if state is None:
            self._pq_path().unlink(missing_ok=True)
            return
        import io

        import numpy as np

        from .snapshot import _durable_write
        buf = io.BytesIO()
        np.savez(buf, metric=self.config.metric.value, **state)
        _durable_write(self._pq_path(), buf.getvalue())

    def close(self) -> None:
        self.wal.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


__all__ = ["StorageEngine", "EngineConfig", "WAL_FILE"]
