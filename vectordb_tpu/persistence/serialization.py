"""Binary and JSON codecs for persisted state.

Capability parity with reference src/persistence/serialization.rs:9-52
(``SerializedVector``, ``DatabaseSnapshot``, bincode + JSON helpers). The
byte format is our own (documented below) since both reader and writer are
this package; it is little-endian, length-prefixed and version-tagged.

Snapshot layout (magic "VDBSNAP1"):
    magic: 8 bytes
    dimension: i64 LE (-1 = unset)
    next_id: u64 LE
    vector_count: u64 LE
    per vector:
        internal_id: u64 LE
        string_id:   u32 LE length + utf8 bytes
        data:        u32 LE element count + LE f32 payload
    metadata_count: u64 LE
    per metadata entry:
        internal_id: u64 LE
        field_count: u32 LE
        per field: (u32+utf8 key)(u32+utf8 value)

WAL entry payload layout (framing lives in wal.py / walcore.cpp):
    tag: u8 — 0=Insert, 1=Delete, 2=Checkpoint
    Insert: string_id(u32+utf8), internal_id u64, data(u32+f32s),
            field_count u32 + fields   [metadata IS persisted — fixes the
            reference gap at src/persistence/engine.rs:136-140]
    Delete: string_id(u32+utf8)
    Checkpoint: (empty)
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..errors import SerializationError

SNAPSHOT_MAGIC = b"VDBSNAP1"
# trailing footer: <Q metadata_offset> + this magic. The offset points at
# the metadata COUNT field, letting readers jump straight to the metadata
# section instead of skip-walking the whole vector section (a pure-Python
# walk that touches every page — measured 370 s on a cold 30 GB snapshot
# at 10M rows). Readers fall back to the walk when the footer is absent
# (pre-footer files) or fails validation; decode_snapshot ignores
# trailing bytes by construction, so the footer is fully compatible.
SNAPSHOT_FOOTER_MAGIC = b"VDBMOFF1"

WAL_INSERT = 0
WAL_DELETE = 1
WAL_CHECKPOINT = 2


@dataclass
class SerializedVector:
    """One persisted vector (reference: serialization.rs:9-14)."""
    internal_id: int
    string_id: str
    data: np.ndarray  # f32[d]


@dataclass
class DatabaseSnapshot:
    """Full store state (reference: serialization.rs:17-23)."""
    vectors: List[SerializedVector]
    metadata: Dict[int, Dict[str, str]]
    next_id: int
    dimension: Optional[int]


@dataclass
class WalEntry:
    """One WAL record (reference: wal.rs:15-25, plus metadata)."""
    kind: int                       # WAL_INSERT / WAL_DELETE / WAL_CHECKPOINT
    string_id: str = ""
    internal_id: int = 0
    data: Optional[np.ndarray] = None
    metadata: Dict[str, str] = field(default_factory=dict)

    @classmethod
    def insert(cls, string_id: str, internal_id: int, data: np.ndarray,
               metadata: Optional[Dict[str, str]] = None) -> "WalEntry":
        return cls(WAL_INSERT, string_id, internal_id,
                   np.asarray(data, dtype=np.float32), dict(metadata or {}))

    @classmethod
    def delete(cls, string_id: str) -> "WalEntry":
        return cls(WAL_DELETE, string_id)

    @classmethod
    def checkpoint(cls) -> "WalEntry":
        return cls(WAL_CHECKPOINT)


# -- low-level helpers -------------------------------------------------------

def _pack_str(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    out += struct.pack("<I", len(b))
    out += b


def _unpack_str(buf: memoryview, off: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    if off + n > len(buf):
        raise SerializationError("truncated string")
    s = bytes(buf[off:off + n]).decode("utf-8")
    return s, off + n


def _pack_f32s(out: bytearray, arr: np.ndarray) -> None:
    arr = np.asarray(arr, dtype="<f4").reshape(-1)
    out += struct.pack("<I", arr.shape[0])
    out += arr.tobytes()


def _unpack_f32s(buf: memoryview, off: int) -> Tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    nbytes = n * 4
    if off + nbytes > len(buf):
        raise SerializationError("truncated f32 payload")
    arr = np.frombuffer(buf, dtype="<f4", count=n, offset=off).copy()
    return arr, off + nbytes


def _pack_fields(out: bytearray, fields: Dict[str, str]) -> None:
    out += struct.pack("<I", len(fields))
    for k, v in fields.items():
        _pack_str(out, k)
        _pack_str(out, v)


def _unpack_fields(buf: memoryview, off: int) -> Tuple[Dict[str, str], int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    fields = {}
    for _ in range(n):
        k, off = _unpack_str(buf, off)
        v, off = _unpack_str(buf, off)
        fields[k] = v
    return fields, off


# -- WAL entry codec ---------------------------------------------------------

def encode_wal_entry(entry: WalEntry) -> bytes:
    out = bytearray()
    out += struct.pack("<B", entry.kind)
    if entry.kind == WAL_INSERT:
        _pack_str(out, entry.string_id)
        out += struct.pack("<Q", entry.internal_id)
        _pack_f32s(out, entry.data if entry.data is not None else [])
        _pack_fields(out, entry.metadata)
    elif entry.kind == WAL_DELETE:
        _pack_str(out, entry.string_id)
    elif entry.kind != WAL_CHECKPOINT:
        raise SerializationError(f"unknown WAL entry kind {entry.kind}")
    return bytes(out)


def decode_wal_entry(payload: bytes) -> WalEntry:
    try:
        buf = memoryview(payload)
        if len(buf) < 1:
            raise SerializationError("empty WAL payload")
        (kind,) = struct.unpack_from("<B", buf, 0)
        off = 1
        if kind == WAL_INSERT:
            string_id, off = _unpack_str(buf, off)
            (internal_id,) = struct.unpack_from("<Q", buf, off)
            off += 8
            data, off = _unpack_f32s(buf, off)
            fields, off = _unpack_fields(buf, off)
            return WalEntry(WAL_INSERT, string_id, internal_id, data, fields)
        if kind == WAL_DELETE:
            string_id, off = _unpack_str(buf, off)
            return WalEntry(WAL_DELETE, string_id)
        if kind == WAL_CHECKPOINT:
            return WalEntry(WAL_CHECKPOINT)
        raise SerializationError(f"unknown WAL entry kind {kind}")
    except SerializationError:
        raise
    except Exception as e:
        raise SerializationError(f"undecodable WAL entry: {e}") from None


# -- snapshot codec ----------------------------------------------------------

def encode_snapshot(snap: DatabaseSnapshot) -> bytes:
    out = bytearray()
    out += SNAPSHOT_MAGIC
    out += struct.pack("<q", -1 if snap.dimension is None else snap.dimension)
    out += struct.pack("<Q", snap.next_id)
    out += struct.pack("<Q", len(snap.vectors))
    for sv in snap.vectors:
        out += struct.pack("<Q", sv.internal_id)
        _pack_str(out, sv.string_id)
        _pack_f32s(out, sv.data)
    meta_off = len(out)
    out += struct.pack("<Q", len(snap.metadata))
    for internal_id, fields in snap.metadata.items():
        out += struct.pack("<Q", internal_id)
        _pack_fields(out, fields)
    out += struct.pack("<Q", meta_off)
    out += SNAPSHOT_FOOTER_MAGIC
    return bytes(out)


_STREAM_BUF = 64 << 20     # flush threshold for the streaming writer


def write_snapshot_stream(f, vectors, metadata, next_id: int,
                          dimension, count: int) -> None:
    """Stream-encode a snapshot to file object ``f`` — byte-identical to
    ``encode_snapshot`` on the same content, but with bounded memory
    (~64 MB), so checkpointing a 10M x 768 store does not materialize a
    30 GB payload (plus its ``bytes()`` copy) in RAM.

    ``vectors`` is an iterable of ``(internal_id, string_id, f32 row)``;
    ``count`` must match the number of items it yields (it is written
    into the header up front). ``metadata`` maps internal_id -> fields
    and is read only AFTER ``vectors`` is exhausted, so a caller may pass
    a dict that the vector iterator itself populates as it walks."""
    out = bytearray()
    out += SNAPSHOT_MAGIC
    out += struct.pack("<q", -1 if dimension is None else dimension)
    out += struct.pack("<Q", next_id)
    out += struct.pack("<Q", count)
    yielded = 0
    flushed = 0
    for internal_id, string_id, data in vectors:
        out += struct.pack("<Q", internal_id)
        _pack_str(out, string_id)
        _pack_f32s(out, data)
        yielded += 1
        if len(out) >= _STREAM_BUF:
            flushed += len(out)
            f.write(out)
            out = bytearray()
    if yielded != count:
        raise SerializationError(
            f"snapshot count mismatch: header says {count}, "
            f"iterator yielded {yielded}")
    meta_off = flushed + len(out)
    out += struct.pack("<Q", len(metadata))
    for internal_id, fields in metadata.items():
        out += struct.pack("<Q", internal_id)
        _pack_fields(out, fields)
        if len(out) >= _STREAM_BUF:
            flushed += len(out)
            f.write(out)
            out = bytearray()
    out += struct.pack("<Q", meta_off)
    out += SNAPSHOT_FOOTER_MAGIC
    f.write(out)


class SnapshotStreamReader:
    """Streaming decode over an mmap of ``snapshot.bin``: header fields up
    front, vectors as a generator of ``(internal_id, string_id, row)``
    (rows are COPIES — safe to keep after close), metadata via a fast
    skip-walk. Peak memory is one row plus the metadata dict, vs
    ``decode_snapshot``'s full payload + 10M-element object list."""

    def __init__(self, path):
        import mmap
        self._f = open(path, "rb")
        try:
            self._mm = mmap.mmap(self._f.fileno(), 0,
                                 access=mmap.ACCESS_READ)
        except ValueError:            # empty file
            self._f.close()
            raise SerializationError("empty snapshot") from None
        buf = memoryview(self._mm)
        try:
            if bytes(buf[:8]) != SNAPSHOT_MAGIC:
                raise SerializationError("bad snapshot magic")
            (dim,) = struct.unpack_from("<q", buf, 8)
            (self.next_id,) = struct.unpack_from("<Q", buf, 16)
            (self.count,) = struct.unpack_from("<Q", buf, 24)
        except (SerializationError, struct.error) as e:
            # torn header (e.g. an 8-31 byte file with valid magic) must
            # surface as SerializationError like every other decode
            # failure, and must not leak the mmap/file handle
            del buf
            self.close()
            if isinstance(e, SerializationError):
                raise
            raise SerializationError(
                f"truncated snapshot header: {e}") from None
        self.dimension = None if dim < 0 else dim
        self._vec_off = 32

    def vectors(self):
        buf = memoryview(self._mm)
        off = self._vec_off
        try:
            for _ in range(self.count):
                (internal_id,) = struct.unpack_from("<Q", buf, off)
                off += 8
                string_id, off = _unpack_str(buf, off)
                data, off = _unpack_f32s(buf, off)
                yield internal_id, string_id, data
        except struct.error as e:
            raise SerializationError(
                f"undecodable snapshot: {e}") from None
        finally:
            del buf

    def vector_chunks(self, chunk_rows: int = 65536):
        """Vectorized decode: yields ``(internal_ids int64[n], string_ids
        list[str], rows (n, dim) f32)`` chunks instead of per-row tuples.
        The per-row cost drops to the struct walk plus one row memcpy into
        a preallocated matrix — the object-per-row path costs ~20-50 us
        of Python per row, which is most of a 10M-row recovery on a
        single-core host. Rows are copies (safe after close). Requires a
        fixed dimension (any row of another width raises — snapshots are
        self-consistent by construction)."""
        import numpy as np
        if self.dimension is None:
            # zero-row snapshot: nothing to chunk
            if self.count:
                raise SerializationError(
                    "snapshot has rows but no dimension")
            return
        dim = int(self.dimension)
        buf = memoryview(self._mm)
        off = self._vec_off
        remaining = self.count
        try:
            while remaining > 0:
                n = min(chunk_rows, remaining)
                iids = np.empty(n, np.int64)
                sids: list = []
                rows = np.empty((n, dim), np.float32)
                for j in range(n):
                    (internal_id,) = struct.unpack_from("<Q", buf, off)
                    off += 8
                    (sl,) = struct.unpack_from("<I", buf, off)
                    off += 4
                    sids.append(str(buf[off:off + sl], "utf-8"))
                    off += sl
                    (fl,) = struct.unpack_from("<I", buf, off)
                    off += 4
                    if fl != dim:
                        raise SerializationError(
                            f"snapshot row width {fl} != header "
                            f"dimension {dim}")
                    rows[j] = np.frombuffer(buf, np.float32, count=dim,
                                            offset=off)
                    off += 4 * dim
                    iids[j] = internal_id
                remaining -= n
                yield iids, sids, rows
        except struct.error as e:
            raise SerializationError(
                f"undecodable snapshot: {e}") from None
        finally:
            del buf

    def readahead(self, stop_event=None, window: int = 256 << 20,
                  block: int = 8 << 20) -> None:
        """Sequentially pre-reads the snapshot file through pread so the
        decode thread faults on warm page-cache pages. mmap page faults
        hold the GIL (they are memory accesses, not syscalls); pread
        releases it, so running this on a side thread overlaps disk IO
        with the Python decode walk. Bounded by ``window`` bytes ahead of
        nothing in particular — the OS page cache does the bookkeeping."""
        import os
        fd = self._f.fileno()
        size = len(self._mm)
        off = 0
        while off < size:
            if stop_event is not None and stop_event.is_set():
                return
            try:
                data = os.pread(fd, min(block, size - off), off)
            except OSError:
                return
            if not data:
                return
            off += len(data)

    def _metadata_offset(self) -> int:
        """Where the metadata section starts. Fast path: the trailing
        footer written since the r4 format carries the offset directly —
        the skip-walk below touches EVERY page of the vector section
        (measured 370 s cold at 10M x 768), the footer costs one page.
        Pre-footer files take the walk."""
        size = len(self._mm)
        if size >= 16 + self._vec_off:
            buf = memoryview(self._mm)
            try:
                if bytes(buf[size - 8:size]) == SNAPSHOT_FOOTER_MAGIC:
                    (off,) = struct.unpack_from("<Q", buf, size - 16)
                    if self._vec_off <= off <= size - 16:
                        (mcount,) = struct.unpack_from("<Q", buf, off)
                        if mcount <= self.count:
                            return off
            except struct.error:
                pass
            finally:
                del buf
        buf = memoryview(self._mm)
        off = self._vec_off
        try:
            for _ in range(self.count):
                off += 8
                (n,) = struct.unpack_from("<I", buf, off)
                off += 4 + n
                (n,) = struct.unpack_from("<I", buf, off)
                off += 4 + n * 4
            return off
        except struct.error as e:
            raise SerializationError(
                f"undecodable snapshot: {e}") from None
        finally:
            del buf

    def read_metadata(self) -> Dict[int, Dict[str, str]]:
        buf = memoryview(self._mm)
        off = self._metadata_offset()
        try:
            (mcount,) = struct.unpack_from("<Q", buf, off)
            off += 8
            metadata: Dict[int, Dict[str, str]] = {}
            for _ in range(mcount):
                (internal_id,) = struct.unpack_from("<Q", buf, off)
                off += 8
                fields, off = _unpack_fields(buf, off)
                metadata[internal_id] = fields
            return metadata
        except struct.error as e:
            raise SerializationError(
                f"undecodable snapshot: {e}") from None
        finally:
            del buf

    def close(self) -> None:
        if getattr(self, "_mm", None) is not None:
            self._mm.close()
            self._mm = None
        if not self._f.closed:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def decode_snapshot(payload: bytes) -> DatabaseSnapshot:
    try:
        buf = memoryview(payload)
        if bytes(buf[:8]) != SNAPSHOT_MAGIC:
            raise SerializationError("bad snapshot magic")
        off = 8
        (dim,) = struct.unpack_from("<q", buf, off)
        off += 8
        (next_id,) = struct.unpack_from("<Q", buf, off)
        off += 8
        (count,) = struct.unpack_from("<Q", buf, off)
        off += 8
        vectors = []
        for _ in range(count):
            (internal_id,) = struct.unpack_from("<Q", buf, off)
            off += 8
            string_id, off = _unpack_str(buf, off)
            data, off = _unpack_f32s(buf, off)
            vectors.append(SerializedVector(internal_id, string_id, data))
        (mcount,) = struct.unpack_from("<Q", buf, off)
        off += 8
        metadata: Dict[int, Dict[str, str]] = {}
        for _ in range(mcount):
            (internal_id,) = struct.unpack_from("<Q", buf, off)
            off += 8
            fields, off = _unpack_fields(buf, off)
            metadata[internal_id] = fields
        return DatabaseSnapshot(vectors, metadata, next_id,
                                None if dim < 0 else dim)
    except SerializationError:
        raise
    except Exception as e:
        raise SerializationError(f"undecodable snapshot: {e}") from None


# -- JSON helpers (reference: serialization.rs:36-43) ------------------------

def to_json(obj) -> str:
    try:
        return json.dumps(obj)
    except (TypeError, ValueError) as e:
        raise SerializationError(str(e)) from None


def from_json(s: str):
    try:
        return json.loads(s)
    except json.JSONDecodeError as e:
        raise SerializationError(str(e)) from None


__all__ = [
    "SerializedVector", "DatabaseSnapshot", "WalEntry",
    "WAL_INSERT", "WAL_DELETE", "WAL_CHECKPOINT",
    "encode_wal_entry", "decode_wal_entry",
    "encode_snapshot", "decode_snapshot",
    "write_snapshot_stream", "SnapshotStreamReader",
    "to_json", "from_json", "SNAPSHOT_MAGIC",
]
