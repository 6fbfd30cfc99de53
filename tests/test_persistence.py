"""Durability layer: WAL framing/CRC/replay, snapshots, crash recovery,
mmap vector file (parity with reference src/persistence tests: wal.rs:
123-203, engine.rs:231-392, snapshot.rs:66-114, mmap.rs:175-229).

Every test runs twice: with the native C++ core and with the pure-Python
fallback; plus cross-backend tests proving the on-disk bytes interoperate.
"""

import struct
import zlib

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, Metadata, Vector
from vectordb_tpu.persistence import (DatabaseSnapshot, EngineConfig,
                                      MmapVectorStorage, SerializedVector,
                                      SnapshotManager, StorageEngine,
                                      WalEntry, WriteAheadLog)
from vectordb_tpu.persistence import native_lib
from vectordb_tpu.persistence.serialization import (WAL_CHECKPOINT,
                                                    WAL_DELETE, WAL_INSERT,
                                                    decode_wal_entry,
                                                    encode_wal_entry)


@pytest.fixture(params=["native", "python"])
def backend(request, monkeypatch):
    if request.param == "python":
        monkeypatch.setenv("VDB_TPU_NO_NATIVE", "1")
    else:
        monkeypatch.delenv("VDB_TPU_NO_NATIVE", raising=False)
        if native_lib.get_native() is None:
            pytest.skip("native library unavailable")
    return request.param


class TestWalEntryCodec:
    def test_insert_roundtrip(self):
        e = WalEntry.insert("doc-1", 42, np.array([1.5, -2.0], np.float32),
                            {"cat": "x", "lang": "en"})
        got = decode_wal_entry(encode_wal_entry(e))
        assert got.kind == WAL_INSERT
        assert got.string_id == "doc-1"
        assert got.internal_id == 42
        np.testing.assert_array_equal(got.data, e.data)
        assert got.metadata == {"cat": "x", "lang": "en"}

    def test_delete_roundtrip(self):
        got = decode_wal_entry(encode_wal_entry(WalEntry.delete("gone")))
        assert got.kind == WAL_DELETE and got.string_id == "gone"

    def test_checkpoint_roundtrip(self):
        got = decode_wal_entry(encode_wal_entry(WalEntry.checkpoint()))
        assert got.kind == WAL_CHECKPOINT

    def test_unicode_ids(self):
        e = WalEntry.insert("ключ-🔑", 0, np.zeros(2, np.float32), {})
        assert decode_wal_entry(encode_wal_entry(e)).string_id == "ключ-🔑"


class TestWal:
    def test_append_replay(self, backend, tmp_path):
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append(WalEntry.insert("a", 0, np.array([1.0], np.float32)))
        wal.append(WalEntry.delete("a"))
        wal.append(WalEntry.checkpoint())
        wal.close()
        entries = WriteAheadLog.open(path).replay()
        assert [e.kind for e in entries] == [WAL_INSERT, WAL_DELETE,
                                             WAL_CHECKPOINT]

    def test_replay_empty(self, backend, tmp_path):
        wal = WriteAheadLog.open(tmp_path / "wal.log")
        assert wal.replay() == []

    def test_replay_stops_at_garbage(self, backend, tmp_path):
        # torn-write simulation (reference wal.rs:163-187)
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append(WalEntry.insert("a", 0, np.array([1.0], np.float32)))
        wal.append(WalEntry.insert("b", 1, np.array([2.0], np.float32)))
        wal.close()
        with open(path, "ab") as f:
            f.write(b"\x07\x00\x00\x00garbage-bytes")
        entries = WriteAheadLog.open(path).replay()
        assert len(entries) == 2
        assert entries[1].string_id == "b"

    def test_replay_stops_at_crc_mismatch(self, backend, tmp_path):
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append(WalEntry.insert("a", 0, np.array([1.0], np.float32)))
        wal.append(WalEntry.insert("b", 1, np.array([2.0], np.float32)))
        wal.close()
        # flip one payload byte of the second frame
        raw = bytearray(path.read_bytes())
        first_len = struct.unpack_from("<I", raw, 0)[0]
        second_payload_at = 8 + first_len + 8
        raw[second_payload_at + 2] ^= 0xFF
        path.write_bytes(bytes(raw))
        entries = WriteAheadLog.open(path).replay()
        assert len(entries) == 1
        assert entries[0].string_id == "a"

    def test_replay_stops_at_truncated_frame(self, backend, tmp_path):
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append(WalEntry.insert("a", 0, np.array([1.0], np.float32)))
        wal.close()
        raw = path.read_bytes()
        path.write_bytes(raw[:-3])  # cut the tail
        assert WriteAheadLog.open(path).replay() == []

    def test_truncate(self, backend, tmp_path):
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append(WalEntry.delete("x"))
        wal.truncate()
        assert wal.replay() == []
        # still appendable after truncate
        wal.append(WalEntry.delete("y"))
        wal.close()
        entries = WriteAheadLog.open(path).replay()
        assert [e.string_id for e in entries] == ["y"]

    def test_frame_layout_is_len_crc_payload(self, backend, tmp_path):
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        entry = WalEntry.delete("abc")
        wal.append(entry)
        wal.close()
        raw = path.read_bytes()
        payload = encode_wal_entry(entry)
        length, crc = struct.unpack_from("<II", raw, 0)
        assert length == len(payload)
        assert crc == (zlib.crc32(payload) & 0xFFFFFFFF)
        assert raw[8:] == payload


def test_wal_cross_backend_compat(tmp_path, monkeypatch):
    """Files written natively replay in pure Python and vice versa."""
    if native_lib.get_native() is None:
        pytest.skip("native library unavailable")
    native_path = tmp_path / "native.log"
    wal = WriteAheadLog.open(native_path)
    assert wal._handle is not None  # actually using native
    wal.append(WalEntry.insert("n", 5, np.array([3.0], np.float32),
                               {"k": "v"}))
    wal.close()
    monkeypatch.setenv("VDB_TPU_NO_NATIVE", "1")
    entries = WriteAheadLog.open(native_path).replay()
    assert entries[0].string_id == "n" and entries[0].metadata == {"k": "v"}

    py_path = tmp_path / "python.log"
    wal = WriteAheadLog.open(py_path)
    assert wal._handle is None  # actually pure python
    wal.append(WalEntry.delete("p"))
    wal.close()
    monkeypatch.delenv("VDB_TPU_NO_NATIVE")
    entries = WriteAheadLog.open(py_path).replay()
    assert entries[0].string_id == "p"


class TestSnapshot:
    def test_save_load_roundtrip(self, backend, tmp_path):
        mgr = SnapshotManager(tmp_path)
        snap = DatabaseSnapshot(
            vectors=[SerializedVector(0, "a", np.array([1., 2.], np.float32)),
                     SerializedVector(1, "b", np.array([3., 4.], np.float32))],
            metadata={1: {"cat": "x"}},
            next_id=2, dimension=2)
        mgr.save(snap)
        got = mgr.load()
        assert got.next_id == 2 and got.dimension == 2
        assert [(v.internal_id, v.string_id) for v in got.vectors] == \
            [(0, "a"), (1, "b")]
        np.testing.assert_array_equal(got.vectors[1].data, [3., 4.])
        assert got.metadata == {1: {"cat": "x"}}

    def test_load_absent_returns_none(self, backend, tmp_path):
        assert SnapshotManager(tmp_path).load() is None
        assert not SnapshotManager(tmp_path).exists()

    def test_manifest(self, backend, tmp_path):
        mgr = SnapshotManager(tmp_path)
        mgr.save(DatabaseSnapshot([], {}, next_id=7, dimension=None))
        m = mgr.manifest()
        assert m == {"vector_count": 0, "next_id": 7, "dimension": None}

    def test_no_tmp_residue(self, backend, tmp_path):
        mgr = SnapshotManager(tmp_path)
        mgr.save(DatabaseSnapshot([], {}, 0, None))
        assert not list(tmp_path.glob("*.tmp"))

    def test_stream_writer_byte_parity(self, backend, tmp_path):
        # write_snapshot_stream must produce the EXACT bytes of
        # encode_snapshot (the on-disk format has one definition)
        import io

        from vectordb_tpu.persistence.serialization import (
            encode_snapshot, write_snapshot_stream)
        rng = np.random.default_rng(3)
        vecs = [SerializedVector(i, f"id{i}",
                                 rng.standard_normal(5).astype(np.float32))
                for i in range(37)]
        meta = {4: {"k": "v", "x": "y"}, 11: {"é": "✓"}}
        snap = DatabaseSnapshot(vecs, meta, next_id=99, dimension=5)
        ref = bytes(encode_snapshot(snap))
        buf = io.BytesIO()
        write_snapshot_stream(
            buf, ((v.internal_id, v.string_id, v.data) for v in vecs),
            meta, 99, 5, len(vecs))
        assert buf.getvalue() == ref

    def test_stream_reader_roundtrip(self, backend, tmp_path):
        mgr = SnapshotManager(tmp_path)
        rng = np.random.default_rng(4)
        rows = rng.standard_normal((23, 7)).astype(np.float32)
        meta = {5: {"a": "b"}}
        mgr.save_stream(
            ((i, f"v{i}", rows[i]) for i in range(23)), meta, 23, 7, 23)
        # streamed file decodes via BOTH the materialized and the
        # streaming readers
        got = mgr.load()
        assert len(got.vectors) == 23 and got.metadata == meta
        with mgr.open_stream() as r:
            assert (r.count, r.next_id, r.dimension) == (23, 23, 7)
            assert r.read_metadata() == meta
            out = list(r.vectors())
        assert [(i, s) for i, s, _ in out] == [(i, f"v{i}")
                                               for i in range(23)]
        np.testing.assert_array_equal(np.stack([d for _, _, d in out]),
                                      rows)
        # rows are copies: usable after close
        assert out[0][2].sum() == rows[0].sum()

    def test_stream_count_mismatch_keeps_old_snapshot(self, backend,
                                                      tmp_path):
        from vectordb_tpu.errors import SerializationError
        mgr = SnapshotManager(tmp_path)
        mgr.save_stream(((0, "keep", np.ones(2, np.float32)),), {}, 1, 2, 1)
        with pytest.raises(SerializationError):
            mgr.save_stream(((0, "new", np.ones(2, np.float32)),),
                            {}, 1, 2, count=5)   # iterator under-delivers
        assert not list(tmp_path.glob("*.tmp"))
        with mgr.open_stream() as r:
            assert next(r.vectors())[1] == "keep"


class TestEngine:
    def test_insert_search_reopen(self, backend, tmp_path):
        # WAL-only recovery (reference engine.rs:260-292)
        with StorageEngine.open(tmp_path) as eng:
            eng.insert("a", Vector([1.0, 0.0]))
            eng.insert("b", Vector([0.0, 1.0]))
        with StorageEngine.open(tmp_path) as eng:
            assert len(eng) == 2
            hits = eng.search(Vector([1.0, 0.1]), 1)
            assert hits[0].id == "a"

    def test_chunked_wal_replay_order(self, backend, tmp_path,
                                      monkeypatch):
        # replay batches consecutive inserts through the bulk path; a
        # tiny chunk size forces flush boundaries, and interleaved
        # deletes + upserts must still apply in exact WAL order
        monkeypatch.setattr(StorageEngine, "_APPLY_CHUNK", 3)
        with StorageEngine.open(tmp_path) as eng:
            for i in range(10):
                eng.insert(f"v{i}", Vector([float(i), 0.0]))
            eng.delete("v4")
            eng.insert("v5", Vector([50.0, 1.0]))      # upsert post-delete
            eng.insert("v4", Vector([40.0, 2.0]))      # re-insert deleted
            eng.delete("v9")
        with StorageEngine.open(tmp_path) as eng:
            assert sorted(eng.list_ids()) == sorted(
                [f"v{i}" for i in range(9)])
            assert eng.get("v5").as_list() == [50.0, 1.0]
            assert eng.get("v4").as_list() == [40.0, 2.0]
            hits = eng.search(Vector([50.0, 1.0]), 1)
            assert hits[0].id == "v5"

    def test_snapshot_plus_wal_recovery(self, backend, tmp_path):
        # checkpoint then more writes (reference engine.rs:294-328)
        with StorageEngine.open(tmp_path) as eng:
            eng.insert("a", Vector([1.0]))
            eng.checkpoint()
            eng.insert("b", Vector([2.0]))
        with StorageEngine.open(tmp_path) as eng:
            assert sorted(eng.list_ids()) == ["a", "b"]

    def test_delete_replay(self, backend, tmp_path):
        # (reference engine.rs:330-359)
        with StorageEngine.open(tmp_path) as eng:
            eng.insert("a", Vector([1.0]))
            eng.insert("b", Vector([2.0]))
            eng.delete("a")
        with StorageEngine.open(tmp_path) as eng:
            assert eng.list_ids() == ["b"]
            assert eng.get("a") is None

    def test_auto_checkpoint_1000_vectors(self, backend, tmp_path):
        # (reference engine.rs:361-391) — cross-checkpoint reopen
        cfg = EngineConfig(checkpoint_interval=100)
        with StorageEngine.open(tmp_path, cfg) as eng:
            for i in range(250):
                eng.insert(f"v{i}", Vector([float(i), 0.0]))
        assert SnapshotManager(tmp_path).exists()
        with StorageEngine.open(tmp_path, cfg) as eng:
            assert len(eng) == 250
            assert eng.search(Vector([123.0, 0.0]), 1)[0].id == "v123"

    def test_metadata_persisted(self, backend, tmp_path):
        # improvement over reference (engine.rs:136-140 drops metadata)
        with StorageEngine.open(tmp_path) as eng:
            eng.insert_with_metadata("a", Vector([1.0]),
                                     Metadata({"cat": "books"}))
            eng.checkpoint()
            eng.insert_with_metadata("b", Vector([2.0]),
                                     Metadata({"cat": "films"}))
        with StorageEngine.open(tmp_path) as eng:
            assert eng.get_metadata("a").get("cat") == "books"   # via snapshot
            assert eng.get_metadata("b").get("cat") == "films"   # via WAL

    def test_upsert_survives_recovery(self, backend, tmp_path):
        with StorageEngine.open(tmp_path) as eng:
            eng.insert("a", Vector([1.0]))
            eng.insert("a", Vector([9.0]))
        with StorageEngine.open(tmp_path) as eng:
            assert len(eng) == 1
            assert eng.get("a") == Vector([9.0])

    def test_torn_tail_recovers_prefix(self, backend, tmp_path):
        with StorageEngine.open(tmp_path) as eng:
            eng.insert("a", Vector([1.0]))
            eng.insert("b", Vector([2.0]))
        with open(tmp_path / "wal.log", "ab") as f:
            f.write(b"\xff\xff\xff\x7fpartial")
        with StorageEngine.open(tmp_path) as eng:
            assert sorted(eng.list_ids()) == ["a", "b"]

    def test_metric_config(self, backend, tmp_path):
        cfg = EngineConfig(metric=DistanceMetric.COSINE)
        with StorageEngine.open(tmp_path, cfg) as eng:
            eng.insert("a", Vector([1.0, 0.0]))
            eng.insert("b", Vector([0.0, 1.0]))
            hits = eng.search(Vector([1.0, 0.0]), 2)
            assert hits[0].id == "a"
            assert hits[0].distance == pytest.approx(0.0)
            assert hits[1].distance == pytest.approx(1.0)


class TestMmapStorage:
    def test_create_append_get(self, backend, tmp_path):
        path = tmp_path / "vectors.bin"
        with MmapVectorStorage.create(path, 3) as st:
            st.append(Vector([1.0, 2.0, 3.0]))
            st.append(np.array([4.0, 5.0, 6.0], np.float32))
            assert st.count == 2
            assert st.dimension == 3
            assert st.get(1) == Vector([4.0, 5.0, 6.0])

    def test_reopen(self, backend, tmp_path):
        path = tmp_path / "vectors.bin"
        with MmapVectorStorage.create(path, 2) as st:
            st.append(Vector([1.0, 2.0]))
        with MmapVectorStorage.open(path) as st:
            assert st.count == 1 and st.dimension == 2
            assert st.get(0) == Vector([1.0, 2.0])

    def test_get_mmap(self, backend, tmp_path):
        path = tmp_path / "vectors.bin"
        with MmapVectorStorage.create(path, 2) as st:
            st.append(Vector([7.0, 8.0]))
            assert st.get_mmap(0) == Vector([7.0, 8.0])

    def test_read_range_bulk(self, backend, tmp_path, rng):
        path = tmp_path / "vectors.bin"
        data = rng.standard_normal((20, 4)).astype(np.float32)
        with MmapVectorStorage.create(path, 4) as st:
            for row in data:
                st.append(row)
            got = st.read_range(5, 10)
            np.testing.assert_array_equal(got, data[5:15])

    def test_out_of_range(self, backend, tmp_path):
        from vectordb_tpu.errors import StorageError
        with MmapVectorStorage.create(tmp_path / "v.bin", 2) as st:
            with pytest.raises(StorageError):
                st.get(0)

    def test_dim_mismatch(self, backend, tmp_path):
        from vectordb_tpu.errors import DimensionMismatchError
        with MmapVectorStorage.create(tmp_path / "v.bin", 2) as st:
            with pytest.raises(DimensionMismatchError):
                st.append(Vector([1.0, 2.0, 3.0]))

    def test_header_layout(self, backend, tmp_path):
        path = tmp_path / "v.bin"
        with MmapVectorStorage.create(path, 5) as st:
            st.append(Vector([0.0] * 5))
        dim, count = struct.unpack("<II", path.read_bytes()[:8])
        assert (dim, count) == (5, 1)


def test_mmap_cross_backend_compat(tmp_path, monkeypatch):
    if native_lib.get_native() is None:
        pytest.skip("native library unavailable")
    path = tmp_path / "v.bin"
    with MmapVectorStorage.create(path, 2) as st:
        assert st._handle is not None
        st.append(Vector([1.0, 2.0]))
    monkeypatch.setenv("VDB_TPU_NO_NATIVE", "1")
    with MmapVectorStorage.open(path) as st:
        assert st._handle is None
        assert st.get(0) == Vector([1.0, 2.0])
        st.append(Vector([3.0, 4.0]))
    monkeypatch.delenv("VDB_TPU_NO_NATIVE")
    with MmapVectorStorage.open(path) as st:
        assert st.count == 2
        assert st.get(1) == Vector([3.0, 4.0])


def test_native_crc32_matches_zlib():
    native = native_lib.get_native()
    if native is None:
        pytest.skip("native library unavailable")
    for data in [b"", b"hello", bytes(range(256)) * 17]:
        assert native.vdb_crc32(native_lib.as_u8p(data), len(data)) == \
            (zlib.crc32(data) & 0xFFFFFFFF)


class TestWalBatchAppend:
    def test_batch_roundtrip(self, backend, tmp_path):
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        entries = [WalEntry.insert(f"v{i}", i, np.array([float(i)], np.float32),
                                   {"n": str(i)}) for i in range(5)]
        wal.append_batch(entries)
        wal.append(WalEntry.delete("v0"))
        wal.close()
        got = WriteAheadLog.open(path).replay()
        assert [e.string_id for e in got] == ["v0", "v1", "v2", "v3", "v4", "v0"]
        assert got[3].metadata == {"n": "3"}

    def test_empty_batch_is_noop(self, backend, tmp_path):
        wal = WriteAheadLog.open(tmp_path / "wal.log")
        wal.append_batch([])
        assert wal.replay() == []

    def test_torn_batch_replays_prefix(self, backend, tmp_path):
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append_batch([WalEntry.delete(f"v{i}") for i in range(4)])
        wal.close()
        raw = path.read_bytes()
        path.write_bytes(raw[:-5])  # tear the last frame
        got = WriteAheadLog.open(path).replay()
        assert [e.string_id for e in got] == ["v0", "v1", "v2"]


class TestEngineBatchAndHnsw:
    def test_engine_insert_batch_recovers(self, backend, tmp_path):
        from vectordb_tpu import BatchInsertItem
        with StorageEngine.open(tmp_path) as eng:
            eng.insert_batch([
                BatchInsertItem(f"v{i}", Vector([float(i), 0.0]),
                                Metadata({"i": str(i)}))
                for i in range(20)])
            assert len(eng) == 20
        with StorageEngine.open(tmp_path) as eng:
            assert len(eng) == 20
            assert eng.get_metadata("v7").get("i") == "7"
            assert eng.search(Vector([5.0, 0.0]), 1)[0].id == "v5"

    def test_engine_insert_batch_bad_dim_logs_only_prefix(self, backend,
                                                          tmp_path):
        from vectordb_tpu import BatchInsertItem
        from vectordb_tpu.errors import DimensionMismatchError
        with StorageEngine.open(tmp_path) as eng:
            with pytest.raises(DimensionMismatchError):
                eng.insert_batch([
                    BatchInsertItem("a", Vector([1.0, 0.0])),
                    BatchInsertItem("bad", Vector([1.0])),
                    BatchInsertItem("c", Vector([2.0, 0.0])),
                ])
            assert eng.list_ids() == ["a"]
        with StorageEngine.open(tmp_path) as eng:
            # replayed state matches runtime state exactly
            assert eng.list_ids() == ["a"]

    def test_engine_hnsw_index_type(self, backend, tmp_path):
        from vectordb_tpu import HnswParams
        from vectordb_tpu.index.hnsw import HnswIndex
        cfg = EngineConfig(index_type="hnsw",
                           hnsw_params=HnswParams(seed=3))
        with StorageEngine.open(tmp_path, cfg) as eng:
            for i in range(50):
                eng.insert(f"v{i}", Vector([float(i), float(i % 7)]))
            assert isinstance(eng.store.index, HnswIndex)
            assert eng.search(Vector([25.0, 4.0]), 1)[0].id == "v25"
        # recovery rebuilds the graph from WAL/snapshot state
        with StorageEngine.open(tmp_path, cfg) as eng:
            assert len(eng) == 50
            assert isinstance(eng.store.index, HnswIndex)
            assert eng.search(Vector([25.0, 4.0]), 1)[0].id == "v25"

    def test_engine_unknown_index_type(self, backend, tmp_path):
        with pytest.raises(ValueError):
            StorageEngine.open(tmp_path, EngineConfig(index_type="annoy"))


class TestCorruptInputs:
    def test_snapshot_bad_magic_raises(self, backend, tmp_path):
        from vectordb_tpu.errors import SerializationError
        (tmp_path / "snapshot.bin").write_bytes(b"NOTMAGIC" + b"\x00" * 32)
        with pytest.raises(SerializationError):
            SnapshotManager(tmp_path).load()

    def test_snapshot_truncated_raises(self, backend, tmp_path):
        from vectordb_tpu.errors import SerializationError
        mgr = SnapshotManager(tmp_path)
        mgr.save(DatabaseSnapshot(
            [SerializedVector(0, "a", np.array([1.0, 2.0], np.float32))],
            {}, 1, 2))
        raw = (tmp_path / "snapshot.bin").read_bytes()
        # cut INTO the payload (the trailing 16 bytes are the r4
        # metadata-offset footer — clipping only it leaves the payload
        # intact and decodable, exercised below)
        (tmp_path / "snapshot.bin").write_bytes(raw[:-22])
        with pytest.raises(SerializationError):
            mgr.load()
        # a clipped FOOTER alone is not data loss: the materialized
        # decoder ignores trailing bytes and the stream reader falls
        # back to the skip-walk
        (tmp_path / "snapshot.bin").write_bytes(raw[:-6])
        snap = mgr.load()
        assert [sv.string_id for sv in snap.vectors] == ["a"]
        reader = mgr.open_stream()
        with reader:
            assert reader.read_metadata() == {}
            assert [sid for _, sid, _ in reader.vectors()] == ["a"]

    def test_snapshot_torn_header_raises_serialization_error(
            self, backend, tmp_path):
        # valid magic but a header cut mid-field (torn write): the stream
        # reader must surface SerializationError (not a raw struct.error)
        # and must not leak the mmap/file handle
        from vectordb_tpu.errors import SerializationError
        from vectordb_tpu.persistence.serialization import SNAPSHOT_MAGIC
        (tmp_path / "snapshot.bin").write_bytes(SNAPSHOT_MAGIC + b"\x00" * 4)
        mgr = SnapshotManager(tmp_path)
        with pytest.raises(SerializationError):
            mgr.open_stream()
        # the engine's recovery path gets the same typed failure
        with pytest.raises(SerializationError):
            StorageEngine.open(tmp_path)

    def test_failed_auto_checkpoint_does_not_fail_the_write(
            self, backend, tmp_path, monkeypatch):
        # the WAL append + store apply succeed before the auto-checkpoint
        # runs, so a checkpoint fault must warn, not raise — and the rows
        # must recover from the (uncompacted) WAL on reopen
        from vectordb_tpu.errors import SerializationError
        with StorageEngine.open(
                tmp_path, EngineConfig(checkpoint_interval=3)) as eng:
            monkeypatch.setattr(
                StorageEngine, "_save_snapshot_stream",
                lambda self: (_ for _ in ()).throw(
                    SerializationError("snapshot count mismatch")))
            with pytest.warns(UserWarning, match="auto-checkpoint failed"):
                for i in range(4):
                    eng.insert(f"v{i}", Vector([float(i), 0.0]))
            # explicit checkpoint still fails loud
            with pytest.raises(SerializationError):
                eng.checkpoint()
        with StorageEngine.open(tmp_path) as eng:
            assert sorted(eng.list_ids()) == ["v0", "v1", "v2", "v3"]

    def test_wal_huge_length_field_no_allocation(self, backend, tmp_path):
        # a corrupt length field must not trigger a giant allocation or a
        # crash — the frame is simply out of bounds and replay stops
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append(WalEntry.delete("ok"))
        wal.close()
        with open(path, "ab") as f:
            f.write(struct.pack("<II", 0x7FFFFFFF, 0x12345678) + b"tiny")
        entries = WriteAheadLog.open(path).replay()
        assert [e.string_id for e in entries] == ["ok"]

    def test_wal_zero_length_frame(self, backend, tmp_path):
        # len=0 with the CRC of b"" is a valid (undecodable) frame: replay
        # must stop there without error
        path = tmp_path / "wal.log"
        wal = WriteAheadLog.open(path)
        wal.append(WalEntry.delete("ok"))
        wal.close()
        with open(path, "ab") as f:
            f.write(struct.pack("<II", 0, zlib.crc32(b"") & 0xFFFFFFFF))
        entries = WriteAheadLog.open(path).replay()
        assert [e.string_id for e in entries] == ["ok"]


class TestHnswGraphPersistence:
    """Fast HNSW reopen: the graph is serialized at checkpoint and imported
    on open instead of rebuilt (O(read) vs O(rebuild))."""

    def _build(self, tmp_path, n=120, d=16, seed=9):
        from vectordb_tpu import HnswParams
        rng = np.random.default_rng(seed)
        data = rng.random((n, d)).astype(np.float32)
        cfg = EngineConfig(index_type="hnsw",
                           hnsw_params=HnswParams(seed=seed))
        with StorageEngine.open(tmp_path, cfg) as eng:
            for i in range(n):
                eng.insert_with_metadata(f"v{i}", Vector(data[i]),
                                         Metadata({"par": str(i % 2)}))
            eng.checkpoint()
        return cfg, data

    def test_graph_file_written_and_imported(self, backend, tmp_path,
                                             monkeypatch):
        cfg, data = self._build(tmp_path)
        assert (tmp_path / "hnsw_graph.npz").exists()
        # the rebuild path must NOT run when the import succeeds
        called = {"rebuild": False}
        orig = StorageEngine._apply_snapshot

        def spy(self, snap):
            called["rebuild"] = True
            return orig(self, snap)

        monkeypatch.setattr(StorageEngine, "_apply_snapshot", spy)
        with StorageEngine.open(tmp_path, cfg) as eng:
            assert not called["rebuild"]
            assert len(eng) == 120
            hits = eng.search(Vector(data[37]), 1)
            assert hits[0].id == "v37"
            assert eng.get_metadata("v37").get("par") == "1"
            # filtered search works against the adopted columnar state
            from vectordb_tpu import MetadataFilter
            got = eng.store.search_with_filter(
                Vector(data[10]), 5, MetadataFilter.eq("par", "0"))
            assert got and all(int(h.id[1:]) % 2 == 0 for h in got)

    def test_writes_after_import_replay(self, backend, tmp_path):
        cfg, data = self._build(tmp_path)
        with StorageEngine.open(tmp_path, cfg) as eng:
            eng.insert("extra", Vector(data[0] * 0.5))
            eng.delete("v0")
        with StorageEngine.open(tmp_path, cfg) as eng:
            assert len(eng) == 120  # 120 - 1 + 1
            assert eng.get("extra") is not None
            assert eng.get("v0") is None
            # internal-ID monotonicity preserved: upsert still works
            eng.insert("extra", Vector(data[1]))
            assert len(eng) == 120

    def test_param_mismatch_falls_back_to_rebuild(self, backend, tmp_path):
        from vectordb_tpu import HnswParams
        cfg, data = self._build(tmp_path)
        other = EngineConfig(index_type="hnsw",
                             hnsw_params=HnswParams(m=8, seed=1))
        with StorageEngine.open(tmp_path, other) as eng:
            assert len(eng) == 120  # rebuilt, not imported
            assert eng.search(Vector(data[5]), 1)[0].id == "v5"

    def test_corrupt_graph_file_falls_back(self, backend, tmp_path):
        cfg, data = self._build(tmp_path)
        (tmp_path / "hnsw_graph.npz").write_bytes(b"not-a-npz")
        with StorageEngine.open(tmp_path, cfg) as eng:
            assert len(eng) == 120
            assert eng.search(Vector(data[5]), 1)[0].id == "v5"

    def test_import_search_quality_matches_rebuild(self, backend, tmp_path):
        cfg, data = self._build(tmp_path, n=300, d=24)
        with StorageEngine.open(tmp_path, cfg) as eng:
            hits = 0
            for i in range(0, 300, 10):
                res = eng.search(Vector(data[i]), 1)
                hits += int(res[0].id == f"v{i}")
            assert hits >= 29
