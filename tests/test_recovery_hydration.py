"""Round-5 recovery levers: storage pre-sizing, dirty-slot suppression,
mesh piece-level resync, and progressive (overlapped) hydration.

Semantic contract: reference recovery re-inserts every snapshot row and
replays the WAL tail (src/persistence/engine.rs:44-104); these tests pin
the TPU build's equivalents at the mirror-management layer the reference
doesn't have.
"""

import numpy as np
import pytest

from vectordb_tpu import BatchInsertItem, Vector
from vectordb_tpu.distance import DistanceMetric
from vectordb_tpu.index.flat import FlatIndex
from vectordb_tpu.parallel import make_mesh
from vectordb_tpu.persistence import EngineConfig, StorageEngine


@pytest.fixture
def mesh8():
    return make_mesh(8)


def _mat(rng, n, d=16):
    return rng.standard_normal((n, d)).astype(np.float32)


class TestReserve:
    def test_reserve_presizes_once(self, rng):
        ix = FlatIndex(DistanceMetric.EUCLIDEAN)
        ix.reserve(5000, dim=16)
        cap0 = ix.capacity
        assert cap0 >= 5000
        vecs0 = ix._vectors
        for lo in range(0, 5000, 500):
            ids = np.arange(lo, lo + 500, dtype=np.int64)
            ix.bulk_append_matrix(ids, _mat(rng, 500))
        # no reallocation happened during the chunked appends
        assert ix._vectors is vecs0
        assert len(ix) == 5000

    def test_reserve_unknown_dim_is_noop(self):
        ix = FlatIndex(DistanceMetric.EUCLIDEAN)
        ix.reserve(1000)          # no dim anywhere yet
        assert ix.capacity == 0

    def test_reserve_dim_mismatch_raises(self, rng):
        from vectordb_tpu.errors import DimensionMismatchError
        ix = FlatIndex(DistanceMetric.EUCLIDEAN)
        ix.add(0, Vector(np.ones(8, np.float32)))
        with pytest.raises(DimensionMismatchError):
            ix.reserve(100, dim=16)

    def test_store_reserve_passthrough(self, rng):
        from vectordb_tpu.store import VectorStore
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        store.reserve(3000, 16)
        assert store.index.capacity >= 3000


class TestDirtySuppression:
    def test_no_mirror_no_dirty_bookkeeping(self, rng):
        ix = FlatIndex(DistanceMetric.EUCLIDEAN)
        ids = np.arange(100, dtype=np.int64)
        ix.bulk_append_matrix(ids, _mat(rng, 100))
        assert not ix._dirty_slots      # nothing to patch: no mirror yet
        ix.search(Vector(_mat(rng, 1)[0]), 5)   # builds the mirror
        ix.add(1000, Vector(_mat(rng, 1)[0]))
        assert ix._dirty_slots          # mirror exists: patches tracked

    def test_prehydrate_window_tracks_mutations(self, rng):
        """A slot written while the unlocked build is in flight must be
        dirty afterward, so the first sync repairs a torn read."""
        ix = FlatIndex(DistanceMetric.EUCLIDEAN)
        ids = np.arange(50, dtype=np.int64)
        data = _mat(rng, 50)
        ix.bulk_append_matrix(ids, data)
        with ix._lock:
            ix._build_inflight = True   # simulate the build window
        try:
            ix.add(999, Vector(data[0] + 1.0))
            assert ix._dirty_slots
        finally:
            with ix._lock:
                ix._build_inflight = False

    def test_mutation_correctness_after_suppression(self, rng):
        """Delete + upsert before the first search still serve exact
        results (the full build reads host truth, no dirty needed)."""
        ix = FlatIndex(DistanceMetric.EUCLIDEAN)
        data = _mat(rng, 64)
        ix.bulk_append_matrix(np.arange(64, dtype=np.int64), data)
        ix.remove(7)
        ix.add(100, Vector(data[7]))            # same values, new id
        hits = ix.search(Vector(data[7]), 1)
        assert hits[0][0] == 100


class TestMeshPieceResync:
    def test_partial_piece_resync_engages_and_exact(self, mesh8, rng):
        ix = FlatIndex(DistanceMetric.EUCLIDEAN, mesh=mesh8)
        n, d = 4096, 16
        data = _mat(rng, n, d)
        ix.bulk_append_matrix(np.arange(n, dtype=np.int64), data)
        ix.search(Vector(data[0]), 1)           # build the mirror
        dev_db0 = ix._device["db"]
        # dirty a handful of slots in ONE shard's range
        newrow = _mat(rng, 1, d)[0]
        ix.remove(3)
        ix.add(n + 1, Vector(newrow))
        calls = {}
        orig = FlatIndex._mesh_piece_resync

        def spy(self):
            calls["ret"] = orig(self)
            return calls["ret"]

        FlatIndex._mesh_piece_resync = spy
        try:
            hits = ix.search(Vector(newrow), 1)
        finally:
            FlatIndex._mesh_piece_resync = orig
        assert calls.get("ret") is True
        assert hits[0][0] == n + 1
        # clean pieces were reused: db buffers differ only where dirty
        assert ix._device["db"] is not dev_db0
        # full-recall sanity against a NumPy oracle
        q = _mat(rng, 4, d)
        d2 = np.linalg.norm(
            data[None, :, :] - q[:, None, :], axis=-1)
        d2[:, 3] = np.inf                       # deleted row
        got = ix.search_batch(q, 3)
        for qi in range(4):
            want = np.argsort(d2[qi])[:3]
            got_ids = [iid for iid, _ in got[qi]]
            for w, g in zip(want, got_ids):
                # id n+1 replaced slot content; map: slot==id here
                # except the upserted row
                if g == n + 1:
                    continue
                assert g == w

    def test_all_pieces_dirty_falls_back(self, mesh8, rng):
        ix = FlatIndex(DistanceMetric.EUCLIDEAN, mesh=mesh8)
        d = 8
        data = _mat(rng, 1024, d)
        ix.bulk_append_matrix(np.arange(1024, dtype=np.int64), data)
        ix.search(Vector(data[0]), 1)
        n = ix.capacity                 # fill every shard's slot range
        extra = _mat(rng, n - 1024, d)
        ix.bulk_append_matrix(
            np.arange(1024, n, dtype=np.int64), extra)
        ix.search(Vector(data[0]), 1)   # rebuild mirror, clear dirty
        per_shard = n // 8
        for base in range(0, n, per_shard):   # dirty one slot per shard
            ix.remove(base)
        with ix._lock:
            assert ix._mesh_piece_resync() is False

    @pytest.mark.parametrize("storage", ["bf16", "int8"])
    def test_piece_resync_quantized_storage_exact(self, mesh8, rng,
                                                  storage):
        ix = FlatIndex(DistanceMetric.EUCLIDEAN, mesh=mesh8,
                       storage=storage)
        n, d = 2048, 16
        data = _mat(rng, n, d)
        ix.bulk_append_matrix(np.arange(n, dtype=np.int64), data)
        ix.search(Vector(data[0]), 1)
        target = _mat(rng, 1, d)[0]
        ix.add(n + 5, Vector(target))           # one shard dirtied
        hits = ix.search(Vector(target), 1)
        assert hits[0][0] == n + 5


class TestProgressiveHydration:
    def test_engine_mesh_reopen_installs_before_first_search(
            self, mesh8, rng, tmp_path):
        data = _mat(rng, 300, 16)
        with StorageEngine.open(tmp_path, EngineConfig()) as eng:
            eng.insert_batch([BatchInsertItem(f"v{i}", Vector(data[i]))
                              for i in range(250)])
            eng.checkpoint()
            for i in range(250, 300):           # WAL tail
                eng.insert(f"v{i}", Vector(data[i]))
            eng.delete("v1")
        with StorageEngine.open(tmp_path, EngineConfig(mesh=mesh8)) as eng:
            ix = eng.store.index
            # the progressive hydrator installed a mirror during recovery
            assert ix._device is not None
            assert not ix._build_inflight
            # WAL-tail rows raced the piece puts: they must be dirty so
            # the first sync repairs them
            assert ix._dirty_slots
            hits = eng.search(Vector(data[275]), 1)
            assert hits[0].id == "v275"
            assert all(h.id != "v1"
                       for h in eng.search(Vector(data[1]), 5))
            assert len(eng) == 299

    @pytest.mark.parametrize("storage", ["bf16", "int8"])
    def test_engine_mesh_reopen_quantized(self, mesh8, rng, tmp_path,
                                          storage):
        data = _mat(rng, 200, 16)
        cfg0 = EngineConfig(storage=storage)
        with StorageEngine.open(tmp_path, cfg0) as eng:
            eng.insert_batch([BatchInsertItem(f"v{i}", Vector(data[i]))
                              for i in range(200)])
            eng.checkpoint()
        cfg = EngineConfig(mesh=mesh8, storage=storage)
        with StorageEngine.open(tmp_path, cfg) as eng:
            assert eng.store.index._device is not None
            hits = eng.search(Vector(data[42]), 1)
            assert hits[0].id == "v42"

    def test_hydrator_abandons_on_realloc(self, mesh8, rng):
        """If storage grows mid-hydration (capacity overflow from the
        tail), finish() must refuse to install the stale mirror."""
        ix = FlatIndex(DistanceMetric.EUCLIDEAN, mesh=mesh8)
        n, d = 1024, 8
        ix.reserve(n, dim=d)
        data = _mat(rng, n, d)
        hyd = ix.start_progressive_hydration(n)
        assert hyd is not None
        ix.bulk_append_matrix(np.arange(n, dtype=np.int64), data)
        hyd.advance(n)
        # force a reallocation beyond the reserved capacity
        extra = ix.capacity - len(ix) + 1
        ids = np.arange(10_000, 10_000 + extra, dtype=np.int64)
        ix.bulk_append_matrix(ids, _mat(rng, extra, d))
        assert hyd.finish() is False
        assert ix._device is None
        assert not ix._build_inflight
        # next search pays the normal full sync and is exact
        hits = ix.search(Vector(data[5]), 1)
        assert hits[0][0] == 5

    def test_hydrator_matches_full_build(self, mesh8, rng):
        """Progressive assembly must equal the wholesale build: same
        search results over every storage mode's arrays."""
        for storage in ("f32", "bf16", "int8"):
            ix = FlatIndex(DistanceMetric.EUCLIDEAN, mesh=mesh8,
                           storage=storage)
            n, d = 2048, 16
            ix.reserve(n, dim=d)
            data = _mat(rng, n, d)
            hyd = ix.start_progressive_hydration(n)
            assert hyd is not None
            for lo in range(0, n, 256):
                ids = np.arange(lo, lo + 256, dtype=np.int64)
                ix.bulk_append_matrix(ids, data[lo:lo + 256])
                hyd.advance(lo + 256)
            assert hyd.finish() is True
            assert ix._device is not None
            got = ix.search_batch(data[:8], 1)
            for qi in range(8):
                assert got[qi][0][0] == qi
