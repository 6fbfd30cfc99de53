"""Multi-chip sharded search on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectordb_tpu import DistanceMetric, FlatIndex, HnswParams, Vector
from vectordb_tpu.distance import pairwise_distances
from vectordb_tpu.parallel import (DistributedFlatIndex, ShardedHnswIndex,
                                   make_mesh, make_sharded_search, shard_rows)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh(8, axis_names=("shard", "batch"), shape=(4, 2))


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.shape == {"shard": 8}
    m2 = make_mesh(8, axis_names=("a", "b"), shape=(2, 4))
    assert m2.shape == {"a": 2, "b": 4}
    with pytest.raises(ValueError):
        make_mesh(9)
    with pytest.raises(ValueError):
        make_mesh(8, shape=(3,))


def test_shard_rows_pads_and_shards(mesh8):
    arr = np.arange(10 * 4, dtype=np.float32).reshape(10, 4)
    flags = np.ones(10, dtype=bool)
    padded, darr, dflags = shard_rows(mesh8, "shard", arr, flags)
    assert padded == 16
    assert darr.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(darr)[:10], arr)
    assert not np.asarray(dflags)[10:].any()  # bool pads False
    assert len(darr.sharding.device_set) == 8


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_distributed_matches_oracle(mesh8, metric, rng):
    n, d, q, k = 1000, 32, 5, 10
    db = rng.standard_normal((n, d)).astype(np.float32) + 2.0
    queries = rng.standard_normal((q, d)).astype(np.float32) + 2.0
    idx = DistributedFlatIndex(mesh8, metric)
    idx.load(db)
    results = idx.search_batch(queries, k)
    oracle = pairwise_distances(np, queries, db, metric)
    for qi in range(q):
        got_ids = [r[0] for r in results[qi]]
        got_dists = np.array([r[1] for r in results[qi]])
        np.testing.assert_allclose(got_dists, np.sort(oracle[qi])[:k],
                                   rtol=1e-4, atol=1e-4)
        # ids must be among the tied-distance candidates
        order = np.argsort(oracle[qi], kind="stable")
        exp_d = oracle[qi][order[:k]]
        for pos in range(k):
            ties = np.nonzero(np.isclose(oracle[qi], exp_d[pos],
                                         rtol=1e-5, atol=1e-5))[0]
            assert got_ids[pos] in set(int(t) for t in ties)


def test_distributed_matches_single_chip_flat(mesh8, rng):
    """Sharded result == single-device FlatIndex result."""
    n, d, k = 512, 16, 7
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch([(i, db[i]) for i in range(n)])
    single = flat.search_batch(queries, k)
    dist_idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN)
    dist_idx.load(db)
    multi = dist_idx.search_batch(queries, k)
    for s_row, m_row in zip(single, multi):
        assert [r[0] for r in s_row] == [r[0] for r in m_row]
        np.testing.assert_allclose([r[1] for r in s_row],
                                   [r[1] for r in m_row], rtol=1e-4,
                                   atol=1e-5)


def test_k_larger_than_shard_block(mesh8, rng):
    """k greater than rows-per-shard still returns n results."""
    n, d = 16, 8  # 2 rows per shard
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN)
    idx.load(db)
    results = idx.search_batch(db[:1], 12)
    assert len(results[0]) == 12
    assert results[0][0][0] == 0


def test_2d_mesh_query_batch_sharding(mesh2d, rng):
    """Rows sharded over 'shard', query batch sharded over 'batch'."""
    n, d, k = 256, 16, 5
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = db[:6]  # self queries
    idx = DistributedFlatIndex(mesh2d, DistanceMetric.EUCLIDEAN,
                               row_axis="shard", batch_axis="batch")
    idx.load(db)
    results = idx.search_batch(queries, k)
    for qi in range(6):
        assert results[qi][0][0] == qi
        # |q|^2+|x|^2-2qx self-distance carries ~1e-3 f32 cancellation noise
        assert results[qi][0][1] == pytest.approx(0.0, abs=5e-3)


def test_collectives_actually_sharded(mesh8, rng):
    """The loaded database must truly live sharded across all 8 devices."""
    db = rng.standard_normal((800, 16)).astype(np.float32)
    idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN)
    idx.load(db)
    arr = idx._device[0]
    assert len(arr.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(100, 16)}


def test_sharded_hnsw_recall(rng):
    n, d, k = 1000, 32, 10
    data = rng.random((n, d)).astype(np.float32)
    sharded = ShardedHnswIndex(4, DistanceMetric.EUCLIDEAN, HnswParams(seed=2))
    sharded.build_batch([(i, Vector(data[i])) for i in range(n)])
    assert len(sharded) == n
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch([(i, data[i]) for i in range(n)])
    queries = rng.random((15, d)).astype(np.float32)
    flat_res = flat.search_batch(queries, k)
    total = 0.0
    for qi in range(15):
        got = {iid for iid, _ in sharded.search(Vector(queries[qi]), k, ef=100)}
        expect = {iid for iid, _ in flat_res[qi]}
        total += len(got & expect) / k
    assert total / 15 >= 0.90


def test_sharded_hnsw_remove(rng):
    data = rng.random((40, 8)).astype(np.float32)
    sharded = ShardedHnswIndex(4, DistanceMetric.EUCLIDEAN, HnswParams(seed=4))
    sharded.build_batch([(i, Vector(data[i])) for i in range(40)])
    sharded.remove(13)
    assert len(sharded) == 39
    res = sharded.search(Vector(data[13]), 3)
    assert all(iid != 13 for iid, _ in res)


class TestShardedStore:
    """Full VectorStore (CRUD + metadata + exact filters) on a mesh."""

    def test_sharded_store_crud_and_search(self, mesh8, rng):
        from vectordb_tpu import VectorStore, Metadata
        store = VectorStore.with_sharded_flat_index(
            DistanceMetric.EUCLIDEAN, mesh8)
        data = rng.standard_normal((300, 16)).astype(np.float32)
        for i in range(300):
            store.insert_with_metadata(
                f"v{i}", Vector(data[i]), Metadata({"par": str(i % 2)}))
        assert len(store) == 300
        hits = store.search(Vector(data[42]), 3)
        assert hits[0].id == "v42"
        # upsert + delete still work against sharded storage
        store.insert("v42", Vector(-data[42]))
        assert store.search(Vector(data[42]), 1)[0].id != "v42"
        store.delete("v0")
        assert len(store) == 299
        assert all(h.id != "v0" for h in store.search(Vector(data[0]), 5))

    def test_sharded_store_exact_filtered_search(self, mesh8, rng):
        from vectordb_tpu import VectorStore, Metadata, MetadataFilter
        store = VectorStore.with_sharded_flat_index(
            DistanceMetric.EUCLIDEAN, mesh8)
        data = rng.standard_normal((200, 8)).astype(np.float32)
        for i in range(200):
            tag = "rare" if i >= 195 else "common"
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       Metadata({"tag": tag}))
        q = Vector(rng.standard_normal(8).astype(np.float32))
        hits = store.search_with_filter(q, 5, MetadataFilter.eq("tag", "rare"))
        assert len(hits) == 5
        assert {h.id for h in hits} == {f"v{i}" for i in range(195, 200)}

    def test_sharded_store_matches_single_device(self, mesh8, rng):
        from vectordb_tpu import VectorStore
        data = rng.standard_normal((256, 12)).astype(np.float32)
        single = VectorStore.with_flat_index(DistanceMetric.COSINE)
        sharded = VectorStore.with_sharded_flat_index(
            DistanceMetric.COSINE, mesh8)
        for i in range(256):
            single.insert(f"v{i}", Vector(data[i]))
            sharded.insert(f"v{i}", Vector(data[i]))
        queries = [(Vector(data[i] + 0.01), 5) for i in range(4)]
        res_s = single.search_batch(queries)
        res_m = sharded.search_batch(queries)
        for a, b in zip(res_s, res_m):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_allclose([h.distance for h in a],
                                       [h.distance for h in b],
                                       rtol=1e-4, atol=1e-5)

    def test_sharded_arrays_live_on_all_devices(self, mesh8, rng):
        from vectordb_tpu import VectorStore
        store = VectorStore.with_sharded_flat_index(
            DistanceMetric.EUCLIDEAN, mesh8)
        data = rng.standard_normal((100, 8)).astype(np.float32)
        for i in range(100):
            store.insert(f"v{i}", Vector(data[i]))
        store.search(Vector(data[0]), 1)  # forces sync
        dev = store.index._device
        assert len(dev["db"].sharding.device_set) == 8


def test_engine_recovery_hydrates_sharded_devices(mesh8, rng, tmp_path):
    """Crash-recover a WAL+snapshot database straight into mesh-sharded
    device storage (SURVEY §7 phase 7: recovery to sharded devices)."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine
    data = rng.standard_normal((200, 16)).astype(np.float32)
    cfg_plain = EngineConfig()
    with StorageEngine.open(tmp_path, cfg_plain) as eng:
        from vectordb_tpu import BatchInsertItem
        eng.insert_batch([
            BatchInsertItem(f"v{i}", Vector(data[i])) for i in range(150)])
        eng.checkpoint()
        for i in range(150, 200):
            eng.insert(f"v{i}", Vector(data[i]))
        eng.delete("v0")
    # reopen with a mesh: snapshot + WAL replay land in sharded storage
    cfg = EngineConfig(mesh=mesh8)
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == 199
        hits = eng.search(Vector(data[123]), 1)
        assert hits[0].id == "v123"
        eng.search(Vector(data[1]), 1)  # force device sync
        dev = eng.store.index._device
        assert len(dev["db"].sharding.device_set) == 8
        assert all(h.id != "v0"
                   for h in eng.search(Vector(data[0]), 5))


class TestShardedCoarse:
    """Sharded 1-pass certified coarse path (make_sharded_search_coarse)."""

    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")

    @pytest.mark.parametrize("metric", list(DistanceMetric))
    def test_matches_oracle_and_engages(self, mesh8, metric, rng,
                                        monkeypatch):
        from vectordb_tpu.parallel import distributed as dist_mod

        n, d, q, k = 3000, 32, 6, 10
        db = rng.standard_normal((n, d)).astype(np.float32) + 2.0
        queries = rng.standard_normal((q, d)).astype(np.float32) + 2.0
        calls = []
        real = dist_mod.make_sharded_search_coarse

        def spy(*a, **kw):
            calls.append(True)
            return real(*a, **kw)

        monkeypatch.setattr(dist_mod, "make_sharded_search_coarse", spy)
        idx = DistributedFlatIndex(mesh8, metric)
        idx.load(db)
        assert idx._elo_max is not None
        assert idx._block_rows % 1024 == 0
        results = idx.search_batch(queries, k)
        assert calls, "coarse sharded searcher should have been built"
        oracle = pairwise_distances(np, queries, db, metric)
        for qi in range(q):
            got_ids = [r[0] for r in results[qi]]
            want = np.argsort(oracle[qi], kind="stable")[:k]
            assert got_ids == [int(w) for w in want]

    def test_uncertified_falls_back_exact(self, mesh8, rng):
        import jax.numpy as jnp

        n, d, q, k = 2048, 16, 4, 5
        db = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN)
        idx.load(db)
        idx._elo_max = jnp.float32(1e9)   # absurd bound -> nothing certifies
        results = idx.search_batch(queries, k)
        oracle = pairwise_distances(np, queries, db, DistanceMetric.EUCLIDEAN)
        for qi in range(q):
            got_ids = [r[0] for r in results[qi]]
            want = np.argsort(oracle[qi], kind="stable")[:k]
            assert got_ids == [int(w) for w in want]

    def test_padding_rows_never_surface(self, mesh8, rng):
        n, d, k = 1000, 8, 10   # pads to 8 x 1024 blocks, 7192 dead rows
        db = rng.standard_normal((n, d)).astype(np.float32)
        idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN)
        idx.load(db)
        res = idx.search_batch(rng.standard_normal((3, d)).astype(np.float32),
                               k)
        for row in res:
            assert len(row) == k
            assert all(0 <= rid < n for rid, _ in row)


class TestShardedStoreCoarse:
    """Store-level sharded serving through the certified coarse kernel:
    the production stack (store/engine/server) must engage the same 1-pass
    certified pipeline as DistributedFlatIndex (round-1 verdict item)."""

    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")

    def test_store_sharded_search_engages_coarse(self, mesh8, rng,
                                                 monkeypatch):
        from vectordb_tpu import VectorStore
        from vectordb_tpu.parallel import distributed as dist_mod

        calls = []
        real = dist_mod.make_sharded_search_coarse

        def spy(*a, **kw):
            calls.append(kw.get("src", "f32"))
            return real(*a, **kw)

        monkeypatch.setattr(dist_mod, "make_sharded_search_coarse", spy)
        n, d, k = 500, 16, 10
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore.with_sharded_flat_index(
            DistanceMetric.EUCLIDEAN, mesh8)
        for i in range(n):
            store.insert(f"v{i}", Vector(data[i]))
        queries = [(Vector(data[i] + 0.01), k) for i in range(4)]
        res = store.search_batch(queries)
        assert calls, "store-level sharded search must build the coarse path"
        oracle = pairwise_distances(
            np, np.stack([data[i] + 0.01 for i in range(4)]), data,
            DistanceMetric.EUCLIDEAN)
        for qi in range(4):
            want = [f"v{int(w)}"
                    for w in np.argsort(oracle[qi], kind="stable")[:k]]
            assert [h.id for h in res[qi]] == want

    def test_store_sharded_bf16_exact_over_stored(self, mesh8, rng):
        import ml_dtypes
        from vectordb_tpu import VectorStore

        n, d, k = 400, 16, 5
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore.with_sharded_flat_index(
            DistanceMetric.EUCLIDEAN, mesh8, storage="bf16")
        for i in range(n):
            store.insert(f"v{i}", Vector(data[i]))
        dev = store.index._sync_device()
        assert dev["db"].dtype == jnp.bfloat16
        assert bool(dev.get("bf16_storage"))
        stored = data.astype(ml_dtypes.bfloat16).astype(np.float32)
        q = rng.standard_normal((3, d)).astype(np.float32)
        res = store.search_batch([(Vector(q[i]), k) for i in range(3)])
        oracle = pairwise_distances(np, q, stored,
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(3):
            want = [f"v{int(w)}"
                    for w in np.argsort(oracle[qi], kind="stable")[:k]]
            assert [h.id for h in res[qi]] == want
            np.testing.assert_allclose(
                [h.distance for h in res[qi]],
                np.sort(oracle[qi], kind="stable")[:k], rtol=1e-3,
                atol=1e-3)

    def test_2d_mesh_coarse_engages_and_matches(self, mesh2d, rng,
                                                monkeypatch):
        from vectordb_tpu.parallel import distributed as dist_mod

        calls = []
        real = dist_mod.make_sharded_search_coarse

        def spy(*a, **kw):
            calls.append(kw.get("batch_axis"))
            return real(*a, **kw)

        monkeypatch.setattr(dist_mod, "make_sharded_search_coarse", spy)
        n, d, q, k = 2000, 16, 8, 10
        db = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        idx = DistributedFlatIndex(mesh2d, DistanceMetric.EUCLIDEAN,
                                   row_axis="shard", batch_axis="batch")
        idx.load(db)
        results = idx.search_batch(queries, k)
        assert calls == ["batch"], calls
        oracle = pairwise_distances(np, queries, db,
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(q):
            want = np.argsort(oracle[qi], kind="stable")[:k]
            assert [r[0] for r in results[qi]] == [int(w) for w in want]

    def test_distributed_bf16_storage_matches_oracle(self, mesh8, rng):
        import ml_dtypes

        n, d, q, k = 2000, 16, 6, 10
        db = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN,
                                   storage="bf16")
        idx.load(db)
        assert idx._device[0].dtype == jnp.bfloat16
        stored = db.astype(ml_dtypes.bfloat16).astype(np.float32)
        results = idx.search_batch(queries, k)
        oracle = pairwise_distances(np, queries, stored,
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(q):
            want = np.argsort(oracle[qi], kind="stable")[:k]
            assert [r[0] for r in results[qi]] == [int(w) for w in want]


class TestShardedInt8:
    """int8 storage composed with the mesh (round-3: the capacity lane
    and the multi-chip lane finally compose — 8 x 16M = 128M rows of
    768-d on a v5e-8). Exactness contract: certified-exact over the
    STORED pow2-quantized values, per shard, with the distributed merge."""

    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")

    @staticmethod
    def _stored(db):
        from vectordb_tpu.index.flat import _quantize_int8
        return _quantize_int8(db)

    def test_distributed_int8_storage_matches_oracle(self, mesh8, rng):
        n, d, q, k = 2000, 16, 6, 10
        db = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN,
                                   storage="int8")
        idx.load(db)
        assert idx._device[0].dtype == jnp.int8
        assert idx._scales is not None
        stored = self._stored(db)
        results = idx.search_batch(queries, k)
        oracle = pairwise_distances(np, queries, stored,
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(q):
            want = np.argsort(oracle[qi], kind="stable")[:k]
            assert [r[0] for r in results[qi]] == [int(w) for w in want]
            np.testing.assert_allclose(
                [r[1] for r in results[qi]],
                np.sort(oracle[qi], kind="stable")[:k], rtol=1e-5,
                atol=1e-5)

    def test_distributed_int8_xla_fallback_exact(self, mesh8, rng):
        n, d, q, k = 2048, 16, 4, 5
        db = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        idx = DistributedFlatIndex(mesh8, DistanceMetric.EUCLIDEAN,
                                   storage="int8")
        idx.load(db)
        idx._elo_max = jnp.float32(1e9)   # nothing certifies -> XLA scan
        stored = self._stored(db)
        results = idx.search_batch(queries, k)
        oracle = pairwise_distances(np, queries, stored,
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(q):
            want = np.argsort(oracle[qi], kind="stable")[:k]
            assert [r[0] for r in results[qi]] == [int(w) for w in want]

    @pytest.mark.parametrize("metric", list(DistanceMetric))
    def test_store_sharded_int8_exact_over_stored(self, mesh8, metric,
                                                  rng, monkeypatch):
        from vectordb_tpu import VectorStore
        from vectordb_tpu.index.flat import FlatIndex
        from vectordb_tpu.parallel import distributed as dist_mod

        calls = []
        real = dist_mod.make_sharded_search_coarse

        def spy(*a, **kw):
            calls.append(kw.get("src", "f32"))
            return real(*a, **kw)

        monkeypatch.setattr(dist_mod, "make_sharded_search_coarse", spy)
        n, d, k = 400, 16, 5
        data = rng.standard_normal((n, d)).astype(np.float32) + 1.0
        store = VectorStore.with_sharded_flat_index(
            metric, mesh8, storage="int8")
        assert isinstance(store.index, FlatIndex)
        for i in range(n):
            store.insert(f"v{i}", Vector(data[i]))
        dev = store.index._sync_device()
        assert dev["db"].dtype == jnp.int8
        assert bool(dev.get("int8_storage"))
        stored = self._stored(data)
        q = rng.standard_normal((3, d)).astype(np.float32) + 1.0
        res = store.search_batch([(Vector(q[i]), k) for i in range(3)])
        assert "int8" in calls, calls
        oracle = pairwise_distances(np, q, stored, metric)
        for qi in range(3):
            want = [f"v{int(w)}"
                    for w in np.argsort(oracle[qi], kind="stable")[:k]]
            assert [h.id for h in res[qi]] == want
            np.testing.assert_allclose(
                [h.distance for h in res[qi]],
                np.sort(oracle[qi], kind="stable")[:k], rtol=1e-4,
                atol=1e-4)

    def test_store_sharded_int8_crud_resync(self, mesh8, rng):
        """Mutations after the first sync re-put codes+scales wholesale;
        deletes never resurface; upserts see the fresh values."""
        from vectordb_tpu import VectorStore

        n, d, k = 300, 16, 5
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore.with_sharded_flat_index(
            DistanceMetric.EUCLIDEAN, mesh8, storage="int8")
        for i in range(n):
            store.insert(f"v{i}", Vector(data[i]))
        store.search_batch([(Vector(data[0]), k)])   # first sync
        store.delete("v1")
        new5 = data[5] + 2.5
        store.insert("v5", Vector(new5))             # upsert
        stored = self._stored(np.concatenate(
            [data[:1], data[2:5], data[6:], self._stored(new5)[None]]))
        ids = (["v0"] + [f"v{i}" for i in range(2, 5)]
               + [f"v{i}" for i in range(6, n)] + ["v5"])
        q = rng.standard_normal((2, d)).astype(np.float32)
        res = store.search_batch([(Vector(q[i]), k) for i in range(2)])
        oracle = pairwise_distances(np, q, stored,
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(2):
            want = [ids[int(w)]
                    for w in np.argsort(oracle[qi], kind="stable")[:k]]
            assert [h.id for h in res[qi]] == want
            assert all(h.id != "v1" for h in res[qi])

    def test_sharded_int8_filtered_search_exact(self, mesh8, rng):
        """Filters compose with int8 x mesh: the mask ANDs into the
        sharded validity and the masked distributed merge stays exact
        over stored values."""
        from vectordb_tpu import Metadata, MetadataFilter, VectorStore

        n, d, k = 256, 16, 4
        data = rng.standard_normal((n, d)).astype(np.float32)
        store = VectorStore.with_sharded_flat_index(
            DistanceMetric.EUCLIDEAN, mesh8, storage="int8")
        for i in range(n):
            store.insert_with_metadata(
                f"v{i}", Vector(data[i]),
                Metadata({"par": str(i % 2)}))
        stored = self._stored(data)
        elig = np.arange(0, n, 2)
        flt = MetadataFilter.eq("par", "0")
        q = data[10] + 0.01
        d2 = np.sum((stored[elig] - q) ** 2, axis=1)
        want = [f"v{elig[j]}" for j in np.argsort(d2, kind="stable")[:k]]
        got = store.search_with_filter(Vector(q), k, flt)
        assert [r.id for r in got] == want


class TestShardedPq:
    """PQ codes composed with the mesh (round-3): codes sharded over the
    row axis, per-shard decode-in-VMEM scan, exact merged top-r, exact
    host re-rank. v5e-8 capacity: 8x the one-chip PQ ceiling."""

    def _store(self, rng, n=4000, d=16, refine=512, rotate=False,
               mesh=None):
        from vectordb_tpu import VectorStore
        from vectordb_tpu.index import PqFlatIndex
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                          refine=refine, auto_train_min=10 ** 9, seed=0,
                          rotate=rotate, mesh=mesh)
        store = VectorStore.with_index(idx)
        data = rng.standard_normal((n, d)).astype(np.float32)
        for i in range(n):
            store.insert(f"v{i}", Vector(data[i]))
        return store, idx, data

    def test_sharded_pq_scan_engages_and_exact_at_full_pool(self, mesh8,
                                                            rng,
                                                            monkeypatch):
        from vectordb_tpu.parallel import distributed as dist_mod
        calls = []
        real = dist_mod.make_sharded_pq_scan

        def spy(*a, **kw):
            calls.append(True)
            return real(*a, **kw)

        monkeypatch.setattr(dist_mod, "make_sharded_pq_scan", spy)
        store, idx, data = self._store(rng, n=500, mesh=mesh8)
        idx.train()
        q = rng.standard_normal((5, 16)).astype(np.float32)
        res = store.search_batch([(Vector(q[i]), 10) for i in range(5)])
        assert calls, "sharded PQ scan must engage"
        # refine=512 >= live rows: the merged pool covers every live row
        # regardless of shard placement -> the exact host re-rank sees
        # the full candidate set -> exact results
        oracle = pairwise_distances(np, q, data[:500],
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(5):
            want = [f"v{int(w)}"
                    for w in np.argsort(oracle[qi], kind="stable")[:10]]
            assert [h.id for h in res[qi]] == want
            np.testing.assert_allclose(
                [h.distance for h in res[qi]],
                np.sort(oracle[qi], kind="stable")[:10], rtol=1e-6)

    def test_sharded_pq_large_recall_and_exact_distances(self, mesh8,
                                                         rng):
        """At n >> r the pool is approximate (recall governed by refine,
        like single-chip PQ) but every RETURNED distance is the exact
        f32 value over the true stored row."""
        store, idx, data = self._store(rng, n=4000, refine=512,
                                       mesh=mesh8)
        idx.train()
        q = rng.standard_normal((6, 16)).astype(np.float32)
        res = store.search_batch([(Vector(q[i]), 10) for i in range(6)])
        oracle = pairwise_distances(np, q, data, DistanceMetric.EUCLIDEAN)
        hits = 0
        for qi in range(6):
            want = {f"v{int(w)}"
                    for w in np.argsort(oracle[qi], kind="stable")[:10]}
            got = {h.id for h in res[qi]}
            hits += len(got & want)
            for h in res[qi]:   # distances exact for whatever returned
                np.testing.assert_allclose(
                    h.distance, oracle[qi][int(h.id[1:])], rtol=1e-6)
        assert hits >= 48  # >= 0.8 average recall@10 over 6 queries

    def test_sharded_pq_matches_single_chip_pool(self, mesh8, rng):
        """Same data, same seed: the sharded scan's candidate pool union
        must serve results at least as good as the single-chip scan at
        equal refine (here: both exact at covering refine)."""
        store_s, idx_s, data = self._store(rng, refine=256, mesh=mesh8)
        idx_s.train()
        rng2 = np.random.default_rng(42)
        store_1, idx_1, _ = self._store(rng2, refine=256)
        idx_1.train()
        q = rng.standard_normal((4, 16)).astype(np.float32)
        res_s = store_s.search_batch([(Vector(q[i]), 5) for i in range(4)])
        res_1 = store_1.search_batch([(Vector(q[i]), 5) for i in range(4)])
        oracle = pairwise_distances(np, q, data, DistanceMetric.EUCLIDEAN)
        for qi in range(4):
            want = {f"v{int(w)}"
                    for w in np.argsort(oracle[qi], kind="stable")[:5]}
            hit_s = len({h.id for h in res_s[qi]} & want)
            hit_1 = len({h.id for h in res_1[qi]} & want)
            assert hit_s >= hit_1 - 1  # sharded pool is never much worse

    def test_sharded_pq_with_rotation(self, mesh8, rng):
        store, idx, data = self._store(rng, n=500, rotate=True,
                                       mesh=mesh8)
        idx.train()
        assert idx._rot is not None
        q = rng.standard_normal((3, 16)).astype(np.float32)
        res = store.search_batch([(Vector(q[i]), 10) for i in range(3)])
        oracle = pairwise_distances(np, q, data[:500],
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(3):
            want = [f"v{int(w)}"
                    for w in np.argsort(oracle[qi], kind="stable")[:10]]
            assert [h.id for h in res[qi]] == want

    def test_sharded_pq_filter_composes(self, mesh8, rng):
        from vectordb_tpu import Metadata, MetadataFilter, VectorStore
        from vectordb_tpu.index import PqFlatIndex
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                          refine=512, auto_train_min=10 ** 9, seed=0,
                          rotate=False, mesh=mesh8)
        store = VectorStore.with_index(idx)
        n, d = 4000, 16
        data = rng.standard_normal((n, d)).astype(np.float32)
        for i in range(n):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       Metadata({"par": str(i % 2)}))
        idx.train()
        flt = MetadataFilter.eq("par", "0")
        elig = np.arange(0, n, 2)
        q = data[12] + 0.01
        d2 = np.sum((data[elig] - q) ** 2, axis=1)
        want = [f"v{elig[j]}" for j in np.argsort(d2, kind="stable")[:5]]
        got = store.search_with_filter(Vector(q), 5, flt)
        assert [r.id for r in got] == want
        # refine knob composes on the sharded masked path too
        got2 = store.search_with_filter(Vector(q), 5, flt, refine=512)
        assert [r.id for r in got2] == want

    def test_sharded_pq_untrained_falls_back_sharded_exact(self, mesh8,
                                                           rng,
                                                           monkeypatch):
        monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")
        store, idx, data = self._store(rng, n=1500, mesh=mesh8)
        assert not idx.is_trained
        q = data[7] + 0.001
        res = store.search_batch([(Vector(q), 5)])
        oracle = pairwise_distances(np, q[None], data,
                                    DistanceMetric.EUCLIDEAN)
        want = [f"v{int(w)}"
                for w in np.argsort(oracle[0], kind="stable")[:5]]
        assert [h.id for h in res[0]] == want

    def test_sharded_pq_mutation_resync(self, mesh8, rng):
        store, idx, data = self._store(rng, n=3000, mesh=mesh8)
        idx.train()
        store.search_batch([(Vector(data[0]), 5)])   # first sharded sync
        store.delete("v2")
        moved = data[9] + 3.0
        store.insert("v9", Vector(moved))            # upsert, re-encodes
        q = moved + 0.001
        res = store.search_batch([(Vector(q), 5)])
        assert res[0][0].id == "v9"
        assert all(h.id != "v2" for h in res[0])

    def test_sharded_pq_masked_device_scan(self, mesh8, rng):
        """Eligible set ABOVE _MASKED_EXACT_MAX: the masked SHARDED
        device scan itself runs (not the exact-host shortcut). Filter
        exactness is unconditional; the k contract is served by the
        masked-short safety net; recall stays governed by refine."""
        from vectordb_tpu import Metadata, MetadataFilter, VectorStore
        from vectordb_tpu.index import PqFlatIndex
        from vectordb_tpu.index.pq import _MASKED_EXACT_MAX
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                          refine=64, auto_train_min=10 ** 9, seed=0,
                          rotate=False, mesh=mesh8)
        store = VectorStore.with_index(idx)
        n, d, k = 6000, 16, 5
        assert n // 2 > _MASKED_EXACT_MAX
        data = rng.standard_normal((n, d)).astype(np.float32)
        for i in range(n):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       Metadata({"par": str(i % 2)}))
        idx.train()
        flt = MetadataFilter.eq("par", "0")
        elig = np.arange(0, n, 2)
        queries = [data[8] + 0.005, data[100] + 0.005]
        hits = 0
        for q in queries:
            d2 = np.sum((data[elig] - q) ** 2, axis=1)
            want = {f"v{elig[j]}" for j in np.argsort(d2)[:k]}
            got = store.search_with_filter(Vector(q), k, flt)
            assert len(got) == k
            assert all(int(r.id[1:]) % 2 == 0 for r in got)
            dd = [r.distance for r in got]
            assert dd == sorted(dd)
            hits += len({r.id for r in got} & want)
        assert hits >= 6  # >= 0.6 recall across the 2 queries


def test_engine_recovery_int8_sharded(mesh8, rng, tmp_path):
    """Durability x capacity x mesh: an int8 database crash-recovers into
    mesh-sharded code+scale storage, exact over the stored values."""
    from vectordb_tpu.index.flat import _quantize_int8
    from vectordb_tpu.persistence import EngineConfig, StorageEngine
    data = rng.standard_normal((160, 16)).astype(np.float32)
    with StorageEngine.open(tmp_path,
                            EngineConfig(storage="int8")) as eng:
        from vectordb_tpu import BatchInsertItem
        eng.insert_batch([
            BatchInsertItem(f"v{i}", Vector(data[i])) for i in range(120)])
        eng.checkpoint()
        for i in range(120, 160):
            eng.insert(f"v{i}", Vector(data[i]))
        eng.delete("v3")
    cfg = EngineConfig(mesh=mesh8, storage="int8")
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == 159
        eng.search(Vector(data[1]), 1)           # force device sync
        dev = eng.store.index._device
        assert dev["db"].dtype == jnp.int8
        assert len(dev["db"].sharding.device_set) == 8
        stored = _quantize_int8(data)
        q = rng.standard_normal((2, 16)).astype(np.float32)
        keep = [i for i in range(160) if i != 3]
        oracle = pairwise_distances(np, q, stored[keep],
                                    DistanceMetric.EUCLIDEAN)
        for qi in range(2):
            want = [f"v{keep[int(w)]}"
                    for w in np.argsort(oracle[qi], kind="stable")[:5]]
            got = [h.id for h in eng.search(Vector(q[qi]), 5)]
            assert got == want


def test_engine_recovery_pq_sharded(mesh8, rng, tmp_path):
    """Durability x PQ x mesh: a trained PQ store reopens with its codes
    sharded over the mesh and identical search behavior (codebook
    restored; codes re-derived deterministically)."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine
    from vectordb_tpu import BatchInsertItem
    n, d, k = 600, 16, 5
    data = rng.standard_normal((n, d)).astype(np.float32)
    cfg0 = EngineConfig(index_type="pq")
    with StorageEngine.open(tmp_path, cfg0) as eng:
        eng.insert_batch([
            BatchInsertItem(f"v{i}", Vector(data[i])) for i in range(n)])
        eng.store.index.auto_train_min = 1
        eng.store.index.train()
        eng.checkpoint()
        before = [[h.id for h in eng.search(Vector(data[i]), k)]
                  for i in (3, 77)]
    cfg = EngineConfig(index_type="pq", mesh=mesh8)
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == n
        idx = eng.store.index
        assert idx.is_trained and idx._mesh is not None
        after = [[h.id for h in eng.search(Vector(data[i]), k)]
                 for i in (3, 77)]
        # self-NN must hold; full bit-parity with the unsharded run is
        # not promised (the sharded merge pools per-shard top-r, a
        # different—but equally exact-re-ranked—candidate set)
        assert after[0][0] == "v3" and after[1][0] == "v77"
        assert len(set(before[0]) & set(after[0])) >= k - 1
        codes = idx._pq_sync()[0]
        assert len(codes.sharding.device_set) == 8


def test_engine_mesh_rejected_for_unsharded_index_types(mesh8, tmp_path):
    from vectordb_tpu.persistence import EngineConfig, StorageEngine
    for it in ("hnsw", "ivf", "ivfpq"):
        with pytest.raises(ValueError):
            StorageEngine.open(tmp_path / it,
                               EngineConfig(index_type=it, mesh=mesh8))
