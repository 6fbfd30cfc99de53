"""VectorStore semantics (parity with reference src/storage.rs:350-756 tests)."""

import numpy as np
import pytest

from vectordb_tpu import (BatchInsertItem, DimensionMismatchError,
                          DistanceMetric, HnswIndex, Metadata, MetadataFilter,
                          Vector, VectorNotFoundError, VectorStore)


@pytest.fixture
def store():
    return VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)


def test_insert_and_get(store):
    store.insert("a", Vector([1.0, 2.0]))
    assert store.get("a") == Vector([1.0, 2.0])
    assert store.get("missing") is None
    assert len(store) == 1


def test_first_insert_fixes_dimension(store):
    store.insert("a", Vector([1.0, 2.0]))
    assert store.dimension == 2
    with pytest.raises(DimensionMismatchError):
        store.insert("b", Vector([1.0, 2.0, 3.0]))


def test_dimension_persists_after_total_delete(store):
    store.insert("a", Vector([1.0, 2.0]))
    store.delete("a")
    assert store.dimension == 2
    with pytest.raises(DimensionMismatchError):
        store.insert("b", Vector([1.0]))


def test_upsert_assigns_fresh_internal_id(store):
    store.insert("a", Vector([1.0, 0.0]))
    first_internal = dict(store.internal_to_string_ids())
    store.insert("a", Vector([0.0, 1.0]))
    second_internal = dict(store.internal_to_string_ids())
    assert len(store) == 1
    assert store.get("a") == Vector([0.0, 1.0])
    assert list(first_internal.keys()) != list(second_internal.keys())


def test_delete_returns_vector(store):
    store.insert("a", Vector([1.0, 2.0]))
    removed = store.delete("a")
    assert removed == Vector([1.0, 2.0])
    assert len(store) == 0


def test_delete_missing_raises(store):
    with pytest.raises(VectorNotFoundError):
        store.delete("nope")


def test_search_empty_returns_empty_even_with_bad_dim(store):
    # empty-store check precedes the dimension check (storage.rs:218-220)
    store.insert("a", Vector([1.0, 2.0]))
    store.delete("a")
    assert store.search(Vector([1.0]), 5) == []


def test_search_dim_mismatch(store):
    store.insert("a", Vector([1.0, 2.0]))
    with pytest.raises(DimensionMismatchError):
        store.search(Vector([1.0]), 5)


def test_search_returns_string_ids(store):
    store.insert("origin", Vector([0.0, 0.0]))
    store.insert("far", Vector([10.0, 10.0]))
    results = store.search(Vector([0.1, 0.0]), 1)
    assert results[0].id == "origin"


def test_search_sorted_ascending(store, rng):
    data = rng.standard_normal((100, 8)).astype(np.float32)
    for i in range(100):
        store.insert(f"v{i}", Vector(data[i]))
    results = store.search(Vector(data[0]), 10)
    dists = [r.distance for r in results]
    assert dists == sorted(dists)
    assert results[0].id == "v0"


def test_metadata_roundtrip(store):
    meta = Metadata({"category": "books", "author": "x"})
    store.insert_with_metadata("a", Vector([1.0]), meta)
    got = store.get_metadata("a")
    assert got.get("category") == "books"
    assert store.get_metadata("missing") is None


def test_insert_batch_applies_prefix_on_error(store):
    items = [
        BatchInsertItem("a", Vector([1.0, 0.0])),
        BatchInsertItem("b", Vector([2.0, 0.0])),
        BatchInsertItem("bad", Vector([1.0, 2.0, 3.0])),  # wrong dim
        BatchInsertItem("c", Vector([3.0, 0.0])),
    ]
    with pytest.raises(DimensionMismatchError):
        store.insert_batch(items)
    # earlier inserts stay applied (storage.rs:656-677 semantics)
    assert len(store) == 2
    assert store.get("a") is not None
    assert store.get("b") is not None
    assert store.get("c") is None


def test_insert_batch_upserts(store):
    store.insert("a", Vector([0.0, 0.0]))
    store.insert_batch([
        BatchInsertItem("a", Vector([5.0, 5.0])),
        BatchInsertItem("b", Vector([1.0, 1.0])),
    ])
    assert len(store) == 2
    assert store.get("a") == Vector([5.0, 5.0])


def test_search_batch(store, rng):
    data = rng.standard_normal((64, 8)).astype(np.float32)
    for i in range(64):
        store.insert(f"v{i}", Vector(data[i]))
    queries = [(Vector(data[3]), 2), (Vector(data[10]), 5)]
    results = store.search_batch(queries)
    assert len(results) == 2
    assert results[0][0].id == "v3"
    assert len(results[0]) == 2
    assert results[1][0].id == "v10"
    assert len(results[1]) == 5


def test_search_batch_empty_store(store):
    assert store.search_batch([(Vector([1.0]), 3)]) == [[]]


def test_list_ids(store):
    store.insert("x", Vector([1.0]))
    store.insert("y", Vector([2.0]))
    assert sorted(store.list_ids()) == ["x", "y"]


def test_metric_property(store):
    assert store.metric is DistanceMetric.EUCLIDEAN


def test_all_metrics_end_to_end(rng):
    # integration sweep over all three metrics (tests/integration_test.rs:29-47)
    for metric in DistanceMetric:
        s = VectorStore.with_flat_index(metric)
        s.insert("a", Vector([1.0, 0.1]))
        s.insert("b", Vector([0.1, 1.0]))
        s.insert("c", Vector([0.9, 0.2]))
        results = s.search(Vector([1.0, 0.0]), 3)
        assert len(results) == 3
        dists = [r.distance for r in results]
        assert dists == sorted(dists)


def test_store_with_hnsw_index(rng):
    from vectordb_tpu import HnswParams
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=1))
    s = VectorStore.with_index(idx)
    data = rng.standard_normal((50, 16)).astype(np.float32)
    for i in range(50):
        s.insert(f"v{i}", Vector(data[i]))
    results = s.search(Vector(data[7]), 1)
    assert results[0].id == "v7"
    s.delete("v7")
    results = s.search(Vector(data[7]), 1)
    assert results[0].id != "v7"


def test_search_batch_submit_matches_sync(store):
    rng = np.random.default_rng(7)
    rows = rng.standard_normal((30, 8)).astype(np.float32)
    store.insert_batch([BatchInsertItem(id=f"v{i}", vector=Vector(rows[i]))
                        for i in range(len(rows))])
    queries = [(Vector(rows[3]), 4), (Vector(rows[9]), 2)]
    want = store.search_batch(queries)
    handle = store.search_batch_submit(queries)
    got = handle.collect()
    assert got == want
    assert got[0][0].id == "v3" and got[1][0].id == "v9"
    assert [len(r) for r in got] == [4, 2]  # per-query k honored
    assert handle.collect() == want  # idempotent


def test_search_batch_submit_eager_for_hnsw():
    """Index types without a submit path are served eagerly through the
    same handle contract."""
    store = VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN))
    rng = np.random.default_rng(3)
    rows = rng.standard_normal((50, 8)).astype(np.float32)
    store.insert_batch([BatchInsertItem(id=f"v{i}", vector=Vector(rows[i]))
                        for i in range(len(rows))])
    handle = store.search_batch_submit([(Vector(rows[5]), 3)])
    got = handle.collect()
    assert got[0][0].id == "v5"


def test_search_batch_submit_empty():
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
    assert store.search_batch_submit([]).collect() == []
    store.insert("a", Vector([1.0, 0.0]))
    assert store.search_batch_submit(
        [(Vector([1.0, 0.0]), 1)]).collect()[0][0].id == "a"


def test_search_batch_submit_delete_between_submit_and_collect(store):
    """A delete landing between submit and collect must not drop the
    snapshot's results: the id map is frozen copy-on-write at the first
    mutation so collect() reflects the same snapshot point as the
    index's copy-scatter device state."""
    rng = np.random.default_rng(11)
    rows = rng.standard_normal((20, 8)).astype(np.float32)
    store.insert_batch([BatchInsertItem(id=f"v{i}", vector=Vector(rows[i]))
                        for i in range(len(rows))])
    handle = store.search_batch_submit([(Vector(rows[3]), 1)])
    store.delete("v3")          # top hit of the in-flight snapshot
    got = handle.collect()
    assert got[0][0].id == "v3"          # snapshot semantics
    # the live store no longer serves it
    assert store.search(Vector(rows[3]), 1)[0].id != "v3"
    assert store._inflight_id_maps == []  # holder released


def test_search_batch_submit_upsert_between_submit_and_collect(store):
    """An upsert reassigns a fresh internal id; the in-flight handle must
    map the OLD internal id through the frozen submit-time map."""
    rng = np.random.default_rng(12)
    rows = rng.standard_normal((20, 8)).astype(np.float32)
    store.insert_batch([BatchInsertItem(id=f"v{i}", vector=Vector(rows[i]))
                        for i in range(len(rows))])
    handle = store.search_batch_submit([(Vector(rows[7]), 1)])
    store.insert("v7", Vector(-rows[7]))   # upsert: new internal id
    got = handle.collect()
    assert got[0][0].id == "v7"
    # the live store's top hit for the same query is now the NEW row,
    # far from the query — the handle returned the snapshot's row
    assert got[0][0].distance == pytest.approx(0.0, abs=1e-2)
    live = store.search(Vector(rows[7]), 1)[0]
    assert live.distance > 1.0


def test_search_batch_submit_abandoned_handle_releases_holder(store):
    import gc
    rng = np.random.default_rng(13)
    rows = rng.standard_normal((20, 8)).astype(np.float32)
    store.insert_batch([BatchInsertItem(id=f"v{i}", vector=Vector(rows[i]))
                        for i in range(len(rows))])
    handle = store.search_batch_submit([(Vector(rows[2]), 1)])
    store.delete("v2")                      # freezes a map copy
    assert len(store._inflight_id_maps) == 1
    del handle
    gc.collect()
    assert store._inflight_id_maps == []


class TestSearchKnobs:
    def test_nprobe_reaches_ivf(self):
        import numpy as np
        from vectordb_tpu.index.ivf import IvfFlatIndex
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=4,
                           auto_train_min=10 ** 9)
        store = VectorStore(idx)
        rng = np.random.default_rng(1)
        rows = rng.standard_normal((64, 8)).astype(np.float32)
        store.insert_batch([BatchInsertItem(id=f"v{i}",
                                            vector=Vector(rows[i]))
                            for i in range(len(rows))])
        idx.train()
        got = store.search(Vector(rows[9]), 1, nprobe=4)
        assert got[0].id == "v9"
        batch = store.search_batch([(Vector(rows[9]), 1),
                                    (Vector(rows[3]), 2)], nprobe=4)
        assert batch[0][0].id == "v9" and batch[1][0].id == "v3"
        assert len(batch[1]) == 2

    def test_ef_reaches_hnsw_batch(self):
        import numpy as np
        store = VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN))
        rng = np.random.default_rng(2)
        rows = rng.standard_normal((60, 8)).astype(np.float32)
        store.insert_batch([BatchInsertItem(id=f"v{i}",
                                            vector=Vector(rows[i]))
                            for i in range(len(rows))])
        batch = store.search_batch([(Vector(rows[11]), 3)], ef=250)
        assert batch[0][0].id == "v11"

    def test_knob_errors(self):
        from vectordb_tpu.errors import IndexOpError
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        store.insert("a", Vector([1.0, 2.0]))
        with pytest.raises(IndexOpError):
            store.search(Vector([1.0, 2.0]), 1, ef=10)
        with pytest.raises(IndexOpError):
            store.search(Vector([1.0, 2.0]), 1, nprobe=2)
        hs = VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN))
        hs.insert("a", Vector([1.0, 2.0]))
        with pytest.raises(IndexOpError):
            hs.search(Vector([1.0, 2.0]), 1, ef=4, nprobe=2)
        with pytest.raises(IndexOpError):
            hs.search(Vector([1.0, 2.0]), 1, ef=0)
