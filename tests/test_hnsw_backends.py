"""Native C++ vs pure-Python HNSW backend parity."""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, FlatIndex, HnswIndex, HnswParams, Vector
from vectordb_tpu.index.hnsw_graph import HnswGraph
from vectordb_tpu.index.hnsw_native import native_available


@pytest.fixture(params=["python", "native"])
def backend(request):
    if request.param == "native" and not native_available():
        pytest.skip("native HNSW core unavailable")
    return request.param


def make_index(backend, metric=DistanceMetric.EUCLIDEAN, seed=11):
    return HnswIndex(metric, HnswParams(seed=seed), backend=backend)


def test_backend_selection():
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=1),
                    backend="python")
    assert isinstance(idx.graph, HnswGraph)
    with pytest.raises(ValueError):
        HnswIndex(DistanceMetric.EUCLIDEAN, backend="gpu")


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_recall_gate_both_backends(backend, metric, rng):
    n, d, k, ef = 600, 32, 10, 100
    data = (rng.random((n, d)).astype(np.float32) + 0.05)
    idx = make_index(backend, metric)
    idx.build_batch([(i, Vector(data[i])) for i in range(n)])
    flat = FlatIndex(metric)
    flat.add_batch([(i, data[i]) for i in range(n)])
    queries = rng.random((15, d)).astype(np.float32) + 0.05
    truth = flat.search_batch(queries, k)
    total = 0.0
    for qi in range(15):
        got = {i for i, _ in idx.search_with_ef(Vector(queries[qi]), k, ef)}
        total += len(got & {i for i, _ in truth[qi]}) / k
    assert total / 15 >= 0.9


def test_crud_semantics_parity(backend):
    idx = make_index(backend)
    idx.add(0, Vector([0.0, 0.0]))
    idx.add(1, Vector([1.0, 0.0]))
    idx.add(2, Vector([0.0, 1.0]))
    assert len(idx) == 3
    assert idx.get_vector(1) == Vector([1.0, 0.0])
    # overwrite same internal id
    idx.add(1, Vector([5.0, 5.0]))
    assert len(idx) == 3
    assert idx.get_vector(1) == Vector([5.0, 5.0])
    # remove + unknown remove is a no-op
    idx.remove(0)
    idx.remove(99)
    assert len(idx) == 2
    assert idx.get_vector(0) is None
    res = idx.search(Vector([0.0, 0.0]), 5)
    assert {i for i, _ in res} == {1, 2}
    dists = [d for _, d in res]
    assert dists == sorted(dists)


def test_cosine_zero_vector_error_parity(backend):
    from vectordb_tpu.errors import InvalidVectorError
    idx = make_index(backend, DistanceMetric.COSINE)
    idx.add(0, Vector([1.0, 0.0]))
    # inserting a zero vector into a non-empty cosine graph computes a
    # distance against it -> errors at insert, like the reference
    with pytest.raises(InvalidVectorError):
        idx.add(1, Vector([0.0, 0.0]))
    # zero query errors at search
    with pytest.raises(InvalidVectorError):
        idx.search(Vector([0.0, 0.0]), 1)


def test_remove_entry_point_parity(backend, rng):
    data = rng.random((40, 8)).astype(np.float32)
    idx = make_index(backend, seed=5)
    for i in range(40):
        idx.add(i, Vector(data[i]))
    entry_slot = idx.graph._entry
    entry_id = idx.graph.id_of(entry_slot)
    idx.remove(entry_id)
    assert len(idx) == 39
    res = idx.search(Vector(data[(entry_id + 1) % 40]), 5)
    assert res and all(i != entry_id for i, _ in res)


def test_device_tables_export_parity(backend, rng):
    """Both backends export tables the device traversal can run."""
    from vectordb_tpu.ops.hnsw_device import DeviceHnswSearcher
    data = rng.random((200, 16)).astype(np.float32)
    idx = make_index(backend, seed=7)
    idx.build_batch([(i, Vector(data[i])) for i in range(200)])
    searcher = DeviceHnswSearcher(idx.graph, DistanceMetric.EUCLIDEAN)
    res = searcher.search_batch(data[:5], 3, 60)
    hits = sum(int(res[i] and res[i][0][0] == i) for i in range(5))
    assert hits >= 4


def test_store_upsert_filter_flow_parity(backend, rng):
    from vectordb_tpu import Metadata, MetadataFilter, VectorStore
    store = VectorStore.with_index(make_index(backend, seed=13))
    data = rng.random((60, 8)).astype(np.float32)
    for i in range(60):
        store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                   Metadata({"par": str(i % 2)}))
    store.insert("v0", Vector(data[1]))  # upsert
    assert len(store) == 60
    hits = store.search_with_filter(Vector(data[8]), 5,
                                    MetadataFilter.eq("par", "0"))
    assert hits and all(int(h.id[1:]) % 2 == 0 for h in hits)


def test_dimension_enforced_parity(backend):
    from vectordb_tpu.errors import DimensionMismatchError
    idx = make_index(backend)
    idx.add(0, Vector([1.0, 2.0]))
    with pytest.raises(DimensionMismatchError):
        idx.add(1, Vector([1.0]))
    with pytest.raises(DimensionMismatchError):
        idx.search(Vector([1.0, 2.0, 3.0]), 1)
