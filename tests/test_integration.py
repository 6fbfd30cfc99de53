"""Black-box integration tests (parity with reference
tests/integration_test.rs: full workflow + all-metric sweep), plus
cross-layer flows the reference doesn't cover: engine-under-server-style
usage and device-HNSW-under-store."""

import numpy as np
import pytest

from vectordb_tpu import (DistanceMetric, HnswIndex, HnswParams, Metadata,
                          MetadataFilter, Vector, VectorStore)
from vectordb_tpu.persistence import EngineConfig, StorageEngine


def test_full_workflow():
    # insert/search/delete workflow (integration_test.rs:5-27)
    store = VectorStore.new(DistanceMetric.EUCLIDEAN)
    store.insert("a", Vector([1.0, 0.0]))
    store.insert("b", Vector([0.0, 1.0]))
    store.insert("c", Vector([1.0, 1.0]))
    results = store.search(Vector([0.9, 0.1]), 2)
    assert results[0].id == "a"
    assert len(results) == 2
    removed = store.delete("a")
    assert removed == Vector([1.0, 0.0])
    results = store.search(Vector([0.9, 0.1]), 2)
    assert results[0].id != "a"
    assert len(store) == 2


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_all_metrics_workflow(metric):
    # metric sweep (integration_test.rs:29-47)
    store = VectorStore.new(metric)
    store.insert("x", Vector([1.0, 0.2]))
    store.insert("y", Vector([0.2, 1.0]))
    results = store.search(Vector([1.0, 0.1]), 2)
    assert len(results) == 2
    assert results[0].distance <= results[1].distance


def test_persistent_lifecycle_with_filters(tmp_path):
    """Engine persists metadata; a rebuilt store filters correctly."""
    with StorageEngine.open(tmp_path) as eng:
        eng.insert_with_metadata("a", Vector([1.0, 0.0]),
                                 Metadata({"cat": "x"}))
        eng.insert_with_metadata("b", Vector([0.0, 1.0]),
                                 Metadata({"cat": "y"}))
        eng.checkpoint()
    with StorageEngine.open(tmp_path) as eng:
        hits = eng.store.search_with_filter(
            Vector([1.0, 0.0]), 5, MetadataFilter.eq("cat", "y"))
        assert [h.id for h in hits] == ["b"]


def test_store_with_device_hnsw_batch(rng):
    """Store -> HNSW -> device traversal round trip."""
    data = rng.random((300, 16)).astype(np.float32)
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=8))
    store = VectorStore.with_index(idx)
    for i in range(300):
        store.insert(f"v{i}", Vector(data[i]))
    res = idx.search_batch_device(data[:4], 3, ef=60)
    id_map = store.internal_to_string_ids()
    for qi in range(4):
        assert id_map[res[qi][0][0]] == f"v{qi}"


def test_cli_server_roundtrip_in_process():
    """CLI-style store and HTTP router share semantics."""
    from vectordb_tpu.server import test_api
    api, state = test_api()
    api.handle("POST", "/vectors", {"id": "a", "vector": [1.0, 2.0]})
    with state.lock.read():
        assert state.store.get("a") == Vector([1.0, 2.0])
    status, hits = api.handle("POST", "/search", {"vector": [1.0, 2.0]})
    assert status == 200 and hits[0]["id"] == "a"
