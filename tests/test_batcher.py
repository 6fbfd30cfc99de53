"""Dynamic query batching: correctness under concurrency and per-request
error isolation."""

import threading

import numpy as np
import pytest

from vectordb_tpu import (DistanceMetric, Metadata, MetadataFilter, Vector,
                          VectorStore)
from vectordb_tpu.errors import DimensionMismatchError
from vectordb_tpu.server import AppState
from vectordb_tpu.server.batcher import QueryBatcher
from vectordb_tpu.server.routes import Api


@pytest.fixture
def setup(rng):
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
    data = rng.standard_normal((100, 8)).astype(np.float32)
    for i in range(100):
        store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                   Metadata({"par": str(i % 2)}))
    state = AppState(store)
    batcher = QueryBatcher(store, state.lock, window_ms=5.0)
    yield store, state, batcher, data
    batcher.close()


def test_single_search(setup):
    store, state, batcher, data = setup
    hits = batcher.search(Vector(data[7]), 3)
    assert hits[0].id == "v7"
    assert len(hits) == 3


def test_concurrent_searches_all_correct(setup):
    store, state, batcher, data = setup
    results = {}
    errors = []

    def worker(i):
        try:
            results[i] = batcher.search(Vector(data[i]), 1)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    for i in range(32):
        assert results[i][0].id == f"v{i}"


def test_mixed_ks(setup):
    store, state, batcher, data = setup
    out = {}

    def worker(i, k):
        out[i] = batcher.search(Vector(data[i]), k)

    threads = [threading.Thread(target=worker, args=(i, 1 + i % 5))
               for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i in range(10):
        assert len(out[i]) == 1 + i % 5
        assert out[i][0].id == f"v{i}"


def test_filtered_search_via_batcher(setup):
    store, state, batcher, data = setup
    flt = MetadataFilter.eq("par", "1")
    hits = batcher.search(Vector(data[3]), 5, flt)
    assert hits[0].id == "v3"
    assert all(int(h.id[1:]) % 2 == 1 for h in hits)


def test_bad_dimension_fails_alone(setup):
    store, state, batcher, data = setup
    outcome = {}

    def good(i):
        outcome[i] = batcher.search(Vector(data[i]), 1)

    def bad():
        try:
            batcher.search(Vector([1.0, 2.0]), 1)
            outcome["bad"] = "no-error"
        except DimensionMismatchError:
            outcome["bad"] = "dim-error"

    threads = ([threading.Thread(target=good, args=(i,)) for i in range(4)]
               + [threading.Thread(target=bad)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert outcome["bad"] == "dim-error"
    for i in range(4):
        assert outcome[i][0].id == f"v{i}"


def test_api_with_batcher(setup):
    store, state, batcher, data = setup
    api = Api(state, batcher=batcher)
    status, hits = api.handle("POST", "/search", {
        "vector": [float(x) for x in data[5]], "k": 2})
    assert status == 200
    assert hits[0]["id"] == "v5"
    status, payload = api.handle("POST", "/search", {"vector": [1.0]})
    assert status == 400
    assert "Dimension mismatch" in payload["error"]
