"""Device-side (jitted, vmapped) HNSW search vs host traversal and flat
ground truth."""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, FlatIndex, HnswIndex, HnswParams, Vector
from vectordb_tpu.ops.hnsw_device import DeviceHnswSearcher


def build(n, d, metric=DistanceMetric.EUCLIDEAN, seed=9):
    rng = np.random.default_rng(seed)
    data = rng.random((n, d)).astype(np.float32)
    hnsw = HnswIndex(metric, HnswParams(seed=seed))
    hnsw.build_batch([(i, Vector(data[i])) for i in range(n)])
    return data, hnsw


def test_device_search_recall_vs_flat():
    n, d, k, ef = 1000, 32, 10, 100
    data, hnsw = build(n, d)
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch([(i, data[i]) for i in range(n)])
    searcher = DeviceHnswSearcher(hnsw.graph, DistanceMetric.EUCLIDEAN)
    rng = np.random.default_rng(1)
    queries = rng.random((20, d)).astype(np.float32)
    device_res = searcher.search_batch(queries, k, ef)
    flat_res = flat.search_batch(queries, k)
    total = 0.0
    for qi in range(20):
        got = {iid for iid, _ in device_res[qi]}
        expect = {iid for iid, _ in flat_res[qi]}
        total += len(got & expect) / k
    assert total / 20 >= 0.90  # the reference recall gate, on device


def test_device_matches_host_hnsw_closely():
    n, d, k, ef = 500, 16, 10, 80
    data, hnsw = build(n, d, seed=21)
    searcher = DeviceHnswSearcher(hnsw.graph, DistanceMetric.EUCLIDEAN)
    rng = np.random.default_rng(2)
    queries = rng.random((10, d)).astype(np.float32)
    device_res = searcher.search_batch(queries, k, ef)
    overlap = 0.0
    for qi in range(10):
        host_ids = {iid for iid, _ in
                    hnsw.search_with_ef(Vector(queries[qi]), k, ef)}
        dev_ids = {iid for iid, _ in device_res[qi]}
        overlap += len(host_ids & dev_ids) / k
    # same graph, same ef -> traversals agree almost everywhere
    assert overlap / 10 >= 0.9


def test_device_search_self_query():
    n, d = 300, 8
    data, hnsw = build(n, d, seed=33)
    searcher = DeviceHnswSearcher(hnsw.graph, DistanceMetric.EUCLIDEAN)
    res = searcher.search_batch(data[:8], 1, 50)
    hits = sum(int(res[i] and res[i][0][0] == i) for i in range(8))
    assert hits >= 7


def test_device_search_distances_sorted_and_finite():
    n, d, k = 200, 8, 5
    data, hnsw = build(n, d, seed=5)
    searcher = DeviceHnswSearcher(hnsw.graph, DistanceMetric.EUCLIDEAN)
    res = searcher.search_batch(data[:4], k, 60)
    for row in res:
        assert len(row) == k
        dists = [dv for _, dv in row]
        assert dists == sorted(dists)


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE,
                                    DistanceMetric.DOT_PRODUCT])
def test_device_search_other_metrics(metric):
    n, d, k = 300, 16, 5
    rng = np.random.default_rng(17)
    data = rng.random((n, d)).astype(np.float32) + 0.1
    hnsw = HnswIndex(metric, HnswParams(seed=17))
    hnsw.build_batch([(i, Vector(data[i])) for i in range(n)])
    searcher = DeviceHnswSearcher(hnsw.graph, metric)
    res = searcher.search_batch(data[:5], k, 100)
    flat = FlatIndex(metric)
    flat.add_batch([(i, data[i]) for i in range(n)])
    flat_res = flat.search_batch(data[:5], k)
    total = 0.0
    for qi in range(5):
        got = {iid for iid, _ in res[qi]}
        expect = {iid for iid, _ in flat_res[qi]}
        total += len(got & expect) / k
    assert total / 5 >= 0.8


def test_device_search_after_deletes():
    n, d = 200, 8
    data, hnsw = build(n, d, seed=41)
    for i in range(0, 50):
        hnsw.remove(i)
    searcher = DeviceHnswSearcher(hnsw.graph, DistanceMetric.EUCLIDEAN)
    res = searcher.search_batch(data[:4], 5, 60)
    for row in res:
        assert all(iid >= 50 for iid, _ in row)
