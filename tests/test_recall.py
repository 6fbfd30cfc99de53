"""Statistical recall gates for HNSW vs flat ground truth.

Parity with reference tests/recall_test.rs: random uniform vectors, the
flat index as exact ground truth, recall@k = |HNSW ∩ flat| / k averaged
over queries, with the reference thresholds:
    n=100,  d=32,  ef=100 -> >= 0.90   (recall_test.rs:67-70)
    n=1000, d=64,  ef=100 -> >= 0.90   (recall_test.rs:72-75)
    n=5000, d=128, ef=100 -> >= 0.85   (recall_test.rs:77-80)
"""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, FlatIndex, HnswIndex, HnswParams, Vector


def random_vectors(rng, n, d):
    # uniform in [0, 1), like the reference's rand::random (recall_test.rs:8-16)
    return rng.random((n, d)).astype(np.float32)


def recall_at_k(hnsw_ids, flat_ids, k):
    return len(set(hnsw_ids) & set(flat_ids)) / k


def run_recall(n, d, k, ef, num_queries, seed=7):
    rng = np.random.default_rng(seed)
    data = random_vectors(rng, n, d)
    flat = FlatIndex(DistanceMetric.EUCLIDEAN)
    flat.add_batch([(i, data[i]) for i in range(n)])
    hnsw = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=seed))
    hnsw.build_batch([(i, Vector(data[i])) for i in range(n)])

    queries = random_vectors(rng, num_queries, d)
    flat_results = flat.search_batch(queries, k)
    total = 0.0
    for qi in range(num_queries):
        hnsw_ids = [iid for iid, _ in
                    hnsw.search_with_ef(Vector(queries[qi]), k, ef)]
        flat_ids = [iid for iid, _ in flat_results[qi]]
        total += recall_at_k(hnsw_ids, flat_ids, k)
    return total / num_queries


def test_recall_small():
    # reference gate: n=100, d=32 -> 0.90 (recall_test.rs:67-70)
    assert run_recall(n=100, d=32, k=10, ef=100, num_queries=20) >= 0.90


def test_recall_medium():
    # reference gate: n=1000, d=64 -> 0.90 (recall_test.rs:72-75)
    assert run_recall(n=1000, d=64, k=10, ef=100, num_queries=20) >= 0.90


@pytest.mark.slow
def test_recall_large():
    # reference gate: n=5000, d=128 -> 0.85 (recall_test.rs:77-80)
    assert run_recall(n=5000, d=128, k=10, ef=100, num_queries=20) >= 0.85


def test_hnsw_self_search():
    # every stored vector must find itself (reference graph.rs:457-485)
    rng = np.random.default_rng(3)
    data = random_vectors(rng, 100, 16)
    hnsw = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=3))
    hnsw.build_batch([(i, Vector(data[i])) for i in range(100)])
    hits = 0
    for i in range(100):
        results = hnsw.search_with_ef(Vector(data[i]), 1, 50)
        hits += int(results and results[0][0] == i)
    assert hits >= 99


def test_hnsw_remove_entry_point():
    # removing the entry point promotes a new one (reference graph.rs:523-538)
    rng = np.random.default_rng(5)
    data = random_vectors(rng, 50, 8)
    hnsw = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=5))
    for i in range(50):
        hnsw.add(i, Vector(data[i]))
    entry_slot = hnsw.graph._entry
    entry_id = hnsw.graph.id_of(entry_slot)
    hnsw.remove(entry_id)
    assert len(hnsw) == 49
    results = hnsw.search(Vector(data[(entry_id + 1) % 50]), 5)
    assert results
    assert all(iid != entry_id for iid, _ in results)


def test_hnsw_ef_improves_recall():
    """Higher ef must not reduce average recall (sanity of the ef knob)."""
    lo = run_recall(n=500, d=32, k=10, ef=10, num_queries=10, seed=11)
    hi = run_recall(n=500, d=32, k=10, ef=200, num_queries=10, seed=11)
    assert hi >= lo
    assert hi >= 0.95


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE,
                                    DistanceMetric.DOT_PRODUCT])
def test_hnsw_other_metrics(metric):
    rng = np.random.default_rng(13)
    data = (rng.random((200, 16)).astype(np.float32) + 0.1)
    hnsw = HnswIndex(metric, HnswParams(seed=13))
    hnsw.build_batch([(i, Vector(data[i])) for i in range(200)])
    flat = FlatIndex(metric)
    flat.add_batch([(i, data[i]) for i in range(200)])
    total = 0.0
    queries = rng.random((10, 16)).astype(np.float32) + 0.1
    flat_results = flat.search_batch(queries, 10)
    for qi in range(10):
        hnsw_ids = [iid for iid, _ in
                    hnsw.search_with_ef(Vector(queries[qi]), 10, 100)]
        total += recall_at_k(hnsw_ids,
                             [iid for iid, _ in flat_results[qi]], 10)
    assert total / 10 >= 0.85
