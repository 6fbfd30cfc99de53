"""FlatIndex: exact device flat scan vs a NumPy oracle
(parity with reference src/flat_index.rs:76-115 tests plus oracle checks)."""

import numpy as np
import pytest

from vectordb_tpu import (DimensionMismatchError, DistanceMetric, FlatIndex,
                          InvalidVectorError, Vector)
from vectordb_tpu.distance import pairwise_distances


def test_add_and_search():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add(0, Vector([0.0, 0.0]))
    idx.add(1, Vector([1.0, 0.0]))
    idx.add(2, Vector([5.0, 5.0]))
    results = idx.search(Vector([0.9, 0.0]), 2)
    assert [r[0] for r in results] == [1, 0]
    assert results[0][1] == pytest.approx(0.1, abs=1e-5)


def test_remove():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add(0, Vector([0.0, 0.0]))
    idx.add(1, Vector([1.0, 0.0]))
    idx.remove(0)
    assert len(idx) == 1
    assert idx.get_vector(0) is None
    results = idx.search(Vector([0.0, 0.0]), 5)
    assert [r[0] for r in results] == [1]


def test_remove_unknown_is_noop():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add(0, Vector([1.0]))
    idx.remove(123)
    assert len(idx) == 1


def test_k_larger_than_len():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add(0, Vector([0.0]))
    idx.add(1, Vector([1.0]))
    assert len(idx.search(Vector([0.5]), 10)) == 2


def test_empty_search():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    assert idx.search(Vector([1.0]), 5) == []
    assert idx.is_empty()


def test_dimension_enforced():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add(0, Vector([1.0, 2.0]))
    with pytest.raises(DimensionMismatchError):
        idx.add(1, Vector([1.0, 2.0, 3.0]))
    with pytest.raises(DimensionMismatchError):
        idx.search(Vector([1.0]), 1)


def test_add_overwrites_same_internal_id():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add(7, Vector([0.0, 0.0]))
    idx.add(7, Vector([9.0, 9.0]))
    assert len(idx) == 1
    assert idx.get_vector(7) == Vector([9.0, 9.0])


def test_cosine_zero_vector_in_db_errors_search():
    idx = FlatIndex(DistanceMetric.COSINE)
    idx.add(0, Vector([1.0, 0.0]))
    idx.add(1, Vector([0.0, 0.0]))
    with pytest.raises(InvalidVectorError):
        idx.search(Vector([1.0, 1.0]), 2)


def test_cosine_zero_query_errors():
    idx = FlatIndex(DistanceMetric.COSINE)
    idx.add(0, Vector([1.0, 0.0]))
    with pytest.raises(InvalidVectorError):
        idx.search(Vector([0.0, 0.0]), 1)


def test_zero_vector_ok_after_removal():
    idx = FlatIndex(DistanceMetric.COSINE)
    idx.add(0, Vector([1.0, 0.0]))
    idx.add(1, Vector([0.0, 0.0]))
    idx.remove(1)
    assert len(idx.search(Vector([1.0, 1.0]), 2)) == 1


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_oracle_parity_10k(metric, rng):
    """Gate from SURVEY §7 phase 2: exact-match parity with a NumPy oracle.

    Uses abs(values) for cosine-safety and checks the top-10 ids and
    distances against a full numpy scan.
    """
    n, d, k = 2048, 64, 10
    db = (rng.standard_normal((n, d)).astype(np.float32) + 3.0)
    queries = (rng.standard_normal((8, d)).astype(np.float32) + 3.0)

    idx = FlatIndex(metric)
    idx.add_batch([(i, db[i]) for i in range(n)])

    oracle = pairwise_distances(np, queries, db, metric)
    results = idx.search_batch(queries, k)
    for qi in range(queries.shape[0]):
        expect_order = np.argsort(oracle[qi], kind="stable")[:k]
        got_ids = [r[0] for r in results[qi]]
        got_dists = np.array([r[1] for r in results[qi]])
        np.testing.assert_allclose(
            got_dists, np.sort(oracle[qi])[:k], rtol=1e-4, atol=1e-4)
        # ids must agree wherever distances are not tied
        expected_dists = oracle[qi][expect_order]
        for pos in range(k):
            ties = np.isclose(expected_dists, expected_dists[pos],
                              rtol=1e-6, atol=1e-6)
            candidates = set(int(expect_order[t])
                             for t in np.nonzero(ties)[0])
            assert got_ids[pos] in candidates


def test_capacity_growth_and_many_deletes(rng):
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    d = 8
    data = rng.standard_normal((3000, d)).astype(np.float32)
    for i in range(3000):
        idx.add(i, Vector(data[i]))
    assert len(idx) == 3000
    for i in range(0, 3000, 2):
        idx.remove(i)
    assert len(idx) == 1500
    # search touches only live rows
    results = idx.search(Vector(data[1]), 3)
    assert results[0][0] == 1
    assert all(r[0] % 2 == 1 for r in results)
    # slots get reused
    idx.add(9001, Vector(data[0]))
    assert len(idx) == 1501
    assert idx.search(Vector(data[0]), 1)[0][0] == 9001


def test_interleaved_updates_keep_device_in_sync(rng):
    """Insert/search interleaving exercises the scatter-update path."""
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    d = 4
    for i in range(50):
        v = np.zeros(d, dtype=np.float32)
        v[0] = i
        idx.add(i, Vector(v))
        best = idx.search(Vector(v), 1)
        assert best[0][0] == i
        assert best[0][1] == pytest.approx(0.0, abs=1e-6)


def test_masked_search():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    for i in range(10):
        idx.add(i, Vector([float(i), 0.0]))
    mask = np.zeros(idx.capacity, dtype=bool)
    # only allow the slots currently holding ids 5..9
    for iid in range(5, 10):
        mask[idx.slot_of(iid)] = True
    results = idx.search_masked(Vector([0.0, 0.0]), 3, mask)
    assert [r[0] for r in results] == [5, 6, 7]


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_fast_mode_matches_exact(metric, rng):
    """The two-tier fast path returns the same ids/distances as the exact
    scan on CPU (where coarse precision == f32, so results are identical);
    on TPU the coarse pass is bf16-grade and the 8x over-fetch guards it."""
    n, d, k = 1024, 32, 10
    db = rng.standard_normal((n, d)).astype(np.float32) + 1.0
    queries = rng.standard_normal((6, d)).astype(np.float32) + 1.0
    exact = FlatIndex(metric)
    exact.add_batch([(i, db[i]) for i in range(n)])
    fast = FlatIndex(metric, search_mode="fast")
    fast.add_batch([(i, db[i]) for i in range(n)])
    res_e = exact.search_batch(queries, k)
    res_f = fast.search_batch(queries, k)
    for re, rf in zip(res_e, res_f):
        assert [x[0] for x in re] == [x[0] for x in rf]
        np.testing.assert_allclose([x[1] for x in re], [x[1] for x in rf],
                                   rtol=1e-4, atol=1e-4)


def test_fast_mode_with_deletes_and_mask(rng):
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, search_mode="fast")
    for i in range(50):
        idx.add(i, Vector([float(i), 0.0]))
    idx.remove(3)
    res = idx.search(Vector([3.0, 0.0]), 2)
    assert [r[0] for r in res] == [2, 4]
    mask = np.zeros(idx.capacity, dtype=bool)
    for iid in range(10, 20):
        mask[idx.slot_of(iid)] = True
    res = idx.search_masked(Vector([0.0, 0.0]), 3, mask)
    assert [r[0] for r in res] == [10, 11, 12]


def test_search_mode_validation():
    with pytest.raises(ValueError):
        FlatIndex(DistanceMetric.EUCLIDEAN, search_mode="approximate")


def test_bulk_append_fresh_ids_into_live_index(rng):
    """add_batch of fresh distinct ids into a NON-empty index takes the
    vectorized append path with identical semantics to per-item adds."""
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.index.flat import FlatIndex

    d = 16
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    base = rng.standard_normal((10, d)).astype(np.float32)
    idx.add_batch(list(enumerate(base)))
    more = rng.standard_normal((50, d)).astype(np.float32)
    idx.add_batch([(100 + i, more[i]) for i in range(50)])
    assert len(idx) == 60
    got = idx.search_batch(more[3].reshape(1, -1), 1)[0]
    assert got[0][0] == 103
    # dirty slots flow through the scatter path on the next search
    got = idx.search_batch(base[2].reshape(1, -1), 1)[0]
    assert got[0][0] == 2


def test_bulk_append_prefix_applied_on_dim_error(rng):
    """Reference add_batch semantics on the bulk-append path: the accepted
    prefix is applied before the dimension error surfaces
    (storage.rs:293-298)."""
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.errors import DimensionMismatchError
    from vectordb_tpu.index.flat import FlatIndex

    d = 8
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add_batch(list(enumerate(
        rng.standard_normal((4, d)).astype(np.float32))))
    items = [(10, rng.standard_normal(d).astype(np.float32)),
             (11, rng.standard_normal(d).astype(np.float32)),
             (12, rng.standard_normal(d + 1).astype(np.float32)),
             (13, rng.standard_normal(d).astype(np.float32))]
    with pytest.raises(DimensionMismatchError):
        idx.add_batch(items)
    assert len(idx) == 6
    assert idx.slot_of(10) is not None and idx.slot_of(11) is not None
    assert idx.slot_of(12) is None and idx.slot_of(13) is None


def test_bulk_append_falls_back_on_upsert(rng):
    """A batch containing an EXISTING id must take the per-item path so
    upsert semantics (old row removed, fresh slot) hold."""
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.index.flat import FlatIndex

    d = 8
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    rows = rng.standard_normal((5, d)).astype(np.float32)
    idx.add_batch(list(enumerate(rows)))
    new2 = (rows[2] + 10.0).astype(np.float32)
    idx.add_batch([(2, new2), (50, rows[0] + 5.0)])
    assert len(idx) == 6
    got = idx.search_batch(new2.reshape(1, -1), 1)[0]
    assert got[0][0] == 2


def test_search_batch_submit_matches_sync(rng):
    """The async handle returns exactly what the sync path returns, and
    releases the in-flight mark on collect."""
    d = 16
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    rows = rng.standard_normal((40, d)).astype(np.float32)
    idx.add_batch(list(enumerate(rows)))
    queries = rng.standard_normal((6, d)).astype(np.float32)
    want = idx.search_batch(queries, 5)
    handle = idx.search_batch_submit(queries, 5)
    assert idx._searches_in_flight == 1
    got = handle.collect()
    assert got == want
    assert handle.collect() == want  # idempotent
    assert idx._searches_in_flight == 0


def test_search_batch_submit_snapshot_under_mutation(rng):
    """Writes landing between submit and collect must not leak into the
    in-flight results (the copy-scatter snapshot contract)."""
    d = 8
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    rows = rng.standard_normal((20, d)).astype(np.float32)
    idx.add_batch(list(enumerate(rows)))
    query = rows[3].reshape(1, -1)
    handle = idx.search_batch_submit(query, 1)
    # mutate while in flight: overwrite the current best hit's row
    idx.remove(3)
    idx.add(99, Vector(query[0]))
    got = handle.collect()
    assert got[0][0][0] == 3  # snapshot point: row 3 still the hit
    assert got[0][0][1] == pytest.approx(0.0, abs=1e-5)
    # a fresh search sees the new state
    fresh = idx.search_batch(query, 1)
    assert fresh[0][0][0] == 99


def test_search_batch_submit_abandoned_handle_releases(rng):
    d = 8
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add_batch(list(enumerate(
        rng.standard_normal((10, d)).astype(np.float32))))
    handle = idx.search_batch_submit(
        rng.standard_normal((2, d)).astype(np.float32), 3)
    assert idx._searches_in_flight == 1
    del handle
    assert idx._searches_in_flight == 0


def test_search_batch_submit_empty_index():
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    handle = idx.search_batch_submit(np.zeros((3, 4), np.float32), 5)
    assert handle.collect() == [[], [], []]


def test_bulk_load_matrix_rejects_duplicate_ids(rng):
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    mat = rng.standard_normal((4, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="duplicate ids"):
        idx.bulk_load_matrix(np.array([0, 1, 1, 2], np.int64), mat)
    # the failed load must not leave partial state behind
    assert len(idx) == 0
    idx.bulk_load_matrix(np.array([0, 1, 2, 3], np.int64), mat)
    assert len(idx) == 4
