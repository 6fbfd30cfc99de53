"""IvfPqIndex: IVF cluster layout + PQ residual codes + exact re-rank.

Runs on the CPU test backend. The family contract mirrors PqFlatIndex
(exact f32 distances over the true stored rows; recall governed by
``refine``) plus IvfFlatIndex's trained-layout persistence. The headline
property — residual codes beat raw-row codes on clustered data — is
asserted directly against PqFlatIndex on the same workload.
"""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, VectorStore
from vectordb_tpu.distance import pairwise_distances
from vectordb_tpu.errors import IndexOpError
from vectordb_tpu.index import IvfPqIndex, PqFlatIndex
from vectordb_tpu.metadata import Metadata, MetadataFilter
from vectordb_tpu.vector import Vector


def _clustered(rng, n, d, n_centers=64, scale=0.15):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    which = rng.integers(0, n_centers, n)
    return (centers[which]
            + scale * rng.standard_normal((n, d)).astype(np.float32))


def _flat_topk(queries, db, metric, k):
    dists = pairwise_distances(np, queries, db, metric)
    return np.argsort(dists, axis=1, kind="stable")[:, :k]


def _recall(results, want, k):
    return float(np.mean([len({i for i, _ in got} & set(w.tolist())) / k
                          for got, w in zip(results, want)]))


def test_train_and_recall_euclidean(rng):
    n, d, q, k = 4096, 32, 40, 10
    db = _clustered(rng, n, d)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=32, m=8, ksub=64,
                     refine=64, seed=1)
    idx.add_batch([(i, db[i]) for i in range(n)])
    assert not idx.is_trained
    idx.train()
    assert idx.is_trained
    queries = db[rng.choice(n, q, replace=False)] + 0.005
    results = idx.search_batch(queries, k)
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)
    assert _recall(results, want, k) >= 0.9
    # returned distances are EXACT f32 values over the true stored rows
    for qi, got in enumerate(results[:5]):
        for rid, dist in got:
            ref = float(np.linalg.norm(queries[qi] - db[rid]))
            assert abs(dist - ref) < 1e-3, (rid, dist, ref)
    for got in results:
        dd = [dv for _, dv in got]
        assert dd == sorted(dd)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_exact_distances_per_metric(rng, metric):
    n, d, q, k = 2048, 16, 8, 5
    db = _clustered(rng, n, d, n_centers=16)
    if metric is DistanceMetric.COSINE:
        db = db[np.linalg.norm(db, axis=1) > 1e-3]
        n = len(db)
    idx = IvfPqIndex(metric, nlist=16, m=4, ksub=32, refine=64)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    queries = db[:q] * 1.01
    results = idx.search_batch(queries, k)
    exact = pairwise_distances(np, queries, db, metric)
    for qi, got in enumerate(results):
        assert len(got) == k
        for rid, dist in got:
            assert abs(dist - float(exact[qi, rid])) < 2e-3


def test_residuals_beat_raw_codes_on_clustered_data(rng):
    """The family's reason to exist: within tight clusters raw-row PQ
    codes tie and recall collapses; residual codes resolve the
    deviations. Same data, same m/ksub/refine, same seed."""
    n, d, q, k = 16384, 64, 48, 10
    nc = 128
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    db = (centers[rng.integers(0, nc, n)]
          + 0.2 * rng.standard_normal((n, d)).astype(np.float32))
    queries = (centers[rng.integers(0, nc, q)]
               + 0.2 * rng.standard_normal((q, d)).astype(np.float32))
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)
    ids = np.arange(n, dtype=np.int64)

    plain = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=8, seed=1)
    plain.bulk_load_matrix(ids, db)
    plain.train()
    r_plain = _recall(plain.search_batch(queries, k, refine=64), want, k)

    res = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=nc, m=8, seed=1)
    res.bulk_load_matrix(ids, db)
    res.train()
    r_res = _recall(res.search_batch(queries, k, refine=64), want, k)
    assert r_res >= r_plain + 0.1, (r_res, r_plain)
    assert r_res >= 0.85, r_res


def test_refine_knob_and_search_with_refine(rng):
    n, d, q, k = 4096, 32, 32, 10
    db = _clustered(rng, n, d, n_centers=16, scale=0.5)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=16, m=16, ksub=16,
                     seed=3)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    queries = db[:q] + 0.01
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)
    recalls = [_recall(idx.search_batch(queries, k, refine=r), want, k)
               for r in (k, 64, 256)]
    assert recalls[-1] >= recalls[0] - 0.02     # monotone-ish in refine
    assert recalls[-1] >= 0.95
    one = idx.search_with_refine(Vector(db[0] + 0.01), k, 256)
    assert len(one) == k
    # nprobe is not a knob here: the scan streams all clusters
    assert idx.search_with_nprobe is None
    assert idx.calibrate_nprobe is None


def test_mutations_after_training(rng):
    n, d, k = 4096, 24, 5
    db = _clustered(rng, n, d, n_centers=32)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=32, m=8, ksub=32,
                     refine=64)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    # insert lands in its cluster (or spill) and is immediately findable
    new_row = db[7] + 0.002
    idx.add(10_000, new_row)
    got = idx.search_batch(new_row[None, :], 1)[0]
    assert got[0][0] == 10_000 and got[0][1] < 1e-4
    # upsert: same id, new value
    idx.add(10_000, db[9] + 0.003)
    got = idx.search_batch((db[9] + 0.003)[None, :], 1)[0]
    assert got[0][0] == 10_000
    # remove: never returned again
    idx.remove(3)
    got = idx.search_batch(db[3][None, :], k)[0]
    assert all(i != 3 for i, _ in got)
    assert len(idx) == n


def test_spill_rows_are_searchable(rng):
    """Rows that overflow their cluster land in the spill region and are
    encoded vs their NEAREST centroid — they must stay findable with
    exact distances."""
    n, d = 2048, 16
    db = _clustered(rng, n, d, n_centers=8, scale=0.3)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8, m=4, ksub=16,
                     refine=64)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    # force rows into the spill: fill one cluster's free slots by
    # repeatedly inserting near one center until spill slots are used
    base = db[0]
    added = []
    for j in range(600):
        iid = 50_000 + j
        idx.add(iid, base + 0.001 * rng.standard_normal(d).astype(
            np.float32))
        added.append(iid)
        if not idx._spill_free:
            break
    assert (np.asarray(idx._spill_cid) >= -1).all()
    spill_live = [s for s in range(idx._spill_base, idx.capacity)
                  if idx._valid[s]]
    if not spill_live:
        pytest.skip("layout absorbed all inserts without spilling")
    sid = int(idx._id_of_slot[spill_live[0]])
    row = np.asarray(idx._vectors[spill_live[0]])
    got = idx.search_batch(row[None, :], 1)[0]
    assert got[0][0] == sid and got[0][1] < 1e-5


def test_filtered_search_exact_through_store(rng):
    n, d, k = 4096, 16, 5
    db = _clustered(rng, n, d, n_centers=16)
    store = VectorStore.with_index(
        IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=16, m=4, ksub=32,
                   refine=128))
    from vectordb_tpu.store import BatchInsertItem
    store.insert_batch([
        BatchInsertItem(id=f"v{i}", vector=Vector(db[i]),
                        metadata=Metadata({"par": str(i % 3)}))
        for i in range(n)])
    store.index.train()
    q = Vector(db[5])
    flt = MetadataFilter.eq("par", "1")
    got = store.search_with_filter(q, k, flt)
    eligible = np.array([i for i in range(n) if i % 3 == 1])
    dists = np.linalg.norm(db[eligible] - db[5][None, :], axis=1)
    want_ids = [f"v{eligible[j]}" for j in np.argsort(dists,
                                                      kind="stable")[:k]]
    assert [r.id for r in got] == want_ids
    for r, j in zip(got, np.argsort(dists, kind="stable")[:k]):
        assert abs(r.distance - float(dists[j])) < 1e-4


def test_auto_train_threshold(rng):
    n, d = 600, 16
    db = _clustered(rng, n, d, n_centers=8)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8, m=4, ksub=16,
                     auto_train_min=512)
    idx.add_batch([(i, db[i]) for i in range(n)])
    assert not idx.is_trained
    got = idx.search_batch(db[:2], 3)       # crosses the threshold
    assert idx.is_trained
    assert got[0][0][0] == 0


def test_untrained_falls_back_to_exact_scan(rng):
    n, d, k = 256, 16, 5
    db = _clustered(rng, n, d, n_centers=4)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8)
    idx.add_batch([(i, db[i]) for i in range(n)])
    got = idx.search_batch(db[:4] + 0.001, k)
    want = _flat_topk(db[:4] + 0.001, db, DistanceMetric.EUCLIDEAN, k)
    assert _recall(got, want, k) == 1.0


def test_huge_refine_falls_back_to_exact_scan(rng):
    n, d, k = 2048, 16, 1500
    db = _clustered(rng, n, d, n_centers=8)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8, m=4, ksub=16)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    got = idx.search_batch(db[:2], k)
    assert len(got[0]) == k
    dd = [dv for _, dv in got[0]]
    assert dd == sorted(dd)


def test_trained_state_roundtrip_bit_identical(rng, tmp_path):
    """Engine checkpoint -> crash -> reopen restores the trained layout
    AND the residual codebook: no retrain, bit-identical results
    (engine.rs:44-73 recover-to-identical parity, extended)."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine
    n, d, k = 1024, 16, 5
    db = _clustered(rng, n, d, n_centers=8)
    cfg = EngineConfig(checkpoint_interval=10_000, index_type="ivfpq")
    eng = StorageEngine.open(tmp_path, cfg)
    for i in range(n):
        eng.insert(f"v{i}", Vector(db[i]))
    eng.store.index.train()
    eng.checkpoint()
    # post-checkpoint WAL tail (replays on top of the imported layout)
    eng.insert("tail", Vector(db[0] + 0.01))
    queries = db[:8] + 0.002
    before = [eng.store.search(Vector(qv), k) for qv in queries]
    trained_before = eng.store.index.is_trained
    lv_before = eng.store.index.slot_layout_version
    eng.close()         # crash-equivalent: no final checkpoint

    eng2 = StorageEngine.open(tmp_path, cfg)
    idx2 = eng2.store.index
    assert trained_before and idx2.is_trained, "reopen must not retrain"
    after = [eng2.store.search(Vector(qv), k) for qv in queries]
    for b_row, a_row in zip(before, after):
        assert [r.id for r in b_row] == [r.id for r in a_row]
        for rb, ra in zip(b_row, a_row):
            assert rb.distance == ra.distance    # bit-identical
    # the imported layout is the SAME layout (spill cids persisted, codes
    # re-encoded deterministically)
    assert np.array_equal(np.asarray(eng.store.index._spill_cid),
                          np.asarray(idx2._spill_cid))
    assert np.array_equal(eng.store.index._codebook, idx2._codebook)
    eng2.close()
    del lv_before


def test_retrain_during_search_retries_cleanly(rng):
    """A retrain (slot repack) racing a search must not re-rank stale
    slots against the new packing — the search re-runs over the new
    layout."""
    n, d, k = 2048, 16, 5
    db = _clustered(rng, n, d, n_centers=8)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8, m=4, ksub=16,
                     refine=256)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()

    orig = idx._scan_call
    fired = {"n": 0}

    def racy(state, qb, r):
        out = orig(state, qb, r)
        if fired["n"] == 0:
            fired["n"] += 1
            idx.train()          # repack mid-flight
        return out

    idx._scan_call = racy
    queries = db[:4] + 0.001
    got = idx.search_batch(queries, k)
    assert fired["n"] == 1
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)
    assert _recall(got, want, k) >= 0.8
    # distances still exact over the (new-layout) stored rows
    for qi, row in enumerate(got):
        for rid, dist in row:
            ref = float(np.linalg.norm(queries[qi] - db[rid]))
            assert abs(dist - ref) < 1e-4
    idx._scan_call = orig


def test_rejects_bad_config():
    with pytest.raises(ValueError):
        IvfPqIndex(DistanceMetric.EUCLIDEAN, ksub=512)
    with pytest.raises(ValueError):
        IvfPqIndex(DistanceMetric.EUCLIDEAN, refine=0)
    with pytest.raises(ValueError):
        IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=1)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, m=5)
    idx.add_batch([(i, np.ones(16, np.float32) * i) for i in range(300)])
    with pytest.raises(IndexOpError):
        idx.train()      # m=5 does not divide d=16


def test_store_knob_validation(rng):
    store = VectorStore.with_index(
        IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8, m=4, ksub=16))
    db = _clustered(rng, 512, 16, n_centers=4)
    from vectordb_tpu.store import BatchInsertItem
    store.insert_batch([BatchInsertItem(id=f"v{i}", vector=Vector(db[i]))
                        for i in range(len(db))])
    store.index.train()
    q = Vector(db[0])
    assert len(store.search(q, 3, refine=64)) == 3
    with pytest.raises(IndexOpError):
        store.search(q, 3, nprobe=4)     # not a knob for this family
    with pytest.raises(IndexOpError):
        store.search(q, 3, ef=10)


def test_opq_rotation_learned_on_residuals(rng):
    """rotate=True (default) learns an orthogonal rotation from the
    RESIDUAL sample; rotate=False leaves the scan unrotated. Search
    quality with rotation never falls behind on spread-residual data
    (the case OPQ exists for: within-cluster deviations that live in a
    low-dim subspace smeared across all raw coordinates)."""
    n, d, k = 4096, 32, 10
    centers = (2.0 * rng.standard_normal((32, d))).astype(np.float32)
    w = rng.standard_normal((4, d)).astype(np.float32)   # spread signal
    z = rng.standard_normal((n, 4)).astype(np.float32)
    which = rng.integers(0, 32, n)
    db = (centers[which] + 0.25 * (z @ w)).astype(np.float32)
    queries = db[rng.choice(n, 32, replace=False)] + 0.002
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)

    recalls = {}
    for rotate in (True, False):
        idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=32, m=8,
                         ksub=32, refine=16, seed=1, rotate=rotate)
        idx.add_batch([(i, db[i]) for i in range(n)])
        idx.train()
        if rotate:
            assert idx._rot is not None
            # orthogonality: R^T R = I (permuted eigenvectors)
            rtr = idx._rot.T @ idx._rot
            np.testing.assert_allclose(rtr, np.eye(d), atol=1e-4)
        else:
            assert idx._rot is None
        recalls[rotate] = _recall(idx.search_batch(queries, k), want, k)
    assert recalls[True] >= recalls[False] - 0.05, recalls
    assert recalls[True] >= 0.6, recalls


def test_opq_rotation_persists_bit_identical(rng, tmp_path):
    """The rotation rides export_trained_state/import_trained_state:
    a recovered index re-encodes in the SAME rotated space and returns
    bit-identical results."""
    n, d, k = 2048, 16, 5
    db = _clustered(rng, n, d, n_centers=16)
    idx = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=16, m=4, ksub=32,
                     refine=32, seed=3, rotate=True)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    assert idx._rot is not None
    queries = db[:8] + 0.01
    before = idx.search_batch(queries, k)

    tables = idx.export_trained_state()
    assert "rotation" in tables
    rows_by_id = {i: db[i] for i in range(n)}
    idx2 = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=16, m=4, ksub=32,
                      refine=32, seed=3)
    idx2.import_trained_state(tables, rows_by_id, d)
    np.testing.assert_array_equal(idx2._rot, idx._rot)
    after = idx2.search_batch(queries, k)
    assert before == after
