"""IvfFlatIndex: device k-means build + cluster-pruned exact-refine search.

Runs on the CPU test backend. Recall is measured against the flat oracle
on clustered (structured) data — the honest workload for any ANN index —
and CRUD/store semantics must hold before and after training.
"""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, VectorStore
from vectordb_tpu.distance import pairwise_distances
from vectordb_tpu.index import IvfFlatIndex
from vectordb_tpu.metadata import Metadata, MetadataFilter
from vectordb_tpu.vector import Vector


def _clustered(rng, n, d, n_centers=32, scale=0.15):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    which = rng.integers(0, n_centers, n)
    return (centers[which]
            + scale * rng.standard_normal((n, d)).astype(np.float32))


def _flat_topk(queries, db, metric, k):
    dists = pairwise_distances(np, queries, db, metric)
    order = np.argsort(dists, axis=1, kind="stable")[:, :k]
    return order


def test_train_and_recall_euclidean(rng):
    n, d, q, k = 5000, 32, 40, 10
    db = _clustered(rng, n, d)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=64, nprobe=8,
                       seed=1)
    idx.add_batch([(i, db[i]) for i in range(n)])
    assert not idx.is_trained
    idx.train()
    assert idx.is_trained
    queries = db[rng.choice(n, q, replace=False)] + 0.01
    results = idx.search_batch(queries, k)
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)
    recall = np.mean([len({i for i, _ in got} & set(w.tolist())) / k
                      for got, w in zip(results, want)])
    assert recall >= 0.9, recall
    # distances of returned ids must be the exact euclidean values
    for qi, got in enumerate(results[:5]):
        for rid, dist in got:
            ref = float(np.linalg.norm(queries[qi] - db[rid]))
            assert abs(dist - ref) < 1e-3, (rid, dist, ref)
    # ascending order
    for got in results:
        dd = [dv for _, dv in got]
        assert dd == sorted(dd)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_exact_distances_per_metric(rng, metric):
    n, d, q, k = 2000, 16, 8, 5
    db = _clustered(rng, n, d, n_centers=16)
    if metric is DistanceMetric.COSINE:
        db = db + 3.0   # keep norms away from zero
    idx = IvfFlatIndex(metric, nlist=32, nprobe=32, seed=2)  # probe all
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    queries = _clustered(rng, q, d, n_centers=4)
    if metric is DistanceMetric.COSINE:
        queries = queries + 3.0
    results = idx.search_batch(queries, k)
    # probing every cluster => identical to the exact flat scan
    want = _flat_topk(queries, db, metric, k)
    dists = pairwise_distances(np, queries, db, metric)
    for qi, got in enumerate(results):
        assert [i for i, _ in got] == [int(w) for w in want[qi]]
        np.testing.assert_allclose([dv for _, dv in got],
                                   np.sort(dists[qi])[:k],
                                   rtol=1e-4, atol=1e-4)


def test_nprobe_knob_monotone_recall(rng):
    n, d, k = 4000, 24, 10
    db = _clustered(rng, n, d)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=64, nprobe=1,
                       seed=3)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    queries = db[:30] + 0.01
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)

    def recall(npb):
        idx.nprobe = npb
        res = idx.search_batch(queries, k)
        return np.mean([len({i for i, _ in got} & set(w.tolist())) / k
                        for got, w in zip(res, want)])

    r1, r8, r64 = recall(1), recall(8), recall(64)
    assert r1 <= r8 + 0.05 and r8 <= r64 + 1e-9
    assert r64 >= 0.999   # all clusters probed = exact


def test_crud_after_training(rng):
    n, d, k = 3000, 16, 5
    db = _clustered(rng, n, d)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, nprobe=8,
                       seed=4)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    # insert lands in its centroid's cluster and is findable
    new = db[123] + 0.001
    idx.add(99999, Vector(new))
    res = idx.search(Vector(new), k)
    assert res[0][0] == 99999
    # upsert moves it
    moved = db[2000] + 0.001
    idx.add(99999, Vector(moved))
    assert idx.search(Vector(moved), 1)[0][0] == 99999
    assert len(idx) == n + 1
    # delete
    idx.remove(99999)
    assert idx.search(Vector(moved), 1)[0][0] != 99999
    assert len(idx) == n
    # removing twice is a no-op (reference semantics)
    idx.remove(99999)
    assert len(idx) == n


def test_spill_exhaustion_triggers_retrain(rng):
    n, d = 640, 8
    db = _clustered(rng, n, d, n_centers=8)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8, nprobe=8,
                       spill_frac=0.005, seed=5)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    # flood one region so cluster + spill free lists run dry
    base = db[0]
    for j in range(500):
        idx.add(10_000 + j, Vector(base + 0.001 * j))
    assert len(idx) == n + 500
    assert idx.is_trained
    got = idx.search(Vector(base), 3)
    assert got and got[0][1] < 0.1


def test_auto_train_on_search(rng):
    n, d = 4500, 12
    db = _clustered(rng, n, d)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=16, nprobe=16,
                       auto_train_min=4096, seed=6)
    idx.add_batch([(i, db[i]) for i in range(n)])
    assert not idx.is_trained
    idx.search_batch(db[:4] + 0.01, 3)
    assert idx.is_trained


def test_untrained_small_index_is_exact_flat(rng):
    n, d, k = 300, 8, 5
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, seed=7)
    idx.add_batch([(i, db[i]) for i in range(n)])
    res = idx.search_batch(db[:6] + 0.001, k)
    want = _flat_topk(db[:6] + 0.001, db, DistanceMetric.EUCLIDEAN, k)
    for got, w in zip(res, want):
        assert [i for i, _ in got] == [int(x) for x in w]


def test_store_with_ivf_and_exact_filters(rng):
    n, d, k = 3000, 16, 5
    db = _clustered(rng, n, d)
    store = VectorStore.with_index(
        IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, nprobe=8, seed=8))
    for i in range(n):
        store.insert_with_metadata(f"v{i}", Vector(db[i]),
                                   Metadata({"grp": str(i % 4)}))
    store.index.train()
    res = store.search(Vector(db[7] + 0.001), k)
    assert res[0].id == "v7"
    # filters must stay EXACT (masked flat path) on this approximate index
    flt = MetadataFilter.eq("grp", "2")
    fres = store.search_with_filter(Vector(db[6] + 0.001), k, flt)
    assert fres and all(int(r.id[1:]) % 4 == 2 for r in fres)
    want_pool = [i for i in range(n) if i % 4 == 2]
    d2 = np.linalg.norm(db[want_pool] - (db[6] + 0.001), axis=1)
    want_ids = [want_pool[j] for j in np.argsort(d2, kind="stable")[:k]]
    assert [int(r.id[1:]) for r in fres] == want_ids


def test_filtered_search_does_not_auto_train(rng):
    """Review regression: a slot mask compiled against the current layout
    must not be invalidated by auto-training inside the same call."""
    n, d, k = 4500, 12, 5
    db = _clustered(rng, n, d)
    store = VectorStore.with_index(
        IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=16, nprobe=16,
                     auto_train_min=4096, seed=9))
    for i in range(n):
        store.insert_with_metadata(f"v{i}", Vector(db[i]),
                                   Metadata({"grp": str(i % 3)}))
    assert not store.index.is_trained
    # FIRST operation is a filtered search: must be exact, not auto-train
    flt = MetadataFilter.eq("grp", "1")
    fres = store.search_with_filter(Vector(db[4] + 0.001), k, flt)
    assert not store.index.is_trained
    want_pool = [i for i in range(n) if i % 3 == 1]
    d2 = np.linalg.norm(db[want_pool] - (db[4] + 0.001), axis=1)
    want_ids = [want_pool[j] for j in np.argsort(d2, kind="stable")[:k]]
    assert [int(r.id[1:]) for r in fres] == want_ids
    # after explicit training, filters must STILL be exact (mask compiled
    # against the post-repack layout via the version handshake)
    store.index.train()
    fres2 = store.search_with_filter(Vector(db[4] + 0.001), k, flt)
    assert [int(r.id[1:]) for r in fres2] == want_ids


def test_k_larger_than_candidate_pool_falls_back_exact(rng):
    """Review regression: k beyond nprobe*t_c*SUB must not crash top_k —
    it takes the exact flat scan instead."""
    n, d = 2000, 16
    db = _clustered(rng, n, d, n_centers=16)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, nprobe=1,
                       seed=10)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    pool = 1 * idx._t_c * 16
    k = pool + 50
    res = idx.search_batch(db[:3] + 0.001, k)
    want = _flat_topk(db[:3] + 0.001, db, DistanceMetric.EUCLIDEAN, k)
    for got, w in zip(res, want):
        assert [i for i, _ in got] == [int(x) for x in w]
    # nprobe=0 clamps to 1 rather than crashing
    assert idx.search_with_nprobe(Vector(db[0]), 3, 0)


def test_cosine_zero_vector_raises_after_training(rng):
    from vectordb_tpu.errors import InvalidVectorError

    n, d = 2000, 8
    db = _clustered(rng, n, d) + 3.0
    idx = IvfFlatIndex(DistanceMetric.COSINE, nlist=16, nprobe=4, seed=11)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    with pytest.raises(InvalidVectorError):
        idx.search_batch(np.zeros((1, d), np.float32), 3)


def test_bulk_load_applies_prefix_on_dimension_error(rng):
    """Review regression: the vectorized first-load keeps the reference's
    apply-prefix-then-raise add_batch semantics."""
    from vectordb_tpu.errors import DimensionMismatchError
    from vectordb_tpu.index import FlatIndex

    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    good = rng.standard_normal((5, 8)).astype(np.float32)
    bad = rng.standard_normal(4).astype(np.float32)
    with pytest.raises(DimensionMismatchError):
        idx.add_batch([(0, good[0]), (1, good[1]), (2, bad), (3, good[3])])
    assert len(idx) == 2
    assert idx.get_vector(1) is not None and idx.get_vector(2) is None


def test_engine_ivf_mode_roundtrip(rng, tmp_path):
    """Persistent mode with --index ivf: vectors+metadata survive reopen;
    the cluster layout retrains on demand after recovery."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    cfg = EngineConfig(checkpoint_interval=100,
                       metric=DistanceMetric.EUCLIDEAN, index_type="ivf")
    db = _clustered(rng, 300, 8)
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(300):
            eng.insert(f"v{i}", Vector(db[i]))
        assert eng.search(Vector(db[5] + 0.001), 3)[0].id == "v5"
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == 300
        res = eng.search(Vector(db[5] + 0.001), 3)
        assert res[0].id == "v5"
        eng.store.index.train()
        assert eng.search(Vector(db[7] + 0.001), 1)[0].id == "v7"


def test_cli_index_ivf(tmp_path):
    from vectordb_tpu.cli import main
    d = tmp_path / "data"
    assert main(["--index", "ivf", "--data-dir", str(d), "insert", "a",
                 "--vector", "1,2,3"]) == 0
    assert main(["--index", "ivf", "--data-dir", str(d), "search", "1,2,3",
                 "-k", "1"]) == 0


def test_concurrent_search_during_train(rng):
    """Searches racing a train() must stay consistent: each search sees
    either the pre-repack or post-repack snapshot, never a mix."""
    import threading

    n, d, k = 4000, 16, 5
    db = _clustered(rng, n, d)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, nprobe=32,
                       seed=12)
    idx.add_batch([(i, db[i]) for i in range(n)])
    queries = db[:8] + 0.001
    want = [int(w) for w in _flat_topk(queries, db,
                                       DistanceMetric.EUCLIDEAN, 1)[:, 0]]
    errors = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                res = idx.search_batch(queries, k)
                got = [row[0][0] for row in res]
                if got != want:
                    errors.append(("mismatch", got))
            except Exception as e:   # pragma: no cover
                errors.append(("raised", repr(e)))

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    idx.train()
    idx.train()   # retrain while searches continue
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors[:3]


def test_huge_nprobe_falls_back_to_exact_scan(rng):
    """Review-of-experiment regression: probing most of the database must
    take the flat scan (the per-query gather would exceed memory), not
    attempt a 10^5-candidate gather."""
    n, d, k = 3000, 16, 5
    db = _clustered(rng, n, d)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, seed=13)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    import vectordb_tpu.index.ivf as ivf_mod
    old = ivf_mod._MAX_CANDIDATES
    try:
        ivf_mod._MAX_CANDIDATES = 256   # force the cap with a small db
        res = idx.search_batch(db[:3] + 0.001, k, nprobe=32)
        want = _flat_topk(db[:3] + 0.001, db, DistanceMetric.EUCLIDEAN, k)
        for got, w in zip(res, want):
            assert [i for i, _ in got] == [int(x) for x in w]
    finally:
        ivf_mod._MAX_CANDIDATES = old


def test_engine_ivf_trained_state_persists(rng, tmp_path, monkeypatch):
    """Train -> checkpoint -> reopen must restore the EXACT trained layout:
    no retrain call, identical centroids/slot assignment, identical search
    results (reference parity: engine.rs:44-73 recovers to identical
    state)."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    cfg = EngineConfig(checkpoint_interval=10 ** 9,
                       metric=DistanceMetric.EUCLIDEAN, index_type="ivf")
    n, d, k = 400, 8, 5
    db = _clustered(rng, n, d, n_centers=8)
    queries = db[rng.choice(n, 10, replace=False)] + 0.01
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(n):
            eng.insert(f"v{i}", Vector(db[i]))
        eng.store.index.train()
        before = [[(r.id, r.distance) for r in eng.search(
            Vector(queries[qi]), k)] for qi in range(10)]
        cent_before = eng.store.index._centroids.copy()
        slots_before = eng.store.index._id_of_slot.copy()
        eng.checkpoint()

    from vectordb_tpu.index.ivf import IvfFlatIndex
    def boom(self):
        raise AssertionError("reopen must not retrain")
    monkeypatch.setattr(IvfFlatIndex, "train", boom)
    with StorageEngine.open(tmp_path, cfg) as eng:
        idx = eng.store.index
        assert idx.is_trained
        np.testing.assert_array_equal(idx._centroids, cent_before)
        np.testing.assert_array_equal(idx._id_of_slot, slots_before)
        after = [[(r.id, r.distance) for r in eng.search(
            Vector(queries[qi]), k)] for qi in range(10)]
        # identical ids in identical order, identical distances (import
        # recomputes sq-norms with the same per-row np.dot as insert)
        assert [[i for i, _ in row] for row in after] == \
            [[i for i, _ in row] for row in before]
        np.testing.assert_allclose(
            [d for row in after for _, d in row],
            [d for row in before for _, d in row], rtol=1e-6, atol=1e-7)
        # post-recovery writes still route through the trained layout
        eng.insert("new", Vector(db[0] * 0.5))
        assert eng.search(Vector(db[0] * 0.5), 1)[0].id == "new"
        eng.delete("new")


def test_engine_ivf_stale_state_falls_back(rng, tmp_path):
    """An ivf_state file that doesn't match the snapshot digest must be
    ignored (recovery falls back to the plain snapshot path)."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    cfg = EngineConfig(checkpoint_interval=10 ** 9,
                       metric=DistanceMetric.EUCLIDEAN, index_type="ivf")
    n, d = 200, 8
    db = _clustered(rng, n, d, n_centers=4)
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(n):
            eng.insert(f"v{i}", Vector(db[i]))
        eng.store.index.train()
        eng.checkpoint()
        # mutate AFTER the checkpoint, then checkpoint again WITHOUT the
        # ivf file staying in sync (simulate by corrupting the digest)
    state_path = tmp_path / StorageEngine.IVF_FILE
    raw = bytearray(state_path.read_bytes())
    raw[-1] ^= 0xFF
    state_path.write_bytes(bytes(raw))
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == n          # vectors recovered from the snapshot
        assert eng.search(Vector(db[3] + 0.001), 1)[0].id == "v3"


def test_ivf_bf16_storage_composes(rng):
    """IVF x bf16 storage (the 8M-on-one-chip lane): train + probed
    search return exact-over-stored results at full recall when probing
    every cluster."""
    from vectordb_tpu.index import IvfFlatIndex
    from vectordb_tpu.index.flat import FlatIndex
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=4, nprobe=4,
                       seed=0, auto_train_min=10 ** 9, storage="bf16")
    data = rng.standard_normal((300, 16)).astype(np.float32)
    idx.add_batch(list(enumerate(data)))
    idx.train()
    queries = data[:8] + np.float32(0.01)
    got = idx.search_batch(queries, 5)
    want = FlatIndex.search_batch(idx, queries, 5)  # exact, same storage
    for g, w in zip(got, want):
        assert [i for i, _ in g] == [i for i, _ in w]
        # both are exact over the stored bf16 values; the probed refine
        # and the flat bf16 scan round the score assembly differently
        np.testing.assert_allclose([d for _, d in g], [d for _, d in w],
                                   rtol=1e-3, atol=1e-4)


def test_ivf_int8_storage_composes(rng):
    """IVF x int8 storage (the 16M-on-one-chip ANN lane): training
    assignment and the probed refine dot raw codes and apply the pow2
    row scale to the dots — exact over the stored values, full recall
    when probing every cluster."""
    from vectordb_tpu.index import IvfFlatIndex
    from vectordb_tpu.index.flat import FlatIndex
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=4, nprobe=4,
                       seed=0, auto_train_min=10 ** 9, storage="int8")
    data = rng.standard_normal((300, 16)).astype(np.float32) * \
        np.exp(rng.uniform(-4, 4, (300, 1))).astype(np.float32)
    idx.add_batch(list(enumerate(data)))
    idx.train()
    dev = idx._sync_device()
    assert dev["db"].dtype == np.int8 and "scales" in dev
    queries = data[:8] + np.float32(0.01)
    got = idx.search_batch(queries, 5)
    want = FlatIndex.search_batch(idx, queries, 5)  # exact, same storage
    for g, w in zip(got, want):
        assert [i for i, _ in g] == [i for i, _ in w]
        # the wide pow2 scale spread (exp +-4) makes small distances of
        # large-norm rows cancellation-limited (~|x|^2 * 2^-24): compare
        # with a tolerance matched to that, not to the bf16 test's
        np.testing.assert_allclose([d for _, d in g], [d for _, d in w],
                                   rtol=2e-3, atol=5e-3)
    # post-train mutation routes through cluster placement on codes
    new = rng.standard_normal(16).astype(np.float32)
    idx.add(7777, new)
    got2 = idx.search_batch(
        np.asarray([_quantize_int8_row(new)]), 1)
    assert got2[0][0][0] == 7777


def _quantize_int8_row(row):
    from vectordb_tpu.index.flat import _quantize_int8
    return _quantize_int8(row)


def test_ivf_int8_hier_assignment(rng):
    """Two-level assignment with int8 codes: scales must flow through the
    super routing and the per-super scoring (a code-space assignment
    would mis-route rows with large scale spread)."""
    from vectordb_tpu.index import IvfFlatIndex
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, nprobe=32,
                       seed=1, auto_train_min=10 ** 9, storage="int8",
                       assign_mode="hier")
    data = rng.standard_normal((600, 12)).astype(np.float32) * \
        np.exp(rng.uniform(-5, 5, (600, 1))).astype(np.float32)
    idx.add_batch(list(enumerate(data)))
    idx.train()
    queries = data[:6] + np.float32(0.001)
    got = idx.search_batch(queries, 3)
    from vectordb_tpu.index.flat import FlatIndex
    want = FlatIndex.search_batch(idx, queries, 3)
    for g, w in zip(got, want):
        assert [i for i, _ in g] == [i for i, _ in w]


def test_ivf_int8_masked_search_exact(rng):
    """Exact filtered search on the int8 IVF index: the slot mask ANDs
    into validity on the probed path; distances stay exact over stored
    values and only eligible rows return."""
    from vectordb_tpu.index import IvfFlatIndex
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8, nprobe=8,
                       seed=2, auto_train_min=10 ** 9, storage="int8")
    data = rng.standard_normal((400, 16)).astype(np.float32)
    idx.add_batch(list(enumerate(data)))
    idx.train()
    # eligible = even internal ids, expressed as a slot mask
    mask = np.zeros(idx.capacity, bool)
    for iid in range(0, 400, 2):
        mask[idx.slot_of(iid)] = True
    queries = data[:5] + np.float32(0.01)
    got = idx.search_batch(queries, 6, slot_mask=mask,
                           mask_layout_version=idx.slot_layout_version)
    stored = np.stack([np.asarray(
        __import__("vectordb_tpu").vector.as_f32_array(idx.get_vector(i)))
        for i in range(400)])
    d = np.sqrt(np.maximum(
        np.sum(stored * stored, axis=1)[None, :]
        - 2.0 * queries @ stored.T
        + np.sum(queries * queries, axis=1)[:, None], 0))
    d[:, 1::2] = np.inf   # odd ids ineligible
    want = np.argsort(d, axis=1, kind="stable")[:, :6]
    for qi in range(5):
        ids = [i for i, _ in got[qi]]
        assert all(i % 2 == 0 for i in ids)
        assert ids == list(want[qi]), (qi, ids, want[qi])


class TestCalibrateNprobe:
    def test_meets_target_and_sets_default(self, rng):
        n, d = 4000, 32
        db = _clustered(rng, n, d)
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, nprobe=1,
                           seed=4)
        idx.add_batch([(i, db[i]) for i in range(n)])
        idx.train()
        out = idx.calibrate_nprobe(0.95, k=10, sample=64)
        assert out["recall"] >= 0.95
        assert idx.nprobe == out["nprobe"]          # default installed
        assert out["nprobe"] in out["curve"]
        # the curve is (weakly) monotone in nprobe on this easy layout
        tried = sorted(out["curve"])
        vals = [out["curve"][t] for t in tried]
        assert all(b >= a - 0.05 for a, b in zip(vals, vals[1:]))

    def test_external_queries_and_no_default(self, rng):
        n, d = 4000, 16
        db = _clustered(rng, n, d)
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=16, seed=4)
        idx.add_batch([(i, db[i]) for i in range(n)])
        idx.train()
        before = idx.nprobe
        qs = db[rng.choice(n, 32, replace=False)] + 0.02
        out = idx.calibrate_nprobe(0.9, queries=qs, set_default=False)
        assert idx.nprobe == before
        assert 0.0 <= out["recall"] <= 1.0

    def test_untrained_too_small_raises(self):
        from vectordb_tpu.errors import IndexOpError
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8)
        idx.add_batch([(i, np.ones(4, np.float32) * i) for i in range(8)])
        with pytest.raises(IndexOpError):
            idx.calibrate_nprobe(0.9)

    def test_untrained_enough_rows_trains(self, rng):
        n, d = 600, 8
        db = _clustered(rng, n, d, n_centers=8)
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8, seed=1)
        idx.add_batch([(i, db[i]) for i in range(n)])
        assert not idx.is_trained
        out = idx.calibrate_nprobe(0.5, k=5, sample=32)
        assert idx.is_trained
        assert out["nprobe"] >= 1

    def test_bad_target_raises(self, rng):
        from vectordb_tpu.errors import IndexOpError
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8)
        with pytest.raises(IndexOpError):
            idx.calibrate_nprobe(1.5)


class TestBalancedKmeans:
    """Size-penalized Lloyd (ops/ivf.kmeans_fit balance_weight)."""

    def test_penalty_changes_centroids(self, rng):
        # the statistical claim (less greedy spill, more rows in their true
        # nearest cluster, multi-seed) lives in benchmarks/
        # exp_balanced_kmeans.py — here we assert the penalty is actually
        # wired through the jit (weight>0 must produce a different fit)
        import jax
        from vectordb_tpu.ops.ivf import kmeans_fit

        data = _clustered(rng, 4096, 32, n_centers=16, scale=0.2)
        key = jax.random.PRNGKey(0)
        a = np.asarray(jax.device_get(
            kmeans_fit(data, key, 64, 10, balance_weight=0.0)))
        b = np.asarray(jax.device_get(
            kmeans_fit(data, key, 64, 10, balance_weight=0.1)))
        assert not np.array_equal(a, b)

    def test_weight_zero_matches_legacy(self, rng):
        import jax
        from vectordb_tpu.ops.ivf import kmeans_fit

        data = _clustered(rng, 1024, 16, n_centers=8)
        key = jax.random.PRNGKey(3)
        a = np.asarray(jax.device_get(kmeans_fit(data, key, 16, 5)))
        b = np.asarray(jax.device_get(
            kmeans_fit(data, key, 16, 5, balance_weight=0.0)))
        np.testing.assert_array_equal(a, b)

    def test_index_recall_holds_with_balance(self, rng):
        n, d, k = 6000, 24, 10
        db = _clustered(rng, n, d, n_centers=12)
        queries = db[rng.choice(n, 64, replace=False)] \
            + 0.01 * rng.standard_normal((64, d)).astype(np.float32)
        want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=32, nprobe=8,
                           seed=0, kmeans_balance=0.1)
        idx.add_batch([(i, db[i]) for i in range(n)])
        idx.train()
        got = idx.search_batch(queries, k)
        recall = np.mean([len(set(i for i, _ in g) & set(w.tolist())) / k
                          for g, w in zip(got, want)])
        assert recall >= 0.9

    def test_negative_weight_rejected(self):
        with pytest.raises(ValueError):
            IvfFlatIndex(DistanceMetric.EUCLIDEAN, kmeans_balance=-0.1)
