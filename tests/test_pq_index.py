"""PqFlatIndex: PQ codes on device + exact host re-rank.

Runs on the CPU test backend. Recall is measured against the flat oracle
on clustered (structured) data; returned distances must be exact f32
values over the true stored rows, and CRUD/store semantics must hold
before and after training.
"""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, VectorStore
from vectordb_tpu.distance import pairwise_distances
from vectordb_tpu.errors import IndexOpError
from vectordb_tpu.index import PqFlatIndex
from vectordb_tpu.metadata import Metadata, MetadataFilter
from vectordb_tpu.vector import Vector


def _clustered(rng, n, d, n_centers=32, scale=0.15):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    which = rng.integers(0, n_centers, n)
    return (centers[which]
            + scale * rng.standard_normal((n, d)).astype(np.float32))


def _flat_topk(queries, db, metric, k):
    dists = pairwise_distances(np, queries, db, metric)
    return np.argsort(dists, axis=1, kind="stable")[:, :k]


def test_train_and_recall_euclidean(rng):
    n, d, q, k = 4096, 32, 40, 10
    db = _clustered(rng, n, d)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=8, ksub=64, refine=128,
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
    # distances of returned ids are the EXACT euclidean values (re-rank
    # runs on the true stored rows, not the decoded approximations)
    for qi, got in enumerate(results[:5]):
        for rid, dist in got:
            ref = float(np.linalg.norm(queries[qi] - db[rid]))
            assert abs(dist - ref) < 1e-3, (rid, dist, ref)
    for got in results:
        dd = [dv for _, dv in got]
        assert dd == sorted(dd)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_exact_distances_per_metric(rng, metric):
    n, d, q, k = 2000, 16, 8, 5
    db = _clustered(rng, n, d, n_centers=16)
    if metric is DistanceMetric.COSINE:
        db = db[np.linalg.norm(db, axis=1) > 1e-3]
        n = len(db)
    idx = PqFlatIndex(metric, m=4, ksub=32, refine=64)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    queries = db[:q] * 1.01
    results = idx.search_batch(queries, k)
    exact = pairwise_distances(np, queries, db, metric)
    for qi, got in enumerate(results):
        assert len(got) == k
        for rid, dist in got:
            assert abs(dist - float(exact[qi, rid])) < 2e-3


def test_refine_knob_monotone_recall(rng):
    n, d, q, k = 4096, 32, 64, 10
    db = _clustered(rng, n, d, n_centers=8, scale=0.6)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=16, ksub=16, seed=3)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    queries = rng.standard_normal((q, d)).astype(np.float32)
    want = _flat_topk(queries, db, DistanceMetric.EUCLIDEAN, k)

    def recall_at(r):
        res = idx.search_batch(queries, k, refine=r)
        return np.mean([len({i for i, _ in got} & set(w.tolist())) / k
                        for got, w in zip(res, want)])

    r_small, r_big = recall_at(16), recall_at(256)
    assert r_big >= r_small
    assert r_big >= 0.9, (r_small, r_big)


def test_crud_after_training(rng):
    n, d = 512, 16
    db = _clustered(rng, n, d, n_centers=8)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=32)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    # post-train insert is searchable
    v_new = (db[3] + 0.001).astype(np.float32)
    idx.add(n, v_new)
    got = idx.search_batch(v_new.reshape(1, -1), 1)[0]
    assert got[0][0] == n
    # upsert moves the id and is searchable at its new value
    v_up = (db[7] + 5.0).astype(np.float32)
    idx.add(7, v_up)
    got = idx.search_batch(v_up.reshape(1, -1), 1)[0]
    assert got[0][0] == 7
    # remove disappears from results
    idx.remove(n)
    got = idx.search_batch(v_new.reshape(1, -1), 3)[0]
    assert all(rid != n for rid, _ in got)
    # get_vector returns stored values
    assert np.allclose(idx.get_vector(7).as_array(), v_up)
    assert idx.get_vector(n) is None
    assert len(idx) == n


def test_post_train_bulk_append_is_searchable(rng):
    n, d = 300, 16
    db = _clustered(rng, n, d, n_centers=8)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=32)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    # well-separated gaussians: each extra row lands in its own PQ cell
    # (tight clusters would share codes and tie-break arbitrarily)
    extra = (5.0 * rng.standard_normal((200, d))).astype(np.float32)
    idx.add_batch([(n + i, extra[i]) for i in range(200)])
    got = idx.search_batch(extra[:4], 1)
    for j, row in enumerate(got):
        assert row[0][0] == n + j
    assert len(idx) == n + 200


def test_auto_train_on_search(rng):
    n, d = 600, 16
    db = _clustered(rng, n, d, n_centers=8)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                      auto_train_min=512)
    idx.add_batch([(i, db[i]) for i in range(n)])
    assert not idx.is_trained
    idx.search_batch(db[:2], 3)
    assert idx.is_trained


def test_untrained_small_index_is_exact_flat(rng):
    n, d, k = 64, 8, 5
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=2, ksub=8)
    idx.add_batch([(i, db[i]) for i in range(n)])
    res = idx.search_batch(db[:3], k)
    want = _flat_topk(db[:3], db, DistanceMetric.EUCLIDEAN, k)
    for got, w in zip(res, want):
        assert [i for i, _ in got] == w.tolist()


def test_store_with_pq_and_exact_filters(rng):
    n, d, k = 1200, 16, 6
    db = _clustered(rng, n, d, n_centers=6)
    store = VectorStore(PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4,
                                    ksub=16, refine=64,
                                    auto_train_min=600))
    for i in range(n):
        store.insert_with_metadata(
            f"v{i}", Vector(db[i]),
            Metadata({"par": "even" if i % 2 == 0 else "odd"}))
    store.search(Vector(db[0]), 1)  # trigger auto-train
    assert store.index.is_trained
    flt = MetadataFilter.eq("par", "even")
    res = store.search_with_filter(Vector(db[10]), k, flt)
    assert len(res) == k
    assert all(int(h.id[1:]) % 2 == 0 for h in res)
    # distances exact vs stored rows
    for h in res:
        ref = float(np.linalg.norm(db[10] - db[int(h.id[1:])]))
        assert abs(h.distance - ref) < 1e-3


def test_bad_m_raises_at_train(rng):
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=5, ksub=16)
    db = rng.standard_normal((64, 16)).astype(np.float32)
    idx.add_batch([(i, db[i]) for i in range(64)])
    with pytest.raises(IndexOpError):
        idx.train()


def test_train_needs_ksub_rows(rng):
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=2, ksub=64)
    db = rng.standard_normal((32, 8)).astype(np.float32)
    idx.add_batch([(i, db[i]) for i in range(32)])
    with pytest.raises(IndexOpError):
        idx.train()


def test_k_bigger_than_refine_still_served(rng):
    n, d = 2048, 16
    db = _clustered(rng, n, d, n_centers=8)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=8)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    got = idx.search_batch(db[:2], 50)
    for row in got:
        assert len(row) == 50
        dd = [dv for _, dv in row]
        assert dd == sorted(dd)


def test_cosine_zero_vector_raises_after_training(rng):
    from vectordb_tpu.errors import InvalidVectorError
    n, d = 512, 16
    db = _clustered(rng, n, d, n_centers=4)
    db /= np.maximum(np.linalg.norm(db, axis=1, keepdims=True), 1e-6)
    idx = PqFlatIndex(DistanceMetric.COSINE, m=4, ksub=16)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    with pytest.raises(InvalidVectorError):
        idx.search_batch(np.zeros((1, d), np.float32), 3)


def test_export_import_trained_state_bit_identical(rng):
    n, d, q, k = 1024, 16, 16, 10
    db = _clustered(rng, n, d, n_centers=8)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=32, refine=64,
                      seed=5)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    queries = rng.standard_normal((q, d)).astype(np.float32)
    want = idx.search_batch(queries, k)
    tables = idx.export_trained_state()
    assert tables is not None

    idx2 = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=32, refine=64)
    idx2.add_batch([(i, db[i]) for i in range(n)])
    idx2.import_trained_state(tables)

    def boom():
        raise AssertionError("import must not retrain")
    idx2.train = boom
    got = idx2.search_batch(queries, k)
    assert got == want  # bit-identical: same codebook -> same candidates
    assert idx2.is_trained


def test_export_untrained_is_none():
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN)
    assert idx.export_trained_state() is None


def test_removed_rows_never_returned_even_unencoded(rng):
    # delete + re-add churn around sync boundaries
    n, d = 600, 8
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=2, ksub=16, refine=32)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    idx.search_batch(db[:1], 1)          # sync devices
    for i in range(0, 100):
        idx.remove(i)
    got = idx.search_batch(db[:4], 5)
    for row in got:
        assert all(rid >= 100 for rid, _ in row)


def test_engine_pq_mode_roundtrip(rng, tmp_path):
    """Persistent mode with --index pq: vectors+metadata survive reopen."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    cfg = EngineConfig(checkpoint_interval=100,
                       metric=DistanceMetric.EUCLIDEAN, index_type="pq")
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


def test_engine_pq_rejects_storage_modes(tmp_path):
    from vectordb_tpu.persistence import EngineConfig, StorageEngine
    cfg = EngineConfig(metric=DistanceMetric.EUCLIDEAN, index_type="pq",
                       storage="bf16")
    with pytest.raises(ValueError):
        StorageEngine.open(tmp_path, cfg)


def test_engine_pq_trained_state_persists(rng, tmp_path, monkeypatch):
    """Train -> checkpoint -> reopen must restore the trained codebook:
    no retrain call, bit-identical search results (codes re-encode
    deterministically from the recovered rows)."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    cfg = EngineConfig(checkpoint_interval=10 ** 9,
                       metric=DistanceMetric.EUCLIDEAN, index_type="pq")
    n, d, k = 400, 8, 5
    db = _clustered(rng, n, d, n_centers=8)
    queries = db[rng.choice(n, 10, replace=False)] + 0.01
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(n):
            eng.insert(f"v{i}", Vector(db[i]))
        eng.store.index.train()
        before = [[(r.id, r.distance) for r in eng.search(
            Vector(queries[qi]), k)] for qi in range(10)]
        cb_before = eng.store.index._codebook.copy()
        eng.checkpoint()

    from vectordb_tpu.index.pq import PqFlatIndex as _Pq

    def boom(self):
        raise AssertionError("reopen must not retrain")
    monkeypatch.setattr(_Pq, "train", boom)
    with StorageEngine.open(tmp_path, cfg) as eng:
        idx = eng.store.index
        assert idx.is_trained
        np.testing.assert_array_equal(idx._codebook, cb_before)
        after = [[(r.id, r.distance) for r in eng.search(
            Vector(queries[qi]), k)] for qi in range(10)]
        assert after == before
        # post-recovery writes still searchable through the PQ path
        eng.insert("new", Vector(db[0] * 0.5))
        assert eng.search(Vector(db[0] * 0.5), 1)[0].id == "new"
        eng.delete("new")


def test_engine_pq_wrong_metric_state_ignored(rng, tmp_path):
    """A pq_state file written under another metric must be ignored."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    n, d = 300, 8
    db = _clustered(rng, n, d, n_centers=4)
    db /= np.maximum(np.linalg.norm(db, axis=1, keepdims=True), 1e-6)
    cfg = EngineConfig(checkpoint_interval=10 ** 9,
                       metric=DistanceMetric.EUCLIDEAN, index_type="pq")
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(n):
            eng.insert(f"v{i}", Vector(db[i]))
        eng.store.index.train()
        eng.checkpoint()
    cfg2 = EngineConfig(checkpoint_interval=10 ** 9,
                        metric=DistanceMetric.COSINE, index_type="pq")
    with StorageEngine.open(tmp_path, cfg2) as eng:
        assert not eng.store.index.is_trained  # stale state ignored
        assert eng.search(Vector(db[5]), 1)[0].id == "v5"


def test_cli_index_pq(tmp_path):
    from vectordb_tpu.cli import main
    d = tmp_path / "data"
    assert main(["--index", "pq", "--data-dir", str(d), "insert", "a",
                 "--vector", "1,2,3"]) == 0
    assert main(["--index", "pq", "--data-dir", str(d), "search", "1,2,3",
                 "-k", "1"]) == 0
    assert main(["--index", "pq", "--storage", "bf16", "--data-dir",
                 str(d), "search", "1,2,3", "-k", "1"]) == 1


def test_store_refine_knob_and_mismatches(rng):
    from vectordb_tpu.errors import IndexOpError as IOE
    from vectordb_tpu.index import FlatIndex

    n, d = 1024, 16
    db = _clustered(rng, n, d, n_centers=8)
    store = VectorStore(PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4,
                                    ksub=16, refine=16))
    store.insert_batch([
        __import__("vectordb_tpu").store.BatchInsertItem(
            id=f"v{i}", vector=Vector(db[i])) for i in range(n)])
    store.index.train()
    res = store.search(Vector(db[3]), 5, refine=256)
    assert res[0].id == "v3"
    res_b = store.search_batch([(Vector(db[3]), 5)], refine=256)
    assert res_b[0][0].id == "v3"
    with pytest.raises(IOE):
        store.search(Vector(db[3]), 5, refine=0)
    with pytest.raises(IOE):
        store.search(Vector(db[3]), 5, ef=10, refine=16)
    with pytest.raises(IOE):
        store.search(Vector(db[3]), 5, nprobe=2)  # PQ has no nprobe
    flat_store = VectorStore(FlatIndex(DistanceMetric.EUCLIDEAN))
    flat_store.insert("a", Vector(db[0]))
    with pytest.raises(IOE):
        flat_store.search(Vector(db[0]), 1, refine=8)


def test_http_refine_knob(rng):
    from vectordb_tpu.server.app import AppState
    from vectordb_tpu.server.routes import Api

    n, d = 1024, 16
    db = _clustered(rng, n, d, n_centers=8)
    store = VectorStore(PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4,
                                    ksub=16, refine=16))
    for i in range(64):
        store.insert(f"v{i}", Vector(db[i]))
    api = Api(AppState(store))
    store.index.auto_train_min = 32
    store.index.train()
    status, body = api.handle("POST", "/search", {
        "vector": db[3].tolist(), "k": 3, "refine": 64})
    assert status == 200 and body[0]["id"] == "v3"
    status, body = api.handle("POST", "/search/batch", {
        "queries": [{"vector": db[4].tolist(), "k": 2}], "refine": 64})
    assert status == 200 and body[0][0]["id"] == "v4"
    # mismatches are 400s
    status, _ = api.handle("POST", "/search", {
        "vector": db[3].tolist(), "k": 3, "refine": 64, "ef": 10})
    assert status == 400
    status, _ = api.handle("POST", "/search", {
        "vector": db[3].tolist(), "radius": 1.0, "refine": 64})
    assert status == 400
    # refine COMPOSES with filter (round-3): 200, filter honored exactly
    # (no row carries metadata "x" -> empty result set)
    status, body = api.handle("POST", "/search", {
        "vector": db[3].tolist(), "k": 3, "refine": 64,
        "filter": {"op": "exists", "field": "x"}})
    assert status == 200 and body == []


def test_host_backing_memmap_rows(rng, tmp_path):
    """FlatIndex host_backing: rows live in a disk memmap; CRUD, growth
    (new file replaces old), training, and PQ search all behave
    identically to RAM-backed rows."""
    import os

    n, d = 1500, 16
    db = _clustered(rng, n, d, n_centers=8)
    back = str(tmp_path / "rows")
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=64,
                      host_backing=back)
    idx.add_batch([(i, db[i]) for i in range(1024)])
    files = os.listdir(back)
    assert files and all(f.endswith(".f32") for f in files)
    idx.add_batch([(1024 + i, db[1024 + i]) for i in range(n - 1024)])
    # growth swapped the file and removed the old one
    assert len(os.listdir(back)) == 1
    assert isinstance(idx._vectors, np.memmap)
    idx.train()
    got = idx.search_batch(db[:4] + 0.001, 3)
    for j, row in enumerate(got):
        assert row[0][0] == j
    # results identical to a RAM-backed twin
    twin = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=64)
    twin.add_batch([(i, db[i]) for i in range(1024)])
    twin.add_batch([(1024 + i, db[1024 + i]) for i in range(n - 1024)])
    twin.train()
    assert twin.search_batch(db[:4] + 0.001, 3) == got
    idx.remove(2)
    got = idx.search_batch(db[2:3] + 0.001, 1)[0]
    assert got[0][0] != 2
    assert np.allclose(idx.get_vector(5).as_array(), db[5])


def test_bulk_load_stream(rng, tmp_path):
    n, d = 1536, 16
    db = _clustered(rng, n, d, n_centers=8)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=64,
                      host_backing=str(tmp_path / "rows"))
    idx.bulk_load_stream(n, d, (db[a:a + 500] for a in range(0, n, 500)))
    assert len(idx) == n
    idx.train()
    got = idx.search_batch(db[:4] + 0.001, 2)
    for j, row in enumerate(got):
        assert row[0][0] == j
    twin = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=64)
    twin.bulk_load_matrix(np.arange(n, dtype=np.int64), db)
    twin.train()
    assert twin.search_batch(db[:4] + 0.001, 2) == got
    # declared-count mismatches are errors
    with pytest.raises(ValueError):
        PqFlatIndex(DistanceMetric.EUCLIDEAN).bulk_load_stream(
            10, d, iter([db[:4]]))
    with pytest.raises(ValueError):
        idx.bulk_load_stream(4, d, iter([db[:4]]))  # non-empty index


def test_bulk_attach_memmap(rng, tmp_path):
    """The beyond-RAM reopen path: a second index adopts the first's row
    file in place (no re-stream) and behaves identically — with and
    without the sq_norms cache, and through PQ train + search."""
    n, d = 1536, 16
    db = _clustered(rng, n, d, n_centers=8)
    back = str(tmp_path / "rows")
    src = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=64,
                      host_backing=back)
    src.bulk_load_stream(n, d, iter([db]))
    src.train()
    want = src.search_batch(db[:8] + 0.001, 3)
    path = src._vectors_path
    cap = src.capacity
    sq_cache = src._sq_norms[:n].copy()

    for sq in (None, sq_cache):
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                          refine=64, host_backing=back)
        idx.bulk_attach_memmap(path, n, d, sq_norms=sq)
        assert len(idx) == n and idx.capacity == cap
        assert np.allclose(idx._sq_norms[:n], sq_cache)
        idx.import_trained_state(src.export_trained_state())
        assert idx.search_batch(db[:8] + 0.001, 3) == want
        # mutation after attach hits the memmap + PQ dirty machinery
        idx.remove(2)
        got = idx.search_batch(db[2:3] + 0.001, 1)[0]
        assert got and got[0][0] != 2
        idx.add(n + 1, db[2])
        got = idx.search_batch(db[2:3], 1)[0]
        assert got[0][0] == n + 1 and got[0][1] < 1e-4

    # the first attach's remove wrote through to the shared file; attach
    # state is otherwise derived, so a fresh attach still serves
    fresh = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                        host_backing=back)
    # guards: non-empty/no-backing/bad-size/bad-norms
    with pytest.raises(ValueError):
        PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16) \
            .bulk_attach_memmap(path, n, d)
    with pytest.raises(ValueError):
        fresh.bulk_attach_memmap(path, n // 2, d)  # capacity mismatch
    with pytest.raises(ValueError):
        fresh.bulk_attach_memmap(path, n, d,
                                 sq_norms=np.zeros(3, np.float32))
    fresh.add(0, db[0])
    with pytest.raises(ValueError):
        fresh.bulk_attach_memmap(path, n, d)       # non-empty


def test_bulk_attach_memmap_flat(rng, tmp_path):
    """FlatIndex-level attach serves the exact scan directly."""
    from vectordb_tpu import FlatIndex

    n, d = 1200, 8
    db = rng.standard_normal((n, d)).astype(np.float32)
    back = str(tmp_path / "rows")
    src = FlatIndex(DistanceMetric.EUCLIDEAN, host_backing=back)
    src.bulk_load_stream(n, d, iter([db]))
    want = src.search_batch(db[:4] + 0.001, 5)
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, host_backing=back)
    idx.bulk_attach_memmap(src._vectors_path, n, d)
    assert idx.search_batch(db[:4] + 0.001, 5) == want
    with pytest.raises(ValueError):
        FlatIndex(DistanceMetric.EUCLIDEAN, storage="bf16",
                  host_backing=back).bulk_attach_memmap(
                      src._vectors_path, n, d)


# -- device-side exact re-rank -----------------------------------------------


class TestDeviceRerank:
    """ops/pq.pq_rerank_topk + the rerank="device" index lane: exact f32
    re-rank on chip instead of host NumPy (forced on the CPU backend
    here; "auto" resolves to device only on TPU)."""

    def _mk(self, rng, metric=DistanceMetric.EUCLIDEAN, n=3000, d=16,
            **kw):
        db = _clustered(rng, n, d, n_centers=8)
        if metric is DistanceMetric.COSINE:
            db = db + 2.0   # keep norms away from zero
        host = PqFlatIndex(metric, m=4, ksub=16, refine=64,
                           rerank="host", seed=0, **kw)
        dev = PqFlatIndex(metric, m=4, ksub=16, refine=64,
                          rerank="device", seed=0, **kw)
        ids = np.arange(n, dtype=np.int64)
        host.bulk_load_matrix(ids, db)
        dev.bulk_load_matrix(ids, db)
        host.train()
        dev.train()
        return db, host, dev

    @pytest.mark.parametrize("metric", [DistanceMetric.EUCLIDEAN,
                                        DistanceMetric.DOT_PRODUCT,
                                        DistanceMetric.COSINE])
    def test_matches_host_rerank(self, rng, metric):
        db, host, dev = self._mk(rng, metric)
        q = db[:32] + 0.001
        want = host.search_batch(q, 5)
        got = dev.search_batch(q, 5)
        for w, g in zip(want, got):
            assert [i for i, _ in w] == [i for i, _ in g]
            assert np.allclose([d for _, d in w], [d for _, d in g],
                               rtol=1e-5, atol=1e-5)

    def test_exact_distances_vs_oracle(self, rng):
        db, _, dev = self._mk(rng)
        q = db[7:8] + 0.01
        got = dev.search_batch(q, 3, refine=512)[0]
        d2 = np.sqrt(np.sum((db - q) ** 2, axis=1))
        order = np.argsort(d2)[:3]
        assert [i for i, _ in got] == order.tolist()
        assert np.allclose([d for _, d in got], d2[order], atol=1e-5)

    def test_filtered_device_rerank(self, rng):
        db, host, dev = self._mk(rng)
        mask = np.zeros(dev.capacity, bool)
        elig = np.arange(0, len(db), 3)
        mask[elig] = True
        q = np.ascontiguousarray(db[:8] + 0.001)
        want = host.search_batch(q, 5, slot_mask=mask)
        got = dev.search_batch(q, 5, slot_mask=mask)
        for w, g in zip(want, got):
            assert [i for i, _ in g] == [i for i, _ in w]
            assert all(i % 3 == 0 for i, _ in g)

    def test_mutations_resync_device_rows(self, rng):
        db, _, dev = self._mk(rng)
        q = np.ascontiguousarray(db[5:6])
        assert dev.search_batch(q, 1)[0][0][0] == 5
        # overwrite id 5 far away; a fresh row lands exactly on q
        dev.add(5, db[5] + 100.0)
        dev.add(4000, db[5])
        got = dev.search_batch(q, 2)[0]
        assert got[0][0] == 4000 and got[0][1] < 1e-4
        assert all(i != 5 for i, _ in got)
        dev.remove(4000)
        got = dev.search_batch(q, 1)[0]
        assert got[0][0] != 4000

    def test_mutation_race_repair(self, rng):
        """A slot mutated between scan snapshot and id-mapping must not
        leak the old occupant's distance under a new id; the repair path
        re-answers through the host re-rank over the kept pool."""
        db, _, dev = self._mk(rng)
        q = np.ascontiguousarray(db[5:6])
        orig = dev._collect_device_rerank
        fired = {}

        def hooked(queries, dev_out, k_req, tick0, lv0, mask):
            if not fired:
                fired["x"] = True
                dev.add(5, db[5] + 50.0)   # mutates id 5's slot mid-flight
            return orig(queries, dev_out, k_req, tick0, lv0, mask)

        dev._collect_device_rerank = hooked
        try:
            got = dev.search_batch(q, 5)[0]
        finally:
            dev._collect_device_rerank = orig
        assert fired
        assert len(got) == 5
        # id 5 must not appear with the OLD row's near-zero distance
        for i, dist in got:
            assert not (i == 5 and dist < 1.0), got

    def test_ivfpq_device_rerank_matches_host(self, rng):
        from vectordb_tpu.index import IvfPqIndex

        n, d = 4096, 16
        db = _clustered(rng, n, d, n_centers=8)
        ids = np.arange(n, dtype=np.int64)
        host = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8, m=4, ksub=16,
                          refine=64, seed=0, rerank="host")
        dev = IvfPqIndex(DistanceMetric.EUCLIDEAN, nlist=8, m=4, ksub=16,
                         refine=64, seed=0, rerank="device")
        host.bulk_load_matrix(ids, db)
        dev.bulk_load_matrix(ids, db)
        host.train()
        dev.train()
        q = np.ascontiguousarray(db[:16] + 0.001)
        want = host.search_batch(q, 5)
        got = dev.search_batch(q, 5)
        for w, g in zip(want, got):
            assert [i for i, _ in w] == [i for i, _ in g]
            assert np.allclose([d for _, d in w], [d for _, d in g],
                               rtol=1e-5, atol=1e-5)

    def test_bogus_rerank_mode_rejected(self):
        with pytest.raises(ValueError):
            PqFlatIndex(DistanceMetric.EUCLIDEAN, rerank="bogus")

    @pytest.mark.parametrize("metric", [DistanceMetric.EUCLIDEAN,
                                        DistanceMetric.DOT_PRODUCT,
                                        DistanceMetric.COSINE])
    def test_gathered_rerank_matches_host(self, rng, tmp_path, metric):
        """rerank="device" + host_backing takes the GATHERED lane (r5):
        host gathers candidate rows from the memmap, the device computes
        exact distances + top-k. Results must match the host re-rank
        id-for-id with distances to f32 tolerance."""
        n, d = 3000, 16
        db = _clustered(rng, n, d, n_centers=8)
        if metric is DistanceMetric.COSINE:
            db = db + 2.0
        ids = np.arange(n, dtype=np.int64)
        host = PqFlatIndex(metric, m=4, ksub=16, refine=64,
                           rerank="host", seed=0,
                           host_backing=str(tmp_path / "h"))
        dev = PqFlatIndex(metric, m=4, ksub=16, refine=64,
                          rerank="device", seed=0,
                          host_backing=str(tmp_path / "d"))
        host.bulk_load_matrix(ids, db)
        dev.bulk_load_matrix(ids, db)
        host.train()
        dev.train()
        assert dev._rerank_venue() == "gathered"
        q = np.ascontiguousarray(db[:33] + 0.001)   # non-pow2: pad path
        want = host.search_batch(q, 5)
        got = dev.search_batch(q, 5)
        for w, g in zip(want, got):
            assert [i for i, _ in w] == [i for i, _ in g]
            assert np.allclose([dd for _, dd in w], [dd for _, dd in g],
                               rtol=1e-5, atol=1e-5)

    def test_gathered_rerank_filter_and_delete(self, rng, tmp_path):
        """Filter masks and post-scan deletes flow through the gathered
        lane's ok-mask exactly like the host path."""
        n, d = 2000, 8
        db = _clustered(rng, n, d, n_centers=4)
        ids = np.arange(n, dtype=np.int64)
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                          refine=32, rerank="device", seed=0,
                          host_backing=str(tmp_path / "g"))
        idx.bulk_load_matrix(ids, db)
        idx.train()
        mask = np.zeros(idx.capacity, bool)
        evens = np.array([idx.slot_of(int(i)) for i in ids[::2]])
        mask[evens] = True
        res = idx.search_batch(db[:8] + 0.0005, 5, slot_mask=mask)
        for row in res:
            assert row, "filtered search returned nothing"
            assert all(i % 2 == 0 for i, _ in row)
        idx.remove(4)
        res = idx.search_batch(np.ascontiguousarray(db[4:5]), 3)
        assert all(i != 4 for i, _ in res[0])

    def test_gathered_rerank_many_blocks(self, rng, tmp_path):
        """Queries spanning multiple _RERANK_QBLOCK blocks exercise the
        depth-2 pipeline + the padded tail block."""
        from vectordb_tpu.index import pq as pqmod
        n, d = 1500, 8
        db = _clustered(rng, n, d, n_centers=4)
        ids = np.arange(n, dtype=np.int64)
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                          refine=32, rerank="device", seed=0,
                          host_backing=str(tmp_path / "m"))
        idx.bulk_load_matrix(ids, db)
        idx.train()
        href = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                           refine=32, rerank="host", seed=0)
        href.bulk_load_matrix(ids, db)
        href.train()
        old = pqmod._RERANK_QBLOCK
        pqmod._RERANK_QBLOCK = 16
        try:
            q = np.ascontiguousarray(db[:50] + 0.001)  # 3 blocks + tail
            got = idx.search_batch(q, 4)
            want = href.search_batch(q, 4)
        finally:
            pqmod._RERANK_QBLOCK = old
        for w, g in zip(want, got):
            assert [i for i, _ in w] == [i for i, _ in g]

    def test_rerank_topk_op_shapes(self, rng):
        import jax.numpy as jnp

        from vectordb_tpu.ops.pq import pq_rerank_topk

        cap, d, q, r, k = 256, 8, 1024, 16, 4   # q spans two map blocks
        rows = rng.standard_normal((cap, d)).astype(np.float32)
        slots = rng.integers(0, cap, (q, r)).astype(np.int32)
        scores = np.zeros((q, r), np.float32)
        scores[:, -2:] = np.inf          # empty candidate columns
        valid = np.ones(cap, bool)
        valid[3] = False
        dv, ds = pq_rerank_topk(jnp.asarray(rng.standard_normal(
            (q, d)).astype(np.float32)), jnp.asarray(rows),
            jnp.asarray(slots), jnp.asarray(scores), jnp.asarray(valid),
            DistanceMetric.EUCLIDEAN, k)
        dv, ds = np.asarray(dv), np.asarray(ds)
        assert dv.shape == (q, k) and ds.shape == (q, k)
        assert np.all(np.diff(dv, axis=1) >= 0)          # ascending
        finite = np.isfinite(dv)
        assert not np.any((ds == 3) & finite)            # invalid slot
        # masked columns never surface
        empty = np.isin(ds, slots[:, -2:]) & finite
        for qi in range(q):
            ok_slots = set(slots[qi, :-2].tolist()) - {3}
            for j in range(k):
                if finite[qi, j]:
                    assert int(ds[qi, j]) in ok_slots


# -- OPQ pre-rotation --------------------------------------------------------


def test_fit_opq_rotation_is_orthogonal(rng):
    from vectordb_tpu.ops.pq import fit_opq_rotation

    x = rng.standard_normal((2048, 64)).astype(np.float32)
    r = fit_opq_rotation(x, m=8)
    assert r.shape == (64, 64)
    assert np.allclose(r.T @ r, np.eye(64), atol=1e-4)


def test_rotation_improves_recall_on_spread_signal(rng):
    """Low-intrinsic-dimension data spread across all coordinates (the
    north-star protocol) is PQ's hard case: every raw subspace sees
    correlated noise-like slices. The OPQ rotation concentrates the
    signal so each codebook quantizes an independent share — measured
    0.80 -> 0.999 recall@10 at refine=16 on this config."""
    n, d, idim, q, k = 8192, 256, 16, 64, 10
    basis = rng.standard_normal((idim, d)).astype(np.float32) / \
        np.float32(idim ** 0.5)
    db = rng.standard_normal((n, idim)).astype(np.float32) @ basis
    qs = rng.standard_normal((q, idim)).astype(np.float32) @ basis
    d2 = (np.sum(qs * qs, 1)[:, None] + np.sum(db * db, 1)[None, :]
          - 2.0 * qs @ db.T)
    gt = [set(np.argsort(row)[:k].tolist()) for row in d2]

    def recall(rotate):
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=32, ksub=64,
                          seed=0, rotate=rotate)
        idx.bulk_load_matrix(np.arange(n, dtype=np.int64), db)
        idx.train()
        got = idx.search_batch(qs, k, refine=16)
        return float(np.mean([len({i for i, _ in row} & gt[qi]) / k
                              for qi, row in enumerate(got)]))

    plain, rotated = recall(False), recall(True)
    assert rotated > plain + 0.05, (plain, rotated)
    assert rotated > 0.97, rotated


def test_rotation_state_roundtrip_bit_identical(rng):
    """export/import must carry the rotation: an import without it would
    scan un-rotated queries against rotated codes and return garbage."""
    n, d, k = 2048, 64, 5
    db = _clustered(rng, n, d)
    qs = _clustered(rng, 32, d)
    a = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=8, ksub=32, seed=1,
                    rotate=True)
    a.bulk_load_matrix(np.arange(n, dtype=np.int64), db)
    a.train()
    state = a.export_trained_state()
    assert "rotation" in state
    b = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=8, ksub=32, seed=1,
                    rotate=False)        # import must override
    b.bulk_load_matrix(np.arange(n, dtype=np.int64), db)
    b.import_trained_state(state)
    for ra, rb in zip(a.search_batch(qs, k), b.search_batch(qs, k)):
        assert ra == rb


def test_calibrate_refine_meets_target(rng):
    """calibrate_refine installs the smallest refine pool meeting the
    recall target (PQ analogue of IVF's calibrate_nprobe), ground-truthed
    by the exact host stream."""
    n, d = 4096, 64
    db = _clustered(rng, n, d)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=8, ksub=32, seed=0,
                      refine=1)
    idx.bulk_load_matrix(np.arange(n, dtype=np.int64), db)
    idx.train()
    out = idx.calibrate_refine(0.9, k=10, sample=64,
                               candidates=(4, 16, 64, 256))
    assert set(out) == {"refine", "recall", "curve"}
    assert idx.refine == out["refine"]
    assert out["recall"] >= 0.9 or out["refine"] == max(out["curve"])
    # the installed default must actually serve at that quality
    qs = db[:32]
    got = idx.search_batch(qs, 1)
    assert sum(int(row[0][0] == i) for i, row in enumerate(got)) >= 31


def test_calibrate_refine_rejects_bad_target():
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16)
    with pytest.raises(Exception):
        idx.calibrate_refine(0.0)


def test_auto_venue_resolves_host_on_backing(tmp_path):
    """rerank="auto" + host_backing resolves to HOST — the measured r5
    policy (benchmarks/pq25_rerank_ab.py: host beats the gathered device
    re-rank 3.2-4.6x at 2^25 because shipping (Q, r, d) gathered rows
    through the relay outweighs the host BLAS it replaces). The gathered
    lane stays reachable via rerank="device" (previous test)."""
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, seed=0,
                      host_backing=str(tmp_path / "rows"))
    assert idx._rerank_venue() == "host"
