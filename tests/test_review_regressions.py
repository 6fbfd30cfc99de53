"""Regression tests for code-review findings (round 1 review)."""

import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from vectordb_tpu import (BatchInsertItem, DistanceMetric, Metadata,
                          MetadataFilter, Vector, VectorStore)
from vectordb_tpu.errors import DimensionMismatchError, InvalidVectorError
from vectordb_tpu.persistence import StorageEngine


def test_rejected_insert_does_not_poison_wal(tmp_path):
    """A dimension-mismatched insert must NOT reach the WAL — otherwise
    recovery replays it, raises, and the DB can never be reopened."""
    with StorageEngine.open(tmp_path) as eng:
        eng.insert("a", Vector([1.0, 2.0, 3.0]))
        with pytest.raises(DimensionMismatchError):
            eng.insert("bad", Vector([1.0, 2.0]))
        assert len(eng) == 1
    # must reopen cleanly with only the good entry
    with StorageEngine.open(tmp_path) as eng:
        assert eng.list_ids() == ["a"]


def test_insert_batch_duplicate_ids_no_phantom_rows():
    """Duplicate string IDs inside one batch: the later one wins, the
    earlier allocation must not leave a phantom index row."""
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
    v1, v2 = Vector([0.0, 0.0]), Vector([9.0, 9.0])
    store.insert_batch([
        BatchInsertItem("a", v1),
        BatchInsertItem("a", v2),
    ])
    assert len(store) == 1
    assert store.get("a") == v2
    # searching near v1 must NOT produce a phantom hit
    hits = store.search(v1, 2)
    assert len(hits) == 1
    assert hits[0].id == "a"
    # the phantom's metadata must not match filters either
    hits = store.search_with_filter(v1, 5, MetadataFilter.exists("nothing"))
    assert hits == []


def test_insert_batch_duplicate_ids_with_metadata():
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
    store.insert_batch([
        BatchInsertItem("a", Vector([1.0]), Metadata({"v": "old"})),
        BatchInsertItem("b", Vector([2.0]), Metadata({"v": "keep"})),
        BatchInsertItem("a", Vector([3.0]), Metadata({"v": "new"})),
    ])
    assert len(store) == 2
    assert store.get_metadata("a").get("v") == "new"
    assert store.search_with_filter(Vector([1.0]), 5,
                                    MetadataFilter.eq("v", "old")) == []


def test_explicit_k_zero_returns_empty():
    """k=0 must mean zero results, not the default 10 (0 is falsy)."""
    from vectordb_tpu.server import test_api
    api, _ = test_api()
    api.handle("POST", "/vectors", {"id": "a", "vector": [1.0]})
    status, hits = api.handle("POST", "/search", {"vector": [1.0], "k": 0})
    assert status == 200
    assert hits == []
    status, batches = api.handle("POST", "/search/batch", {
        "queries": [{"vector": [1.0], "k": 0}, {"vector": [1.0]}]})
    assert batches[0] == []
    assert len(batches[1]) == 1


def test_vector_does_not_alias_caller_array():
    arr = np.array([1.0, 0.0], dtype=np.float32)
    v = Vector(arr)
    arr[0] = 999.0
    assert v.as_list() == [1.0, 0.0]


def test_concurrent_writes_do_not_invalidate_inflight_reads(rng):
    """Direct library use: interleaved add+search from multiple threads
    must never hit 'Array has been deleted' from donated buffers."""
    from vectordb_tpu import FlatIndex
    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    data = rng.standard_normal((400, 16)).astype(np.float32)
    for i in range(100):
        idx.add(i, Vector(data[i]))
    errors = []

    def writer():
        try:
            for i in range(100, 400):
                idx.add(i, Vector(data[i]))
                if i % 7 == 0:
                    idx.remove(i - 50)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for _ in range(60):
                res = idx.search_batch(data[:8], 5)
                assert all(len(r) > 0 for r in res)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + \
        [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors


def test_batcher_zero_norm_cosine_fails_alone(rng):
    from vectordb_tpu.server import AppState
    from vectordb_tpu.server.batcher import QueryBatcher
    store = VectorStore.with_flat_index(DistanceMetric.COSINE)
    data = rng.standard_normal((20, 4)).astype(np.float32) + 2.0
    for i in range(20):
        store.insert(f"v{i}", Vector(data[i]))
    state = AppState(store)
    batcher = QueryBatcher(store, state.lock, window_ms=10.0)
    outcome = {}

    def good(i):
        outcome[i] = batcher.search(Vector(data[i]), 1)

    def bad():
        try:
            batcher.search(Vector([0.0, 0.0, 0.0, 0.0]), 1)
            outcome["bad"] = "no-error"
        except InvalidVectorError:
            outcome["bad"] = "zero-error"

    threads = ([threading.Thread(target=good, args=(i,)) for i in range(3)]
               + [threading.Thread(target=bad)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    batcher.close()
    assert outcome["bad"] == "zero-error"
    for i in range(3):
        assert outcome[i][0].id == f"v{i}"


def test_batcher_structural_filter_grouping(rng):
    """Identical filters from different requests must coalesce (one device
    call), not group by object identity."""
    from vectordb_tpu.server import AppState
    from vectordb_tpu.server.batcher import QueryBatcher, _Pending
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
    data = rng.standard_normal((20, 4)).astype(np.float32)
    for i in range(20):
        store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                   Metadata({"par": str(i % 2)}))
    state = AppState(store)
    batcher = QueryBatcher(store, state.lock, window_ms=5.0)
    calls = []
    orig = store.search_batch_with_filter

    def counting(queries, flt):
        calls.append(len(queries))
        return orig(queries, flt)

    store.search_batch_with_filter = counting
    items = [_Pending(query=Vector(data[i]), k=1,
                      filter=MetadataFilter.eq("par", "0"))
             for i in range(4)]
    batcher._execute(items)
    batcher.close()
    assert calls == [4]  # one coalesced device call for 4 distinct objects
    for item in items:
        assert item.results is not None


def test_http_url_decoding_and_query_strings():
    from vectordb_tpu.server import AppState
    from vectordb_tpu.server.app import start_server_background
    state = AppState(VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN))
    server, _ = start_server_background("127.0.0.1:0", state)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/vectors", method="POST",
            data=json.dumps({"id": "some id", "vector": [1.0]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 201
        with urllib.request.urlopen(f"{base}/vectors/some%20id") as resp:
            payload = json.loads(resp.read())
            assert payload["id"] == "some id"
        with urllib.request.urlopen(f"{base}/health?verbose=1") as resp:
            assert json.loads(resp.read())["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()


def test_native_hnsw_cosine_zero_counter(rng):
    """The O(1) zero-norm counter must behave across insert/remove."""
    from vectordb_tpu import HnswIndex, HnswParams
    from vectordb_tpu.index.hnsw_native import native_available
    if not native_available():
        pytest.skip("native core unavailable")
    idx = HnswIndex(DistanceMetric.COSINE, HnswParams(seed=1),
                    backend="native")
    idx.add(0, Vector([0.0, 0.0]))  # zero into EMPTY graph is allowed
    with pytest.raises(InvalidVectorError):
        idx.add(1, Vector([1.0, 0.0]))  # distance vs stored zero errors
    idx.remove(0)
    idx.add(1, Vector([1.0, 0.0]))
    idx.add(2, Vector([0.5, 0.5]))
    assert [i for i, _ in idx.search(Vector([1.0, 0.1]), 1)] == [1]


# -- round-1 second review findings ----------------------------------------

def test_stale_graph_not_imported_after_snapshot_changes(tmp_path):
    """A graph file from an older checkpoint must not be imported against a
    newer snapshot (content digest coupling)."""
    from vectordb_tpu import HnswParams
    from vectordb_tpu.persistence import EngineConfig
    cfg = EngineConfig(index_type="hnsw", hnsw_params=HnswParams(seed=2))
    rng = np.random.default_rng(0)
    data = rng.random((40, 8)).astype(np.float32)
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(40):
            eng.insert(f"v{i}", Vector(data[i]))
        eng.checkpoint()
    stale_graph = (tmp_path / "hnsw_graph.npz").read_bytes()
    # upsert every vector to NEW values and checkpoint again
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(40):
            eng.insert(f"v{i}", Vector(-data[i]))
        eng.checkpoint()
    # simulate a crash that left the OLD graph beside the NEW snapshot
    (tmp_path / "hnsw_graph.npz").write_bytes(stale_graph)
    with StorageEngine.open(tmp_path, cfg) as eng:
        # must have fallen back to rebuild: searching for the new value of
        # v3 must hit v3, not be misled by stale graph vectors
        hits = eng.search(Vector(-data[3]), 1)
        assert hits[0].id == "v3"
        assert hits[0].distance == pytest.approx(0.0, abs=1e-4)


def test_cosine_batch_insert_with_existing_zero_raises():
    from vectordb_tpu import HnswIndex, HnswParams
    from vectordb_tpu.index.hnsw_native import native_available
    if not native_available():
        pytest.skip("native core unavailable")
    idx = HnswIndex(DistanceMetric.COSINE, HnswParams(seed=1),
                    backend="native")
    idx.add(0, Vector([0.0, 0.0]))  # zero into empty graph is allowed
    rng = np.random.default_rng(1)
    items = [(i + 1, Vector(rng.random(2).astype(np.float32) + 0.1))
             for i in range(80)]
    with pytest.raises(InvalidVectorError):
        idx.build_batch(items)


def test_checkpoint_on_empty_hnsw_engine(tmp_path, monkeypatch):
    from vectordb_tpu import HnswParams
    from vectordb_tpu.persistence import EngineConfig
    monkeypatch.setenv("VDB_TPU_NO_NATIVE", "1")  # the pure-Python graph
    cfg = EngineConfig(index_type="hnsw", hnsw_params=HnswParams(seed=1))
    with StorageEngine.open(tmp_path, cfg) as eng:
        eng.checkpoint()  # must not crash on the never-allocated graph
        assert len(eng) == 0
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == 0


def test_plausible_but_corrupt_graph_tables_fall_back(tmp_path):
    """A structurally valid npz with out-of-range slots must fail cleanly
    into the rebuild path (no crash, no wrong answers)."""
    from vectordb_tpu import HnswParams
    from vectordb_tpu.persistence import EngineConfig
    cfg = EngineConfig(index_type="hnsw", hnsw_params=HnswParams(seed=3))
    rng = np.random.default_rng(0)
    data = rng.random((30, 8)).astype(np.float32)
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(30):
            eng.insert(f"v{i}", Vector(data[i]))
        eng.checkpoint()
    # corrupt the neighbor table with out-of-range slots, keep everything
    # else (including the digest) intact
    import io
    with np.load(tmp_path / "hnsw_graph.npz") as z:
        tables = {key: z[key] for key in z.files}
    tables["neighbors"] = tables["neighbors"].copy()
    tables["neighbors"][tables["neighbors"] >= 0] = 10 ** 6
    buf = io.BytesIO()
    np.savez(buf, **tables)
    (tmp_path / "hnsw_graph.npz").write_bytes(buf.getvalue())
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == 30
        assert eng.search(Vector(data[7]), 1)[0].id == "v7"


def test_cli_search_mode_reaches_persistent_engine(tmp_path, capsys):
    from vectordb_tpu.cli import main
    d = str(tmp_path / "db")
    assert main(["--data-dir", d, "--search-mode", "fast",
                 "insert", "a", "--vector", "1.0,2.0"]) == 0
    assert main(["--data-dir", d, "--search-mode", "fast",
                 "search", "1.0,2.1", "-k", "1"]) == 0
    out = capsys.readouterr().out
    assert "1. a" in out


def _dot_precisions(jaxpr):
    """All dot_general precision attributes in a (closed) jaxpr, recursively."""
    found = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            found.append(eqn.params.get("precision"))
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                found.extend(_dot_precisions(v.jaxpr))
    return found


def test_refine_dots_request_highest_precision():
    """The exact re-rank's candidate dots must run at HIGHEST MXU precision:
    the TPU default is single-pass bf16 (measured 2.2e-1 absolute error on
    d=768 dots vs 1.3e-5 at highest), which would silently break the
    exact-distance contract. CPU runs are f32 either way, so this asserts
    on the traced jaxpr's precision attribute instead of on numerics."""
    import jax
    from jax.lax import Precision
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.ops import topk as topk_mod

    q, n, d, k = 4, 64, 16, 2
    queries = jnp.zeros((q, d), jnp.float32)
    db = jnp.zeros((n, d), jnp.float32)
    sq = jnp.zeros((n,), jnp.float32)
    norms = jnp.zeros((n,), jnp.float32)
    valid = jnp.ones((n,), bool)
    cand = jnp.zeros((q, 8), jnp.int32)
    jaxpr = jax.make_jaxpr(
        lambda *a: topk_mod._exact_rerank(*a, DistanceMetric.EUCLIDEAN, k)
    )(queries, db, sq, norms, valid, cand)
    precisions = _dot_precisions(jaxpr.jaxpr)
    assert precisions, "expected a dot_general in the refine"
    assert all(p == (Precision.HIGHEST, Precision.HIGHEST)
               for p in precisions), precisions


def test_flat_kernel_refine_requests_highest_precision():
    import jax
    from jax.lax import Precision
    from vectordb_tpu.ops import flat_kernel

    q, n, d, k = 4, 64, 16, 2
    queries = jnp.zeros((q, d), jnp.float32)
    db = jnp.zeros((n, d), jnp.float32)
    sq = jnp.zeros((n,), jnp.float32)
    norms = jnp.zeros((n,), jnp.float32)
    valid = jnp.ones((n,), bool)
    jaxpr = jax.make_jaxpr(
        lambda *a: flat_kernel.two_phase_search(
            *a, "euclidean", k, tile_rows=16, interpret=True)
    )(queries, db, sq, norms, valid)
    # the refine einsum contracts over d with a batched (q) dimension: pick
    # out 3-operand-rank dots and require highest precision on all of them
    precisions = []
    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "dot_general":
                lhs_rank = len(eqn.invars[0].aval.shape)
                if lhs_rank == 3:
                    precisions.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
    walk(jaxpr.jaxpr)
    assert precisions, "expected the refine's batched dot in the jaxpr"
    assert all(p == (Precision.HIGHEST, Precision.HIGHEST)
               for p in precisions), precisions


# ---- round-2 advisor findings -------------------------------------------

def test_ivf_trained_add_batch_routes_through_clusters(rng):
    """add_batch on a TRAINED IVF index must route rows through cluster
    placement — the inherited packed bulk path grew capacity outside the
    trained layout, breaking probed search and remove()."""
    from vectordb_tpu.index import IvfFlatIndex
    n, d = 800, 16
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8, nprobe=8, seed=3)
    idx.add_batch([(i, db[i]) for i in range(n)])
    idx.train()
    cap_before = idx.capacity
    new = rng.standard_normal((16, d)).astype(np.float32)
    idx.add_batch([(n + i, new[i]) for i in range(16)])
    assert idx.capacity == cap_before, "rows left the trained layout"
    # exact-match probed queries must find the batch-inserted rows
    res = idx.search_batch(new, 1)
    assert [r[0][0] for r in res] == [n + i for i in range(16)]
    # and removal must work (stale _slot_cluster used to raise IndexError)
    for i in range(16):
        idx.remove(n + i)
    assert len(idx) == n


def test_bf16_storage_exact_when_tier1_disabled(rng, monkeypatch):
    """storage="bf16" with the 1-pass tier env-disabled must NOT run the
    bf16x3 pipeline with an aliased lo mirror (which double-counted the
    hi*qhi term under a still-passing certificate); the blockwise widening
    scan serves instead, exact over the stored values."""
    monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VDB_TPU_EXACT1P", "0")
    import ml_dtypes
    from vectordb_tpu.index.flat import FlatIndex
    n, d, k = 2048, 32, 8
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, storage="bf16")
    idx.add_batch([(i, db[i]) for i in range(n)])
    stored = db.astype(ml_dtypes.bfloat16).astype(np.float32)
    res = idx.search_batch(db[:8], k)
    for qi in range(8):
        exact = np.linalg.norm(stored - db[qi], axis=1)
        got_d = [dv for _, dv in res[qi]]
        # every returned distance is the true distance of its id (2e-3
        # absolute allows the expansion formula's f32 cancellation on
        # near-self matches; the aliasing bug produced ~1e-1 errors)
        for rid, dv in res[qi]:
            assert abs(dv - float(exact[rid])) < 2e-3, (rid, dv, exact[rid])
        # and the returned set IS the top-k by value
        want_kth = float(np.sort(exact)[k - 1])
        assert abs(got_d[-1] - want_kth) < 2e-3, (got_d[-1], want_kth)


def test_filtered_search_survives_concurrent_retrain(rng, monkeypatch):
    """A retrain that repacks slots between mask compilation and the
    masked scan must not silently filter the wrong rows: the index raises
    StaleSlotMaskError under its lock and the store recompiles."""
    from vectordb_tpu.index import IvfFlatIndex
    from vectordb_tpu.metadata import ColumnarMetadata
    n, d, k = 600, 8, 5
    db = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore.with_index(
        IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=4, nprobe=4,
                     auto_train_min=10 ** 9, seed=2))
    for i in range(n):
        store.insert_with_metadata(
            f"v{i}", Vector(db[i]),
            Metadata({"group": "a" if i % 3 == 0 else "b"}))
    store.index.train()
    ver0 = store.index.slot_layout_version

    calls = {"n": 0}
    orig = ColumnarMetadata.compile_mask

    def train_after_compiling(self, filt):
        mask = orig(self, filt)
        if calls["n"] < 2:
            calls["n"] += 1
            store.index.train()   # repack: invalidates the mask just made
        return mask

    monkeypatch.setattr(ColumnarMetadata, "compile_mask",
                        train_after_compiling)
    filt = MetadataFilter.from_dict({"op": "eq", "field": "group",
                                     "value": "a"})
    res = store.search_with_filter(Vector(db[0]), k, filt)
    assert store.index.slot_layout_version >= ver0 + 2
    assert calls["n"] == 2, "masked search should have retried twice"
    # exact filtered oracle over group == "a"
    ids_a = np.array([i for i in range(n) if i % 3 == 0])
    exact = np.linalg.norm(db[ids_a] - db[0], axis=1)
    want = [f"v{ids_a[j]}" for j in np.argsort(exact, kind="stable")[:k]]
    assert [r.id for r in res] == want
    # batch API takes the same guarded path
    calls["n"] = 0
    bres = store.search_batch_with_filter([(Vector(db[0]), k)], filt)
    assert [r.id for r in bres[0]] == want


def test_ivf_probed_path_honors_any_k_with_sparse_clusters(rng):
    """Probing clusters whose live rows thinned below k (deletes) must
    still return k results when the index holds >= k live rows."""
    from vectordb_tpu.index import IvfFlatIndex
    d = 8
    blob0 = rng.standard_normal((40, d)).astype(np.float32) * 0.05
    blob1 = (rng.standard_normal((472, d)).astype(np.float32) * 0.05
             + np.float32(10.0))
    db = np.concatenate([blob0, blob1])
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=2, nprobe=1,
                       auto_train_min=10 ** 9, seed=4)
    idx.add_batch([(i, db[i]) for i in range(len(db))])
    idx.train()
    for i in range(35):          # thin out blob 0's cluster
        idx.remove(i)
    k = 20
    res = idx.search_batch(np.zeros((1, d), np.float32), k)
    assert len(res[0]) == k, f"got {len(res[0])} results, want {k}"
    dd = [dv for _, dv in res[0]]
    assert dd == sorted(dd)
    # the 5 surviving blob-0 rows must lead the results
    lead = {rid for rid, _ in res[0][:5]}
    assert lead == set(range(35, 40)), lead


# ---------------------------------------------------------------------------
# round-2 review findings (PQ / host-backing / radius sweep)
# ---------------------------------------------------------------------------


def _intrinsic(rng, n, d, idim=8):
    basis = rng.standard_normal((idim, d)).astype(np.float32)
    return (rng.standard_normal((n, idim)).astype(np.float32) @ basis
            / np.float32(idim ** 0.5))


def test_host_backing_shared_dir_no_clobber(tmp_path, rng=None):
    """Two indexes sharing a host_backing directory must not truncate
    each other's row files (deterministic rows_{n}x{d}.f32 names +
    mode='w+' did exactly that)."""
    from vectordb_tpu.index import FlatIndex

    rng = np.random.default_rng(0)
    a = FlatIndex(DistanceMetric.EUCLIDEAN, host_backing=str(tmp_path))
    b = FlatIndex(DistanceMetric.EUCLIDEAN, host_backing=str(tmp_path))
    ra = rng.standard_normal((32, 8)).astype(np.float32)
    rb = rng.standard_normal((32, 8)).astype(np.float32) + 100.0
    for i in range(32):
        a.add(i, Vector(ra[i]))
        b.add(i, Vector(rb[i]))
    # a's stored rows must still be a's values, not zeros or b's
    got_a = a.search(Vector(ra[7]), 1)
    got_b = b.search(Vector(rb[9]), 1)
    assert got_a[0][0] == 7 and got_a[0][1] < 1e-4
    assert got_b[0][0] == 9 and got_b[0][1] < 1e-4


def test_bulk_load_stream_dim_mismatch_typed_error():
    """An emptied index keeps its dimension: bulk_load_stream with a
    different dim must raise the typed error up front, not a numpy
    broadcast error mid-ingest."""
    from vectordb_tpu.index import FlatIndex

    idx = FlatIndex(DistanceMetric.EUCLIDEAN)
    idx.add(0, Vector([1.0, 2.0, 3.0, 4.0]))
    idx.remove(0)
    with pytest.raises(DimensionMismatchError):
        idx.bulk_load_stream(2, 8, iter([np.zeros((2, 8), np.float32)]))


def test_engine_stale_pq_state_with_empty_store_does_not_wedge(tmp_path):
    """A leftover pq_state.npz beside an empty store must not be
    imported: the store's dimension is fixed by the FIRST insert, and a
    codebook of any other dimensionality would crash every later search
    with the index permanently 'trained'."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    rng = np.random.default_rng(1)
    cfg = EngineConfig(checkpoint_interval=10 ** 9,
                       metric=DistanceMetric.EUCLIDEAN, index_type="pq")
    db = rng.standard_normal((300, 8)).astype(np.float32)
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(300):
            eng.insert(f"v{i}", Vector(db[i]))
        eng.store.index.train()
        eng.checkpoint()
    assert (tmp_path / StorageEngine.PQ_FILE).exists()
    # wipe the data but keep the trained state (stale-dir scenario)
    (tmp_path / "snapshot.bin").unlink()
    (tmp_path / "wal.log").unlink()
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == 0
        eng.insert("a", Vector([1.0, 2.0, 3.0, 4.0]))   # d=4 now
        res = eng.search(Vector([1.0, 2.0, 3.0, 4.0]), 1)
        assert res[0].id == "a"


def test_pq_masked_selective_filter_exact_full_k():
    """A filter whose eligible rows sit in contiguous slots used to
    collide into one positional approx_min_k bucket and silently return
    fewer than k results; small eligible sets now take an exact host
    path — results must equal numpy brute force over the eligible rows."""
    from vectordb_tpu.index import PqFlatIndex

    rng = np.random.default_rng(2)
    d, n, k = 16, 3000, 10
    db = _intrinsic(rng, n, d)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=32)
    for i in range(n):
        idx.add(i, Vector(db[i]))
    idx.train()
    mask = np.zeros(idx.capacity, dtype=bool)
    lo, hi = 1000, 1100                      # 100 contiguous eligible rows
    mask[lo:hi] = True
    qs = _intrinsic(rng, 8, d)
    got = idx.search_batch(qs, k, slot_mask=mask)
    elig = db[lo:hi]
    for qi, row in enumerate(got):
        assert len(row) == k, f"under-return: {len(row)} < {k}"
        diff = elig - qs[qi]
        want_d = np.sqrt(np.einsum("nd,nd->n", diff, diff))
        order = np.argsort(want_d, kind="stable")[:k]
        want = [(int(lo + j), float(want_d[j])) for j in order]
        got_ids = [i for i, _ in row]
        assert got_ids == [i for i, _ in want]
        for (gi, gd), (wi, wd) in zip(row, want):
            assert abs(gd - wd) < 1e-5


def test_pq_masked_large_filter_returns_full_k():
    """Above the exact-path threshold the masked scan runs; any query
    that still comes back short is re-answered exactly (safety net).
    Every returned id must be eligible and every distance exact."""
    from vectordb_tpu.index import PqFlatIndex

    rng = np.random.default_rng(3)
    d, n, k = 16, 6000, 10
    db = _intrinsic(rng, n, d)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16, refine=16)
    for i in range(n):
        idx.add(i, Vector(db[i]))
    idx.train()
    mask = np.zeros(idx.capacity, dtype=bool)
    lo, hi = 500, 3100                       # 2600 eligible > threshold
    mask[lo:hi] = True
    qs = _intrinsic(rng, 8, d)
    got = idx.search_batch(qs, k, slot_mask=mask)
    for qi, row in enumerate(got):
        assert len(row) == k, f"under-return: {len(row)} < {k}"
        for iid, dist in row:
            assert lo <= iid < hi
            diff = db[iid] - qs[qi]
            assert abs(dist - float(np.sqrt(diff @ diff))) < 1e-5


def test_pq_encode_batch_size_invariant():
    """Codes must not depend on write-batch history: encoding 3 rows
    alone and the same rows inside a 1024-row batch (different chunk
    shapes) must produce identical codes — the property the
    bit-identical-reopen contract rests on."""
    from vectordb_tpu.index import PqFlatIndex

    rng = np.random.default_rng(4)
    d = 16
    db = _intrinsic(rng, 1024, d)
    idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16)
    for i in range(256):
        idx.add(i, Vector(db[i]))
    idx.train()
    small = idx._encode_rows(db[:3])
    big = idx._encode_rows(db)
    assert np.array_equal(small, big[:3])
