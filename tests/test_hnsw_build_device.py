"""MXU bulk HNSW builder (index/hnsw_build_device.py).

The builder must produce graphs interchangeable with sequential
Algorithm-1 construction: same table schema, same parameter semantics,
and recall meeting the reference gates (tests/recall_test.rs protocol).
Runs on the CPU backend — the builder's device calls are backend-neutral
XLA programs there.
"""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, FlatIndex, HnswIndex, HnswParams
from vectordb_tpu.errors import InvalidVectorError
from vectordb_tpu.index.hnsw_build_device import (build_device_tables,
                                                  build_graph_device,
                                                  sample_levels)
from vectordb_tpu.index.hnsw_graph import HnswGraph


def _build(n=800, d=32, metric=DistanceMetric.EUCLIDEAN, seed=3, block=256,
           m=16):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, d)).astype(np.float32)
    params = HnswParams(m=m, seed=seed)
    graph = build_graph_device(list(enumerate(data)), metric, params,
                               block=block)
    return data, params, graph


def _recall(graph, data, queries, k=10, ef=100,
            metric=DistanceMetric.EUCLIDEAN):
    flat = FlatIndex(metric)
    flat.add_batch(list(enumerate(data)))
    truth = flat.search_batch(queries, k)
    total = 0.0
    for qi in range(queries.shape[0]):
        got = {i for i, _ in graph.search_knn(queries[qi], k, ef=ef)}
        total += len(got & {i for i, _ in truth[qi]}) / k
    return total / queries.shape[0]


def test_recall_gate_euclidean():
    # reference gate analog: n=1000, d=64 -> >= 0.90 (recall_test.rs:72-75)
    rng = np.random.default_rng(7)
    n, d = 1000, 64
    data = rng.random((n, d)).astype(np.float32)
    graph = build_graph_device(list(enumerate(data)),
                               DistanceMetric.EUCLIDEAN,
                               HnswParams(seed=7), block=256)
    queries = rng.random((20, d)).astype(np.float32)
    assert _recall(graph, data, queries) >= 0.90


@pytest.mark.parametrize("metric", [DistanceMetric.COSINE,
                                    DistanceMetric.DOT_PRODUCT])
def test_recall_other_metrics(metric):
    data, _, graph = _build(n=600, d=32, metric=metric, block=200)
    rng = np.random.default_rng(11)
    queries = rng.standard_normal((15, 32)).astype(np.float32)
    assert _recall(graph, data, queries, metric=metric) >= 0.85


def test_matches_sequential_recall():
    """Exact candidate generation must not lose to the sequential build."""
    rng = np.random.default_rng(5)
    n, d, k = 1200, 48, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((30, d)).astype(np.float32)
    params = HnswParams(m=16, seed=5)
    g_dev = build_graph_device(list(enumerate(data)),
                               DistanceMetric.EUCLIDEAN, params, block=300)
    g_host = HnswGraph(DistanceMetric.EUCLIDEAN, params)
    for i in range(n):
        g_host.insert(i, data[i])
    r_dev = _recall(g_dev, data, queries, k=k)
    r_host = _recall(g_host, data, queries, k=k)
    assert r_dev >= r_host - 0.05  # same quality class, allow noise


def test_table_invariants():
    data, params, graph = _build(n=700, block=128)
    t = graph.export_padded_tables()
    n = data.shape[0]
    nbr, levels = t["neighbors"], t["levels"]
    assert t["valid"][:n].all()
    assert int(levels.max()) == t["max_level"]
    # entry = first slot attaining the global max level
    assert t["entry"] == int(np.argmax(levels == levels.max()))
    for layer in range(t["max_level"] + 1):
        cap_l = params.max_degree(layer)
        lists = nbr[:n, layer, :]
        live = lists >= 0
        # degree caps: nothing beyond max_degree(layer)
        assert not live[:, cap_l:].any()
        for slot in range(0, n, 97):
            row = lists[slot][live[slot]]
            # membership requires presence at the layer
            if levels[slot] < layer:
                assert row.size == 0
                continue
            # no self links, no duplicates, targets present at the layer
            assert slot not in row
            assert np.unique(row).size == row.size
            assert (levels[row] >= layer).all()
            # causality: all neighbors ... can point forward via
            # back-edges, so only validate range
            assert (row < n).all()


def test_apply_back_edges_keep_closest_semantics():
    """The vectorized grouped merge must equal brute-force keep-closest
    (reference prune_neighbors semantics, graph.rs:207-242) across
    multiple chunks of arrivals, including the append fast path."""
    from vectordb_tpu.index.hnsw_build_device import _apply_back_edges
    rng = np.random.default_rng(0)
    n_tgt, cap_l = 40, 8
    nbr = np.full((n_tgt, cap_l + 4), -1, np.int32)
    aux = np.full((n_tgt, cap_l + 4), np.inf, np.float32)
    ref = {t: [] for t in range(n_tgt)}
    next_src = 1000
    for _ in range(6):
        e = rng.integers(20, 300)
        tgt = rng.integers(0, n_tgt, e).astype(np.int64)
        src = np.arange(next_src, next_src + e, dtype=np.int64)
        next_src += e
        dist = rng.random(e).astype(np.float32)
        _apply_back_edges(nbr, aux, tgt, src, dist, cap_l)
        for t, s, dv in zip(tgt, src, dist):
            ref[int(t)].append((float(dv), int(s)))
            ref[int(t)] = sorted(ref[int(t)])[:cap_l]
    for t in range(n_tgt):
        got = {int(s) for s in nbr[t, :cap_l] if s >= 0}
        want = {s for _, s in ref[t]}
        assert got == want, (t, got, want)
        live = nbr[t, :cap_l] >= 0
        # aux distances track the stored ids
        by_id = {s: d for d, s in ref[t]}
        for s, d in zip(nbr[t, :cap_l][live], aux[t, :cap_l][live]):
            assert abs(by_id[int(s)] - float(d)) < 1e-6


def test_cosine_zero_vector_raises():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((300, 16)).astype(np.float32)
    data[17] = 0.0
    with pytest.raises(InvalidVectorError):
        build_graph_device(list(enumerate(data)), DistanceMetric.COSINE,
                           HnswParams(seed=0), block=100)


def test_mutations_after_device_build():
    data, params, graph = _build(n=400, d=24, block=100)
    rng = np.random.default_rng(9)
    extra = rng.standard_normal(24).astype(np.float32)
    graph.insert(10_000, extra)
    got = [i for i, _ in graph.search_knn(extra, 5, ef=64)]
    assert got[0] == 10_000
    graph.remove(10_000)
    got = [i for i, _ in graph.search_knn(extra, 5, ef=64)]
    assert 10_000 not in got
    # removing the entry point keeps the graph searchable
    t = graph.export_padded_tables()
    entry_id = int(t["id_of_slot"][t["entry"]])
    graph.remove(entry_id)
    assert len(graph.search_knn(data[3], 5, ef=64)) == 5


def test_level_sampling_distribution():
    params = HnswParams(m=16, seed=1)
    lv = sample_levels(200_000, params)
    assert lv.min() == 0 and lv.max() < params.max_layers
    # geometric: P(level >= 1) = 1/m
    frac = float((lv >= 1).mean())
    assert abs(frac - 1.0 / 16) < 0.01


def test_hnsw_index_bulk_build_device():
    rng = np.random.default_rng(21)
    n, d = 600, 32
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=2),
                    bulk_build="device")
    idx.build_batch(list(enumerate(data)))
    assert len(idx) == n
    got = [i for i, _ in idx.search_with_ef(data[42], 10, 100)]
    assert got[0] == 42
    # a second bulk build on a non-empty graph is an error in forced mode
    with pytest.raises(RuntimeError):
        idx.build_batch([(n + 1, data[0])])


def test_hnsw_index_bulk_build_device_duplicate_ids():
    rng = np.random.default_rng(22)
    data = rng.standard_normal((300, 16)).astype(np.float32)
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=2),
                    bulk_build="device")
    items = list(enumerate(data)) + [(0, data[1])]
    with pytest.raises(ValueError):
        idx.build_batch(items)


def test_small_batch_falls_back_to_host():
    # below MIN_DEVICE_BUILD auto mode uses the sequential path
    rng = np.random.default_rng(23)
    data = rng.standard_normal((100, 16)).astype(np.float32)
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=2))
    idx.build_batch(list(enumerate(data)))
    assert len(idx) == 100


def test_forced_device_build_honored_below_min(monkeypatch):
    """bulk_build='device' must use the device builder even below the
    auto path's MIN_DEVICE_BUILD heuristic — a silent host fallback
    would let device-build tests pass against the wrong code path."""
    from vectordb_tpu.index import hnsw_build_device as hbd
    calls = []
    real = hbd.build_device_tables

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(hbd, "build_device_tables", spy)
    rng = np.random.default_rng(24)
    data = rng.standard_normal((60, 16)).astype(np.float32)
    idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=2),
                    bulk_build="device")
    idx.build_batch(list(enumerate(data)))
    assert calls, "forced device mode fell back to the host build"
    assert len(idx) == 60
    got = [i for i, _ in idx.search_with_ef(data[17], 5, 64)]
    assert got[0] == 17


def test_tables_import_into_python_graph():
    """Device-built tables hydrate the pure-Python graph too."""
    rng = np.random.default_rng(31)
    n, d = 500, 24
    data = rng.standard_normal((n, d)).astype(np.float32)
    params = HnswParams(m=16, seed=4)
    tables = build_device_tables(np.arange(n, dtype=np.int64), data,
                                 DistanceMetric.EUCLIDEAN, params,
                                 block=128)
    g = HnswGraph(DistanceMetric.EUCLIDEAN, params)
    g.import_padded_tables(tables)
    assert len(g) == n
    got = [i for i, _ in g.search_knn(data[7], 5, ef=64)]
    assert got[0] == 7
