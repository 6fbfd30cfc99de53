"""bf16 storage mode: half the bytes per row, certified-exact search over
the STORED (bfloat16-quantized) values.

Vectors are quantized at insert; get_vector returns the quantized values;
the device holds one 2-byte/element buffer that serves as its own hi
mirror (elo_max = 0). Runs the kernels in interpreter mode on CPU; also
covers the blockwise-widening XLA fallback with pallas disabled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import ml_dtypes

from vectordb_tpu import DistanceMetric, VectorStore
from vectordb_tpu.index.flat import FlatIndex
from vectordb_tpu.ops import topk as topk_mod
from vectordb_tpu.vector import Vector

from test_coarse_kernel import _oracle


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")


def _q16(arr):
    return arr.astype(ml_dtypes.bfloat16).astype(np.float32)


def _build(rng, n, d, metric, **kw):
    idx = FlatIndex(metric, storage="bf16", **kw)
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx.add_batch([(i, data[i]) for i in range(n)])
    return idx, data


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_exact_over_stored_values(rng, metric):
    n, d, q, k = 1500, 32, 6, 10
    idx, data = _build(rng, n, d, metric)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    results = idx.search_batch(queries, k)
    stored = _q16(data)
    want_d, want_i = _oracle(queries, stored, np.ones(n, bool), metric, k)
    for qi in range(q):
        got = [i for i, _ in results[qi]]
        assert got == [int(w) for w in want_i[qi]], (qi, got, want_i[qi])
        np.testing.assert_allclose([dv for _, dv in results[qi]],
                                   want_d[qi], rtol=2e-5, atol=2e-5)


def test_get_vector_returns_quantized(rng):
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, storage="bf16")
    v = rng.standard_normal(16).astype(np.float32)
    idx.add(7, Vector(v))
    got = np.asarray(idx.get_vector(7).as_array())
    np.testing.assert_array_equal(got, _q16(v))
    assert not np.array_equal(got, v)   # quantization really happened


def test_device_buffer_is_bf16_and_certifies(rng):
    n, d = 1500, 32
    idx, data = _build(rng, n, d, DistanceMetric.EUCLIDEAN)
    dev = idx._sync_device()
    assert dev["db"].dtype == jnp.bfloat16
    assert dev.get("bf16_storage") is True
    assert float(dev["elo_max"]) == 0.0
    assert dev["hi"] is dev["db"]
    # the 1p tier must engage regardless of the capacity gate
    assert topk_mod._use_exact1p(dev, idx.capacity, d, 10)


def test_mutation_keeps_db_and_hi_aliased(rng):
    n, d, k = 1200, 16, 5
    idx, data = _build(rng, n, d, DistanceMetric.EUCLIDEAN)
    idx.search_batch(data[:2] + 0.001, k)      # force device sync
    new = rng.standard_normal(d).astype(np.float32)
    idx.add(5000, Vector(new))
    idx.remove(17)
    res = idx.search(Vector(_q16(new)), k)
    assert res[0][0] == 5000 and abs(res[0][1]) < 1e-5
    assert all(i != 17 for i, _ in idx.search(Vector(data[17]), k))
    dev = idx._sync_device()
    assert dev["hi"] is dev["db"]


def test_xla_fallback_without_pallas(rng, monkeypatch):
    monkeypatch.setenv("VDB_TPU_NO_PALLAS", "1")
    monkeypatch.delenv("VDB_TPU_PALLAS_INTERPRET", raising=False)
    n, d, q, k = 1300, 16, 4, 7
    idx, data = _build(rng, n, d, DistanceMetric.EUCLIDEAN)
    dev = idx._sync_device()
    assert "hi" not in dev and dev["db"].dtype == jnp.bfloat16
    queries = rng.standard_normal((q, d)).astype(np.float32)
    results = idx.search_batch(queries, k)
    stored = _q16(data)
    _, want_i = _oracle(queries, stored, np.ones(n, bool),
                        DistanceMetric.EUCLIDEAN, k)
    for qi in range(q):
        assert [i for i, _ in results[qi]] == [int(w) for w in want_i[qi]]


def test_store_level_constructor(rng):
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN,
                                        storage="bf16")
    v = rng.standard_normal(8).astype(np.float32)
    store.insert("a", Vector(v))
    got = np.asarray(store.get("a").as_array())
    np.testing.assert_array_equal(got, _q16(v))
    assert store.search(Vector(v), 1)[0].id == "a"


def test_bf16_composes_with_mesh():
    """bf16 storage + mesh sharding compose (round-2; full correctness
    coverage lives in test_distributed.TestShardedStoreCoarse)."""
    from vectordb_tpu.parallel import make_mesh
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, storage="bf16",
                    mesh=make_mesh(8))
    assert idx.storage == "bf16" and idx._mesh is not None
