"""int8 storage mode: a quarter of f32's bytes per row, exact search over
the STORED (per-row pow2-scaled int8) values.

Vectors are quantized at insert; get_vector returns the dequantized
stored values; the device holds a 1-byte/element code buffer plus a
4-byte/row scale vector, and search runs the blockwise dequantizing
scan (ops/topk.py) — exact over the stored value set.
"""

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, VectorStore
from vectordb_tpu.distance import pairwise_distances
from vectordb_tpu.index.flat import (FlatIndex, _int8_codes_scales,
                                     _int8_row_scales, _quantize_int8)
from vectordb_tpu.vector import Vector


def _mk(n=600, d=48, metric=DistanceMetric.EUCLIDEAN, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(metric, storage="int8")
    idx.add_batch(list(enumerate(data)))
    return data, idx


def _oracle_topk(stored, queries, metric, k):
    d = pairwise_distances(np, queries, stored, metric)
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    return order, np.take_along_axis(d, order, axis=1)


def test_pow2_scales_exact_roundtrip():
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((200, 32)).astype(np.float32) * \
        np.exp(rng.uniform(-8, 8, (200, 1))).astype(np.float32)
    q1 = _quantize_int8(mat)
    # idempotent: requantizing stored values is the identity
    np.testing.assert_array_equal(q1, _quantize_int8(q1))
    # codes/scales recovered from stored rows reproduce them bit-exactly
    codes, scales = _int8_codes_scales(q1)
    np.testing.assert_array_equal(
        q1, codes.astype(np.float32) * scales[:, None])
    assert np.abs(codes).max() <= 127
    # scales are powers of two
    s = _int8_row_scales(q1)
    np.testing.assert_array_equal(s, np.exp2(np.round(np.log2(s))))


def test_zero_row_quantizes_to_zero():
    z = np.zeros((3, 8), np.float32)
    np.testing.assert_array_equal(_quantize_int8(z), z)


@pytest.mark.parametrize("metric", [DistanceMetric.EUCLIDEAN,
                                    DistanceMetric.COSINE,
                                    DistanceMetric.DOT_PRODUCT])
def test_search_exact_over_stored_values(metric):
    data, idx = _mk(metric=metric)
    stored = np.stack([__import__("vectordb_tpu").vector.as_f32_array(idx.get_vector(i))
                       for i in range(len(data))])
    # stored values are the quantized set, not the originals
    np.testing.assert_array_equal(stored, _quantize_int8(data))
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((16, data.shape[1])).astype(np.float32)
    want_ids, want_d = _oracle_topk(stored, queries, metric, 10)
    got = idx.search_batch(queries, 10)
    for qi in range(queries.shape[0]):
        ids = [i for i, _ in got[qi]]
        ds = np.array([dv for _, dv in got[qi]], np.float32)
        assert ids == list(want_ids[qi]), (qi, ids, want_ids[qi])
        np.testing.assert_allclose(ds, want_d[qi], rtol=1e-5, atol=1e-5)


def test_mutations_and_dirty_scatter():
    data, idx = _mk(n=300, d=24)
    q = data[17]
    # force a device sync, then mutate (dirty-scatter path)
    idx.search_batch(q.reshape(1, -1), 3)
    rng = np.random.default_rng(3)
    new = rng.standard_normal(24).astype(np.float32)
    idx.add(9999, Vector(new))
    idx.remove(17)
    got = idx.search_batch(_quantize_int8(new).reshape(1, -1), 2)[0]
    assert got[0][0] == 9999
    assert all(i != 17 for i, _ in got)


def test_quarter_footprint():
    _, idx = _mk(n=200, d=64)
    dev = idx._sync_device()
    assert dev["db"].dtype == np.int8
    assert dev["db"].nbytes == idx.capacity * 64
    assert dev.get("int8_storage") is True


def test_int8_composes_with_mesh():
    """Round-3: int8 x mesh is a supported composition (the sharded
    coarse/XLA paths dequantize per shard — tests/test_distributed.py
    TestShardedInt8 covers exactness; this guards the constructor)."""
    import jax
    from jax.sharding import Mesh
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, storage="int8",
                    mesh=Mesh(np.array(jax.devices()[:2]), ("shard",)))
    assert idx.storage == "int8" and idx._mesh is not None


def test_store_level_int8():
    rng = np.random.default_rng(5)
    data = rng.standard_normal((400, 32)).astype(np.float32)
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN,
                                        storage="int8")
    from vectordb_tpu.metadata import Metadata
    from vectordb_tpu.store import BatchInsertItem
    store.insert_batch([BatchInsertItem(f"v{i}", Vector(data[i]),
                                        Metadata({"g": str(i % 2)}))
                        for i in range(400)])
    res = store.search(Vector(data[10]), 3)
    assert res[0].id == "v10"
    from vectordb_tpu import MetadataFilter
    filt = MetadataFilter.from_dict({"op": "eq", "field": "g",
                                     "value": "1"})
    fres = store.search_with_filter(Vector(data[10]), 3, filt)
    assert fres and all(int(r.id[1:]) % 2 == 1 for r in fres)


# ---- int8-source 1-pass certified tier (Pallas interpret mode) ----------

import jax.numpy as jnp  # noqa: E402

from vectordb_tpu.ops import coarse_kernel  # noqa: E402
from vectordb_tpu.ops import topk as topk_mod  # noqa: E402


@pytest.fixture
def _tier1(monkeypatch):
    monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")


def _stored_rows(idx):
    from vectordb_tpu.vector import as_f32_array
    cap = idx.capacity
    rows = idx._vectors.copy()
    return rows, idx._valid.copy()


@pytest.mark.parametrize("metric", [DistanceMetric.EUCLIDEAN,
                                    DistanceMetric.COSINE,
                                    DistanceMetric.DOT_PRODUCT])
def test_int8_tier1_matches_blockwise_scan(metric, _tier1, monkeypatch):
    data, idx = _mk(n=700, d=48, metric=metric, seed=11)
    idx.remove(5)
    idx.remove(123)
    dev = idx._sync_device()
    assert dev.get("int8_storage") and "elo_max" in dev
    rng = np.random.default_rng(8)
    queries = rng.standard_normal((9, 48)).astype(np.float32)
    d1, i1 = topk_mod.flat_search_batched(queries, dev, metric, 10)
    # the blockwise dequantizing scan (tier disabled) must agree: same
    # ids, same distances over the same stored value set
    monkeypatch.setenv("VDB_TPU_EXACT1P", "0")
    d0, i0 = topk_mod.flat_search_batched(queries, dev, metric, 10)
    assert np.array_equal(i1[:, :10], i0[:, :10])
    np.testing.assert_allclose(d1[:, :10], d0[:, :10], rtol=1e-5,
                               atol=1e-6)
    # and both match the numpy oracle over live stored rows
    rows, valid = _stored_rows(idx)
    dfull = pairwise_distances(np, queries, rows, metric)
    dfull[:, ~valid] = np.inf
    want = np.argsort(dfull, axis=1, kind="stable")[:, :10]
    assert np.array_equal(i1[:, :10], want)


def test_int8_certificates_hold_on_gaussian(_tier1):
    data, idx = _mk(n=1000, d=48, seed=3)
    dev = idx._sync_device()
    queries = np.random.default_rng(4).standard_normal(
        (8, 48)).astype(np.float32)
    dists, ids, cert = coarse_kernel.coarse_search_1p(
        jnp.asarray(queries), dev["db"], dev["sq_norms"], dev["norms"],
        dev["valid"], None, dev["elo_max"], DistanceMetric.EUCLIDEAN, 10,
        scales=dev["scales"])
    assert np.asarray(cert).all(), "zero db residual: gaussian certifies"


def test_int8_tier1_engages_and_huge_elo_falls_back_exact(
        _tier1, monkeypatch):
    data, idx = _mk(n=900, d=32, seed=9)
    dev = idx._sync_device()
    calls = []
    real = coarse_kernel.coarse_search_1p

    def spy(*args, **kwargs):
        calls.append(True)
        return real(*args, **kwargs)

    monkeypatch.setattr(coarse_kernel, "coarse_search_1p", spy)
    rng = np.random.default_rng(2)
    queries = rng.standard_normal((4, 32)).astype(np.float32)
    d1, i1 = topk_mod.flat_search_batched(queries, dev,
                                          DistanceMetric.EUCLIDEAN, 7)
    assert calls, "int8 tier 1 should have engaged"
    # sabotaged bound -> all queries uncertified -> blockwise fallback
    # must still return exact results over the stored values
    dev2 = dict(dev)
    dev2["elo_max"] = jnp.float32(1e9)
    d2, i2 = topk_mod.flat_search_batched(queries, dev2,
                                          DistanceMetric.EUCLIDEAN, 7)
    assert np.array_equal(i1[:, :7], i2[:, :7])
    np.testing.assert_allclose(d1[:, :7], d2[:, :7], rtol=1e-5,
                               atol=1e-6)


def test_int8_tier1_respects_filter_mask(_tier1):
    """The filtered-search path swaps a narrowed valid mask into the
    device state; the certificate must stay sound under any mask."""
    data, idx = _mk(n=800, d=32, seed=13)
    dev = dict(idx._sync_device())
    mask = np.zeros(idx.capacity, dtype=bool)
    mask[:64] = True
    dev["valid"] = jnp.logical_and(dev["valid"], jnp.asarray(mask))
    rng = np.random.default_rng(6)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    d1, i1 = topk_mod.flat_search_batched(queries, dev,
                                          DistanceMetric.EUCLIDEAN, 5)
    assert (i1[:, :5] < 64).all()
    rows, valid = _stored_rows(idx)
    valid &= mask
    dfull = pairwise_distances(np, queries, rows, DistanceMetric.EUCLIDEAN)
    dfull[:, ~valid] = np.inf
    want = np.argsort(dfull, axis=1, kind="stable")[:, :5]
    assert np.array_equal(i1[:, :5], want)


def test_engine_int8_storage_recovers_bit_exact(tmp_path):
    """EngineConfig(storage="int8"): quantization at insert is idempotent
    (pow2 scales), so WAL replay + snapshot re-insert reproduce the
    stored values — and therefore search results — bit-exactly."""
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    rng = np.random.default_rng(21)
    data = rng.standard_normal((60, 24)).astype(np.float32) * \
        np.exp(rng.uniform(-6, 6, (60, 1))).astype(np.float32)
    cfg = EngineConfig(checkpoint_interval=25, metric=DistanceMetric.EUCLIDEAN,
                       storage="int8")
    with StorageEngine.open(tmp_path, cfg) as eng:
        for i in range(60):
            eng.insert(f"v{i}", Vector(data[i]))
        before = [(r.id, r.distance) for r in
                  eng.search(Vector(data[7]), 5)]
        assert before[0][0] == "v7"
    with StorageEngine.open(tmp_path, cfg) as eng:
        assert len(eng) == 60
        after = [(r.id, r.distance) for r in
                 eng.search(Vector(data[7]), 5)]
    assert [i for i, _ in after] == [i for i, _ in before]
    np.testing.assert_array_equal([d for _, d in after],
                                  [d for _, d in before])
