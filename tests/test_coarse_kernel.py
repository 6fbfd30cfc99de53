"""Pallas coarse-kernel path (ops/coarse_kernel.py) in interpreter mode.

Runs the fused coarse scan + certified refine on the CPU test mesh with
``interpret=True`` and checks it against the NumPy oracle for all three
metrics, with dead slots, filters, and mutation-driven mirror updates.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vectordb_tpu.distance import DistanceMetric
from vectordb_tpu.ops import coarse_kernel
from vectordb_tpu.ops.topk import flat_search_batched


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")


def _oracle(queries, db, valid, metric, k):
    """Exact float64 top-k over live rows."""
    q64 = queries.astype(np.float64)
    d64 = db.astype(np.float64)
    if metric is DistanceMetric.EUCLIDEAN:
        scores = ((q64[:, None, :] - d64[None, :, :]) ** 2).sum(-1)
        dists = np.sqrt(scores)
    elif metric is DistanceMetric.DOT_PRODUCT:
        scores = -(q64 @ d64.T)
        dists = scores
    else:
        qn = np.linalg.norm(q64, axis=1, keepdims=True)
        dn = np.linalg.norm(d64, axis=1)
        sim = (q64 @ d64.T) / (qn * dn[None, :])
        scores = -sim
        dists = 1.0 - np.clip(sim, -1.0, 1.0)
    scores = np.where(valid[None, :], scores, np.inf)
    dists = np.where(valid[None, :], dists, np.inf)
    order = np.argsort(scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(dists, order, axis=1), order


def _state(rng, n, d, dead_frac=0.0):
    db = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    if dead_frac:
        dead = rng.choice(n, int(n * dead_frac), replace=False)
        valid[dead] = False
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    dbj = jnp.asarray(db)
    hi, lo = coarse_kernel.split_hi_lo(dbj)
    state = {"db": dbj, "sq_norms": jnp.asarray(sq),
             "norms": jnp.asarray(np.sqrt(sq)),
             "valid": jnp.asarray(valid), "hi": hi, "lo": lo}
    return db, valid, state


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_certified_exact_matches_oracle(rng, metric):
    n, d, q, k = 1024, 32, 8, 5
    db, valid, state = _state(rng, n, d, dead_frac=0.1)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state, metric, k, mode="exact")
    want_d, want_i = _oracle(queries, db, valid, metric, k)
    assert np.array_equal(idx[:, :k], want_i), (idx, want_i)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_fast_mode_distances_are_exact_for_returned_ids(rng, metric):
    n, d, q, k = 1024, 32, 4, 10
    db, valid, state = _state(rng, n, d)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state, metric, k, mode="fast")
    want_d, want_i = _oracle(queries, db, valid, metric, k)
    # overlap should be near-total on well-separated data
    overlap = np.mean([len(set(a[:k]) & set(b)) / k
                       for a, b in zip(idx, want_i)])
    assert overlap >= 0.9, overlap
    # distances of the returned ids must be the exact f32 values
    for qi in range(q):
        for j in range(k):
            slot = int(idx[qi, j])
            ref = _oracle(queries[qi:qi + 1], db[slot:slot + 1],
                          np.ones(1, bool), metric, 1)[0][0, 0]
            assert abs(float(dists[qi, j]) - ref) < 5e-4


def test_certified_search_respects_filters(rng):
    n, d, q, k = 1024, 16, 4, 3
    db, valid, state = _state(rng, n, d)
    mask = np.zeros(n, dtype=bool)
    mask[:64] = True  # only the first 64 slots pass the "filter"
    state = dict(state)
    state["valid"] = jnp.logical_and(state["valid"], jnp.asarray(mask))
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state, DistanceMetric.EUCLIDEAN,
                                     k, mode="exact")
    assert (idx[:, :k] < 64).all()
    want_d, want_i = _oracle(queries, db, valid & mask,
                             DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)


def test_fewer_live_rows_than_k(rng):
    n, d, k = 1024, 8, 8
    db, valid, state = _state(rng, n, d)
    mask = np.zeros(n, dtype=bool)
    mask[[3, 700, 1001]] = True
    state = dict(state)
    state["valid"] = jnp.asarray(mask)
    queries = rng.standard_normal((2, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state, DistanceMetric.EUCLIDEAN,
                                     k, mode="exact")
    finite = np.isfinite(dists[0])
    assert finite.sum() == 3
    assert set(idx[0][finite].tolist()) == {3, 700, 1001}


def test_flat_index_maintains_mirrors_across_mutation(rng):
    from vectordb_tpu.index.flat import FlatIndex
    from vectordb_tpu.vector import Vector

    d, k = 16, 5
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, search_mode="exact")
    data = rng.standard_normal((200, d)).astype(np.float32)
    idx.add_batch([(i, data[i]) for i in range(200)])
    q = data[17] + 0.001
    res = idx.search(Vector(q), k)
    assert res[0][0] == 17
    dev = idx._sync_device()
    assert "hi" in dev and "lo" in dev
    # mutate: delete the best hit and upsert a new exact-match row
    idx.remove(17)
    new = rng.standard_normal(d).astype(np.float32)
    idx.add(500, new)
    res2 = idx.search(Vector(new), k)
    assert res2[0][0] == 500
    assert all(i != 17 for i, _ in idx.search(Vector(q), k))
    # mirrors must reflect the scatter updates (not just the f32 db)
    dev = idx._sync_device()
    slot = idx.slot_of(500)
    hi_row = np.asarray(dev["hi"][slot], dtype=np.float32)
    lo_row = np.asarray(dev["lo"][slot], dtype=np.float32)
    np.testing.assert_allclose(hi_row + lo_row, new, atol=3e-3)


def test_supports_gating():
    assert coarse_kernel.supports(1024, 64, 16)
    assert not coarse_kernel.supports(1000, 64, 16)   # not tile-divisible
    assert coarse_kernel.supports(1024, 64, 64)       # large k: chunked refine
    assert not coarse_kernel.supports(1024, 64, 512)  # k too large
    assert coarse_kernel.supports(4096, 768, 32)
    assert coarse_kernel.supports(4096, 768, 256)


def test_xla_fallback_when_k_too_large(rng):
    n, d, q, k = 1024, 8, 2, 512  # k_eff 512 > MAX_K -> XLA path
    db, valid, state = _state(rng, n, d)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state, DistanceMetric.EUCLIDEAN,
                                     k, mode="exact")
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)


def test_large_k_through_coarse_path(rng):
    """k in (MAX_K_old, MAX_K]: the certified path serves it with a
    chunked refine pool instead of dropping to the slow XLA scan
    (VERDICT round-1 item 9)."""
    n, d, q, k = 2048, 128, 16, 100
    db, valid, state = _state(rng, n, d)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state, DistanceMetric.EUCLIDEAN,
                                     k, mode="exact")
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-5)


def test_uncertified_queries_fall_back_and_stay_exact(rng, monkeypatch):
    """Exact ties across more tiles than the refine pool make the margin
    check fail; those queries must be spliced through the XLA scan."""
    from vectordb_tpu.ops import topk as topk_mod

    n, d, k = 1024, 16, 5
    base = rng.standard_normal(d).astype(np.float32)
    db = rng.standard_normal((n, d)).astype(np.float32) * 10.0
    # one identical row in each of 40 different tiles -> the k-th distance
    # exactly equals the selection boundary -> cert fails
    tie_slots = (np.arange(40) * coarse_kernel.SUB + 3).astype(int)
    db[tie_slots] = base
    valid = np.ones(n, dtype=bool)
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    dbj = jnp.asarray(db)
    hi, lo = coarse_kernel.split_hi_lo(dbj)
    state = {"db": dbj, "sq_norms": jnp.asarray(sq),
             "norms": jnp.asarray(np.sqrt(sq)),
             "valid": jnp.asarray(valid), "hi": hi, "lo": lo}

    calls = []
    real = topk_mod.flat_search_exact_tiled

    def spy(*args, **kwargs):
        calls.append(args[0].shape)
        return real(*args, **kwargs)

    monkeypatch.setattr(topk_mod, "flat_search_exact_tiled", spy)
    queries = (base + 0.001 * rng.standard_normal((3, d))).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(
        queries, state, DistanceMetric.EUCLIDEAN, k, mode="exact")
    assert calls, "expected the XLA fallback to engage on tie-heavy data"
    # all k results must be tie rows at the true (equal) distance. The
    # loose atol is the |q|^2+|x|^2-2qx cancellation at near-zero
    # distances, inherent to the matmul formulation (both paths share it).
    want_d, _ = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-3)
    for qi in range(3):
        assert set(idx[qi, :k].tolist()) <= set(tie_slots.tolist())


def _state_f32(rng, n, d, dead_frac=0.0):
    """Device state using the f32-source coarse path (no mirrors)."""
    db, valid, state = _state(rng, n, d, dead_frac)
    state = {k: v for k, v in state.items() if k not in ("hi", "lo")}
    state["coarse_f32"] = True
    return db, valid, state


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_f32_source_certified_exact_matches_oracle(rng, metric):
    n, d, q, k = 1024, 32, 8, 5
    db, valid, state = _state_f32(rng, n, d, dead_frac=0.1)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state, metric, k, mode="exact")
    want_d, want_i = _oracle(queries, db, valid, metric, k)
    assert np.array_equal(idx[:, :k], want_i)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-5)


def test_f32_source_fast_mode(rng):
    n, d, q, k = 1024, 32, 4, 10
    db, valid, state = _state_f32(rng, n, d)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = flat_search_batched(queries, state,
                                     DistanceMetric.EUCLIDEAN, k,
                                     mode="fast")
    _, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    overlap = np.mean([len(set(a[:k]) & set(b)) / k
                       for a, b in zip(idx, want_i)])
    assert overlap >= 0.9, overlap


def test_flat_index_uses_f32_source_above_memory_gate(rng, monkeypatch):
    from vectordb_tpu.index import flat as flat_mod
    from vectordb_tpu.index.flat import FlatIndex
    from vectordb_tpu.vector import Vector

    monkeypatch.setattr(flat_mod, "_PALLAS_MEM_LIMIT", 1)  # mirrors never fit
    d, k = 16, 3
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, search_mode="exact")
    data = rng.standard_normal((100, d)).astype(np.float32)
    idx.add_batch([(i, data[i]) for i in range(100)])
    res = idx.search(Vector(data[42] + 0.0005), k)
    assert res[0][0] == 42
    dev = idx._sync_device()
    assert "hi" not in dev and dev.get("coarse_f32") is True


def test_fast_mode_routes_through_1p_fast(rng, monkeypatch):
    """Dispatch regression: at a supports_1p capacity, fast mode must use
    the fused-minima hierarchical pipeline (coarse_search_1p_fast), not
    the legacy full-transpose + approx_min_k path."""
    n, d, q, k = 1024, 32, 4, 10
    db, valid, state = _state(rng, n, d)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    calls = []
    real = coarse_kernel.coarse_search_1p_fast

    def spy(*args, **kwargs):
        calls.append(True)
        return real(*args, **kwargs)

    monkeypatch.setattr(coarse_kernel, "coarse_search_1p_fast", spy)
    dists, idx = flat_search_batched(queries, state,
                                     DistanceMetric.EUCLIDEAN, k,
                                     mode="fast")
    assert calls, "fast mode did not engage the 1p fast pipeline"
    want_d, want_i = _oracle(queries, db, valid,
                             DistanceMetric.EUCLIDEAN, k)
    overlap = np.mean([len(set(a[:k]) & set(b)) / k
                       for a, b in zip(idx, want_i)])
    assert overlap >= 0.9, overlap
