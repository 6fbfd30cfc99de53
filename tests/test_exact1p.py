"""1-pass certified exact tier (ops/coarse_kernel.coarse_search_1p).

Runs in Pallas interpreter mode on CPU with the capacity gate lowered so
the dispatcher routes through tier 1 (1-pass certified) -> tier 2 (bf16x3
certified) -> tier 3 (XLA scan). Exactness must hold unconditionally no
matter which tier serves a query.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectordb_tpu.distance import DistanceMetric
from vectordb_tpu.ops import coarse_kernel
from vectordb_tpu.ops import topk as topk_mod

from test_coarse_kernel import _oracle, _state, _state_f32


@pytest.fixture(autouse=True)
def _enable_1p(monkeypatch):
    monkeypatch.setenv("VDB_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(topk_mod, "_EXACT1P_MIN_N", 512)


def _with_elo(state):
    state = dict(state)
    if "hi" in state:
        state["elo_max"] = coarse_kernel.residual_max_norm(
            state["db"], state["hi"])
    else:
        state["elo_max"] = coarse_kernel.residual_max_norm_f32(state["db"])
    return state


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_exact1p_matches_oracle(rng, metric):
    n, d, q, k = 1024, 32, 8, 5
    db, valid, state = _state(rng, n, d, dead_frac=0.1)
    state = _with_elo(state)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state, metric, k,
                                              mode="exact")
    want_d, want_i = _oracle(queries, db, valid, metric, k)
    assert np.array_equal(idx[:, :k], want_i), (idx, want_i)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-5)


def test_tier1_engages(rng, monkeypatch):
    n, d, q, k = 1024, 32, 4, 5
    db, valid, state = _state(rng, n, d)
    state = _with_elo(state)
    calls = []
    real = coarse_kernel.coarse_search_1p

    def spy(*args, **kwargs):
        calls.append(True)
        return real(*args, **kwargs)

    # topk.py resolves coarse_kernel lazily via `from . import`, so patching
    # the module attribute intercepts the dispatcher's call
    monkeypatch.setattr(coarse_kernel, "coarse_search_1p", spy)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state,
                                              DistanceMetric.EUCLIDEAN, k,
                                              mode="exact")
    assert calls, "tier 1 (1-pass certified) should have engaged"
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)


def test_huge_elo_forces_fallback_and_stays_exact(rng):
    """An absurd residual bound makes every query uncertified; the tiered
    fallback (bf16x3, then XLA if needed) must still return exact results."""
    n, d, q, k = 1024, 16, 6, 4
    db, valid, state = _state(rng, n, d)
    state = dict(state)
    state["elo_max"] = jnp.float32(1e9)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state,
                                              DistanceMetric.EUCLIDEAN, k,
                                              mode="exact")
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_exact1p_f32_source(rng, metric):
    n, d, q, k = 1024, 32, 8, 5
    db, valid, state = _state_f32(rng, n, d, dead_frac=0.1)
    state = _with_elo(state)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state, metric, k,
                                              mode="exact")
    want_d, want_i = _oracle(queries, db, valid, metric, k)
    assert np.array_equal(idx[:, :k], want_i)


def test_exact1p_fewer_live_rows_than_k(rng):
    """< k live rows: results exhaust the live set; the degenerate-cert
    reasoning (boundary must be dead) must not mark stranded live rows as
    covered."""
    n, d, k = 1024, 8, 8
    db, valid, state = _state(rng, n, d)
    state = _with_elo(state)
    mask = np.zeros(n, dtype=bool)
    mask[[3, 700, 1001]] = True
    state["valid"] = jnp.asarray(mask)
    queries = rng.standard_normal((2, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state,
                                              DistanceMetric.EUCLIDEAN, k,
                                              mode="exact")
    finite = np.isfinite(dists[0])
    assert finite.sum() == 3
    assert set(idx[0][finite].tolist()) == {3, 700, 1001}


def test_exact1p_filters(rng):
    n, d, q, k = 1024, 16, 4, 3
    db, valid, state = _state(rng, n, d)
    state = _with_elo(state)
    mask = np.zeros(n, dtype=bool)
    mask[:64] = True
    state["valid"] = jnp.logical_and(state["valid"], jnp.asarray(mask))
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state,
                                              DistanceMetric.EUCLIDEAN, k,
                                              mode="exact")
    assert (idx[:, :k] < 64).all()
    want_d, want_i = _oracle(queries, db, valid & mask,
                             DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)


def test_supports_1p_gating():
    assert coarse_kernel.supports_1p(1024, 64, 16)
    assert not coarse_kernel.supports_1p(1000, 64, 16)
    assert not coarse_kernel.supports_1p(256, 64, 5)   # < 2 super-tiles
    assert coarse_kernel.supports_1p(1 << 20, 768, 10)


def test_flat_index_maintains_elo_max(rng, monkeypatch):
    from vectordb_tpu.index.flat import FlatIndex
    from vectordb_tpu.vector import Vector

    d = 16
    idx = FlatIndex(DistanceMetric.EUCLIDEAN, search_mode="exact")
    data = rng.standard_normal((200, d)).astype(np.float32)
    idx.add_batch([(i, data[i]) for i in range(200)])
    dev = idx._sync_device()
    assert "elo_max" in dev
    elo0 = float(dev["elo_max"])
    assert 0.0 < elo0 < 2.0 ** -7 * float(np.linalg.norm(data, axis=1).max())
    # scatter a much larger row: the bound must not shrink and must cover it
    big = (rng.standard_normal(d) * 1e4).astype(np.float32)
    idx.add(900, big)
    dev = idx._sync_device()
    resid = big - np.float32(np.asarray(
        jnp.asarray(big).astype(jnp.bfloat16).astype(jnp.float32)))
    assert float(dev["elo_max"]) >= np.linalg.norm(resid) * 0.99
    assert float(dev["elo_max"]) >= elo0


def test_chunked_refine_non_divisible_q(rng, monkeypatch):
    """Review regression: a non-pow2 Q with refine chunking must not crash
    on the lax.map reshape (the sharded path doesn't pow2-pad)."""
    monkeypatch.setattr(coarse_kernel, "_REFINE_BYTES", 1)
    n, d, q, k = 1024, 16, 301, 5   # 301 -> chunk 150, 301 % 150 != 0
    db, valid, state = _state(rng, n, d)
    state = _with_elo(state)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    m2, m = coarse_kernel._exact1p_pool(k, n // coarse_kernel.SUB)
    dists, idx, cert = coarse_kernel._coarse_search_1p_jit(
        jnp.asarray(queries), state["db"], state["sq_norms"],
        state["norms"], state["valid"], state["hi"], state["elo_max"],
        "euclidean", k, m2, m, True, "mirrors")
    dists, idx, cert = jax.device_get((dists, idx, cert))
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(np.asarray(idx)[cert], want_i[cert])


def test_extreme_magnitudes_refuse_certificate(rng):
    """Review regression: live scores near PENALTY (norms ~1e15) must not
    certify — the additive dead-penalty masking is unsound there. The
    tiered fallback (inf-masked XLA scan) serves those queries exactly."""
    n, d, q, k = 1024, 16, 4, 3
    db = (rng.standard_normal((n, d)) * 1e15).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    sq = np.einsum("ij,ij->i", db.astype(np.float64),
                   db.astype(np.float64)).astype(np.float32)
    dbj = jnp.asarray(db)
    hi, lo = coarse_kernel.split_hi_lo(dbj)
    state = {"db": dbj, "sq_norms": jnp.asarray(sq),
             "norms": jnp.asarray(np.sqrt(sq)),
             "valid": jnp.asarray(valid), "hi": hi, "lo": lo}
    state = _with_elo(state)
    queries = (rng.standard_normal((q, d)) * 1e15).astype(np.float32)
    m2, m = coarse_kernel._exact1p_pool(k, n // coarse_kernel.SUB)
    _, _, cert = jax.device_get(coarse_kernel._coarse_search_1p_jit(
        jnp.asarray(queries), state["db"], state["sq_norms"],
        state["norms"], state["valid"], state["hi"], state["elo_max"],
        "euclidean", k, m2, m, True, "mirrors"))
    assert not np.asarray(cert).any()
    # end-to-end: dispatcher must still return exact results via fallback
    dists, idx = topk_mod.flat_search_batched(queries, state,
                                              DistanceMetric.EUCLIDEAN, k,
                                              mode="exact")
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)


def test_bf16_exact_data_margin_is_rigorous(rng):
    """Review regression: with elo_max = 0 and integer queries (qlo = 0)
    the margin must still cover the f32 accumulation error."""
    n, d, q, k = 1024, 32, 8, 5
    db = rng.integers(-8, 9, size=(n, d)).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    dbj = jnp.asarray(db)
    hi, lo = coarse_kernel.split_hi_lo(dbj)
    state = _with_elo({"db": dbj, "sq_norms": jnp.asarray(sq),
                       "norms": jnp.asarray(np.sqrt(sq)),
                       "valid": jnp.asarray(valid), "hi": hi, "lo": lo})
    assert float(np.asarray(state["elo_max"])) == 0.0
    queries = rng.integers(-8, 9, size=(q, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state,
                                              DistanceMetric.EUCLIDEAN, k,
                                              mode="exact")
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)


def test_exact1p_three_level_selection(rng):
    """Capacity large enough that the 3rd selection level (super-supers of
    SUPER2 supers) actually EXCLUDES super-supers: t3 = t2/SUPER2 must
    exceed m3. Results must stay bit-exact vs the oracle and certify on
    gaussian data (the ss_boundary term never tightens the certificate in
    the generic case)."""
    n, d, q, k = 1 << 18, 32, 4, 5
    t2 = n // coarse_kernel.SUB // coarse_kernel.SUPER
    m2, m = coarse_kernel._exact1p_pool(k, n // coarse_kernel.SUB)
    t3 = t2 // coarse_kernel.SUPER2
    assert t2 % coarse_kernel.SUPER2 == 0 and t3 > min(m2, t3), \
        "shape no longer exercises super-super exclusion — update the test"
    db, valid, state = _state(rng, n, d, dead_frac=0.05)
    state = _with_elo(state)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx, cert = jax.device_get(coarse_kernel.coarse_search_1p(
        jnp.asarray(queries), state["db"], state["sq_norms"],
        state["norms"], state["valid"], state["hi"], state["elo_max"],
        DistanceMetric.EUCLIDEAN, k))
    assert np.asarray(cert).all(), "gaussian data should fully certify"
    want_d, want_i = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    assert np.array_equal(idx[:, :k], want_i)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-5)


def test_exact1p_three_level_tie_soundness(rng):
    """Massive ties across super-super boundaries (every row duplicated
    many times): tie-breaking in the level-3 top_k may exclude a tied
    container, so certification must either fail (fallback keeps results
    exact) or hold with exact distances. Distances are compared (ids are
    ambiguous under ties)."""
    n, d, q, k = 1 << 18, 32, 4, 5
    uniq = rng.standard_normal((256, d)).astype(np.float32)
    db = np.tile(uniq, (n // 256, 1))
    valid = np.ones(n, dtype=bool)
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    dbj = jnp.asarray(db)
    hi, lo = coarse_kernel.split_hi_lo(dbj)
    state = _with_elo({"db": dbj, "sq_norms": jnp.asarray(sq),
                       "norms": jnp.asarray(np.sqrt(sq)),
                       "valid": jnp.asarray(valid), "hi": hi, "lo": lo})
    queries = rng.standard_normal((q, d)).astype(np.float32)
    dists, idx = topk_mod.flat_search_batched(queries, state,
                                              DistanceMetric.EUCLIDEAN, k,
                                              mode="exact")
    want_d, _ = _oracle(queries, db, valid, DistanceMetric.EUCLIDEAN, k)
    np.testing.assert_allclose(dists[:, :k], want_d, rtol=2e-5, atol=2e-5)
    # every returned id must actually be at the claimed distance
    got_rows = db[np.asarray(idx[:, :k])]
    true_d = np.sqrt(((queries[:, None, :].astype(np.float64)
                       - got_rows.astype(np.float64)) ** 2).sum(-1))
    np.testing.assert_allclose(dists[:, :k], true_d, rtol=2e-5, atol=2e-5)
