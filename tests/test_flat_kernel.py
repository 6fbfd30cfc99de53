"""Pallas two-phase exact search vs the NumPy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vectordb_tpu.distance import DistanceMetric, pairwise_distances
from vectordb_tpu.ops.flat_kernel import two_phase_search


def run_two_phase(queries, db, metric, k, valid=None, tile_rows=128):
    n = db.shape[0]
    sq = np.einsum("ij,ij->i", db, db).astype(np.float32)
    norms = np.sqrt(sq)
    if valid is None:
        valid = np.ones(n, dtype=bool)
    dists, idx = two_phase_search(
        jnp.asarray(queries), jnp.asarray(db), jnp.asarray(sq),
        jnp.asarray(norms), jnp.asarray(valid), metric.value, k,
        tile_rows=tile_rows, interpret=True)
    return np.asarray(dists), np.asarray(idx)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_matches_oracle(metric, rng):
    n, d, q, k = 1024, 64, 4, 10
    db = rng.standard_normal((n, d)).astype(np.float32) + 1.0
    queries = rng.standard_normal((q, d)).astype(np.float32) + 1.0
    dists, idx = run_two_phase(queries, db, metric, k)
    oracle = pairwise_distances(np, queries, db, metric)
    for qi in range(q):
        np.testing.assert_allclose(dists[qi], np.sort(oracle[qi])[:k],
                                   rtol=1e-3, atol=1e-3)
        # every returned id must be a genuine top-k candidate (ties allowed)
        cutoff = np.sort(oracle[qi])[k - 1] + 1e-3
        assert all(oracle[qi][i] <= cutoff for i in idx[qi])


def test_respects_validity_mask(rng):
    n, d, q, k = 512, 32, 2, 5
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = db[:q] + 0.01
    valid = np.ones(n, dtype=bool)
    valid[0] = False  # knock out the nearest row of query 0
    dists, idx = run_two_phase(queries, db, DistanceMetric.EUCLIDEAN, k,
                               valid=valid)
    assert 0 not in idx[0]
    assert np.all(np.isfinite(dists[:, :k]))


def test_fewer_live_rows_than_k(rng):
    n, d, q = 256, 16, 1
    db = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n, dtype=bool)
    valid[:3] = True
    dists, idx = run_two_phase(db[:q], db, DistanceMetric.EUCLIDEAN, 8,
                               valid=valid, tile_rows=64)
    finite = np.isfinite(dists[0])
    assert finite.sum() == 3
    assert set(idx[0][finite]) == {0, 1, 2}


def test_exactness_adversarial_tile_packing(rng):
    """All true top-k packed into ONE tile — the filter must still keep
    every one of them (k tiles by min is provably sufficient)."""
    n, d, k = 512, 8, 10
    tile_rows = 64
    db = rng.standard_normal((n, d)).astype(np.float32) * 10 + 100
    query = np.zeros((1, d), dtype=np.float32)
    # plant the 10 closest rows inside tile 3
    base = 3 * tile_rows
    for j in range(k):
        db[base + j] = j * 0.01
    dists, idx = run_two_phase(query, db, DistanceMetric.EUCLIDEAN, k,
                               tile_rows=tile_rows)
    assert set(idx[0]) == {base + j for j in range(k)}


def test_large_k_spanning_many_tiles(rng):
    n, d, k = 1024, 16, 64
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((2, d)).astype(np.float32)
    dists, idx = run_two_phase(queries, db, DistanceMetric.EUCLIDEAN, k,
                               tile_rows=128)
    oracle = pairwise_distances(np, queries, db, DistanceMetric.EUCLIDEAN)
    for qi in range(2):
        np.testing.assert_allclose(dists[qi], np.sort(oracle[qi])[:k],
                                   rtol=1e-3, atol=1e-3)
