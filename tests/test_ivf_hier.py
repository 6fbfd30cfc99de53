"""Two-level (hierarchical) IVF assignment (ops/ivf.assign_preferences_hier).

The hierarchy must produce preference lists that are near-exact (the
true nearest centroid is almost always inside the super neighborhood)
and compose with the full training/search pipeline without recall loss
relative to flat assignment.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectordb_tpu import DistanceMetric
from vectordb_tpu.index.ivf import IvfFlatIndex
from vectordb_tpu.ops.ivf import (assign_preferences,
                                  assign_preferences_hier, kmeans_fit)


def _fixture(n=6000, d=32, nlist=128, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((64, d)).astype(np.float32)
    data = (centers[rng.integers(0, 64, n)]
            + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    db = jnp.asarray(data)
    key = jax.random.PRNGKey(seed)
    cents = kmeans_fit(db, key, nlist, 8)
    return data, db, cents


def test_hier_matches_flat_top1():
    data, db, cents = _fixture()
    flat = assign_preferences(db, cents, 8, 4096)
    hier = assign_preferences_hier(db, cents, 8, 4096,
                                   jax.random.PRNGKey(7),
                                   n_super=16, s_top=6)
    agree = float(np.mean(flat[:, 0] == hier[:, 0]))
    assert agree >= 0.95, agree
    # preference lists contain no duplicate clusters
    for row in hier[:: len(hier) // 50]:
        assert np.unique(row).size == row.size


def test_hier_small_nlist_falls_back():
    data, db, cents = _fixture(nlist=16)
    out = assign_preferences_hier(db, cents, 4, 4096,
                                  jax.random.PRNGKey(7), n_super=16)
    ref = assign_preferences(db, cents, 4, 4096)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("mode", ["flat", "hier"])
def test_train_recall_by_mode(mode):
    rng = np.random.default_rng(3)
    n, d, k = 8000, 48, 10
    centers = rng.standard_normal((32, d)).astype(np.float32)
    data = (centers[rng.integers(0, 32, n)]
            + 0.25 * rng.standard_normal((n, d)).astype(np.float32))
    # assign_mode="hier" forces the two-level path even at small nlist
    # (n_super auto-scales to nlist//16)
    idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=64, nprobe=8,
                       assign_mode=mode, seed=1)
    idx.add_batch(list(enumerate(data)))
    idx.train()
    assert idx.is_trained
    queries = (centers[rng.integers(0, 32, 30)]
               + 0.25 * rng.standard_normal((30, d)).astype(np.float32))
    from vectordb_tpu.index import FlatIndex
    oracle = FlatIndex(DistanceMetric.EUCLIDEAN)
    oracle.add_batch(list(enumerate(data)))
    truth = oracle.search_batch(queries, k)
    got = idx.search_batch(queries, k)
    rec = np.mean([
        len({i for i, _ in got[q]} & {i for i, _ in truth[q]}) / k
        for q in range(len(queries))])
    assert rec >= 0.95, (mode, rec)
    # probed distances are exact: compare against oracle values
    for q in range(3):
        od = {i: dv for i, dv in truth[q]}
        for i, dv in got[q]:
            if i in od:
                assert abs(od[i] - dv) < 1e-3


def test_invalid_assign_mode():
    with pytest.raises(ValueError):
        IvfFlatIndex(DistanceMetric.EUCLIDEAN, assign_mode="bogus")


def test_hier_empty_neighborhood_falls_back_flat(monkeypatch):
    """Rows can route to a super whose whole s_top neighborhood captured
    zero fine centroids (k-means dead clusters). Those rows must get
    flat-scored preferences instead of crashing on the empty id list."""
    import vectordb_tpu.ops.ivf as ivf_mod
    d, nlist = 8, 64
    rng = np.random.default_rng(5)
    # all fine centroids live far from the origin …
    cents = jnp.asarray(
        10.0 + 0.1 * rng.standard_normal((nlist, d)).astype(np.float32))
    # … while db rows sit at the origin, nearest to the empty super
    db = jnp.asarray(0.1 * rng.standard_normal((256, d)).astype(np.float32))

    def fake_kmeans_fit(points, key, k, iters):
        # super 0 at the origin captures no centroids; supers 1..k-1
        # split the real centroid cloud
        sup = np.asarray(points[: k]).copy()
        sup[0] = 0.0
        return jnp.asarray(sup)

    monkeypatch.setattr(ivf_mod, "kmeans_fit", fake_kmeans_fit)
    out = ivf_mod.assign_preferences_hier(
        db, cents, 4, 4096, jax.random.PRNGKey(1), n_super=16, s_top=1)
    ref = np.asarray(ivf_mod.assign_preferences(db, cents, 4, 4096))
    # flat fallback scoring is exact for the rerouted rows
    np.testing.assert_array_equal(out, ref)
