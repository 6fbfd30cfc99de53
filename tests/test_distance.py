"""Distance metric semantics (parity with reference src/distance.rs:75-144)."""

import numpy as np
import pytest

from vectordb_tpu import (DimensionMismatchError, DistanceMetric,
                          InvalidVectorError, Vector, cosine_distance,
                          dot_product, euclidean_distance)
from vectordb_tpu.distance import pairwise_distances


def test_euclidean_basic():
    a, b = Vector([0.0, 0.0]), Vector([3.0, 4.0])
    assert euclidean_distance(a, b) == pytest.approx(5.0)


def test_euclidean_identical():
    v = Vector([1.0, 2.0, 3.0])
    assert euclidean_distance(v, v) == pytest.approx(0.0)


def test_cosine_identical_direction():
    a, b = Vector([1.0, 0.0]), Vector([2.0, 0.0])
    assert cosine_distance(a, b) == pytest.approx(0.0)


def test_cosine_orthogonal():
    a, b = Vector([1.0, 0.0]), Vector([0.0, 1.0])
    assert cosine_distance(a, b) == pytest.approx(1.0)


def test_cosine_opposite():
    a, b = Vector([1.0, 0.0]), Vector([-1.0, 0.0])
    assert cosine_distance(a, b) == pytest.approx(2.0)


def test_cosine_zero_vector_errors():
    with pytest.raises(InvalidVectorError):
        cosine_distance(Vector([0.0, 0.0]), Vector([1.0, 0.0]))
    with pytest.raises(InvalidVectorError):
        cosine_distance(Vector([1.0, 0.0]), Vector([0.0, 0.0]))


def test_cosine_clamped():
    # numerically parallel vectors must never go below 0 distance
    a = Vector([0.1, 0.2, 0.3])
    b = Vector([0.2, 0.4, 0.6])
    d = cosine_distance(a, b)
    assert d >= 0.0
    assert d == pytest.approx(0.0, abs=1e-6)


def test_dot_product():
    a, b = Vector([1.0, 2.0, 3.0]), Vector([4.0, 5.0, 6.0])
    assert dot_product(a, b) == pytest.approx(32.0)


def test_metric_dispatch_dot_is_negated():
    a, b = Vector([1.0, 2.0]), Vector([3.0, 4.0])
    assert DistanceMetric.DOT_PRODUCT.distance(a, b) == pytest.approx(-11.0)


def test_metric_dimension_check():
    with pytest.raises(DimensionMismatchError):
        DistanceMetric.EUCLIDEAN.distance(Vector([1.0]), Vector([1.0, 2.0]))


def test_metric_from_name():
    assert DistanceMetric.from_name("euclidean") is DistanceMetric.EUCLIDEAN
    assert DistanceMetric.from_name("COSINE") is DistanceMetric.COSINE
    with pytest.raises(ValueError):
        DistanceMetric.from_name("manhattan")


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_pairwise_matches_scalar(metric, rng):
    """The batched matmul formulation must agree with the scalar reference
    semantics for every metric."""
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    db = rng.standard_normal((32, 16)).astype(np.float32)
    dists = pairwise_distances(np, queries, db, metric)
    for i in range(4):
        for j in range(0, 32, 7):
            expected = metric.distance(Vector(queries[i]), Vector(db[j]))
            assert dists[i, j] == pytest.approx(expected, abs=2e-3)
