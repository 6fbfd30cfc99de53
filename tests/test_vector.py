"""Vector semantics (parity with reference src/vector.rs:124-187 tests)."""

import math

import numpy as np
import pytest

from vectordb_tpu import DimensionMismatchError, InvalidVectorError, Vector


def test_new_and_dimension():
    v = Vector([1.0, 2.0, 3.0])
    assert v.dimension == 3
    assert v.as_list() == [1.0, 2.0, 3.0]


def test_norm():
    v = Vector([3.0, 4.0])
    assert v.norm() == pytest.approx(5.0)


def test_norm_zero():
    assert Vector([0.0, 0.0]).norm() == 0.0


def test_normalize():
    v = Vector([3.0, 4.0])
    v.normalize()
    assert v.norm() == pytest.approx(1.0)
    assert v.as_list() == pytest.approx([0.6, 0.8])


def test_normalize_zero_vector_errors():
    v = Vector([0.0, 0.0, 0.0])
    with pytest.raises(InvalidVectorError):
        v.normalize()


def test_normalized_returns_copy():
    v = Vector([3.0, 4.0])
    u = v.normalized()
    assert u.norm() == pytest.approx(1.0)
    assert v.as_list() == [3.0, 4.0]  # original untouched


def test_from_str():
    v = Vector.from_str("1.0, 2.5,3")
    assert v.as_list() == pytest.approx([1.0, 2.5, 3.0])


def test_from_str_invalid():
    with pytest.raises(InvalidVectorError):
        Vector.from_str("1.0,abc,3.0")


def test_add():
    v = Vector([1.0, 2.0]) + Vector([3.0, 4.0])
    assert v.as_list() == [4.0, 6.0]


def test_add_dimension_mismatch():
    with pytest.raises(DimensionMismatchError):
        _ = Vector([1.0, 2.0]) + Vector([1.0, 2.0, 3.0])


def test_sub():
    v = Vector([5.0, 7.0]) - Vector([2.0, 3.0])
    assert v.as_list() == [3.0, 4.0]


def test_sub_dimension_mismatch():
    with pytest.raises(DimensionMismatchError):
        _ = Vector([1.0]) - Vector([1.0, 2.0])


def test_scalar_mul():
    v = Vector([1.0, -2.0]) * 2.5
    assert v.as_list() == pytest.approx([2.5, -5.0])
    assert (2.0 * Vector([1.0, 1.0])).as_list() == [2.0, 2.0]


def test_equality():
    assert Vector([1.0, 2.0]) == Vector([1.0, 2.0])
    assert Vector([1.0, 2.0]) != Vector([1.0, 2.1])
    assert Vector([1.0]) != Vector([1.0, 0.0])


def test_float32_storage():
    v = Vector(np.array([1.0, 2.0], dtype=np.float64))
    assert v.as_array().dtype == np.float32


def test_immutability_of_view():
    v = Vector([1.0, 2.0])
    view = v.as_array()
    with pytest.raises(ValueError):
        view[0] = 99.0
