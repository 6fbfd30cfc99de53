"""Distance metrics: scalar (host) API and batched (device) formulations.

Capability parity with reference src/distance.rs:9-73:
  * ``DistanceMetric.{EUCLIDEAN, COSINE, DOT_PRODUCT}``
  * ``distance(v1, v2)`` with an up-front dimension check
  * cosine distance = 1 - similarity, similarity clamped to [-1, 1],
    zero vectors are an error
  * dot-product distance = -dot (so that "smaller is better" holds for
    every metric)

The TPU-first additions are the *batched* formulations used by the flat-scan
kernels: distances of Q queries against N database rows are expressed as a
(Q, d) x (d, N) matmul plus row-norm corrections so the MXU does all the
FLOPs (see ops/topk.py).
"""

from __future__ import annotations

import enum
from typing import Optional

import numpy as np

from .errors import DimensionMismatchError, InvalidVectorError
from .vector import Vector, as_f32_array


class DistanceMetric(enum.Enum):
    """Supported distance metrics (reference: src/distance.rs:9-16)."""

    EUCLIDEAN = "euclidean"
    COSINE = "cosine"
    DOT_PRODUCT = "dot_product"

    # -- scalar host path (exact reference semantics) ----------------------

    def distance(self, v1: Vector, v2: Vector) -> float:
        """Distance between two vectors; smaller is always better
        (reference: src/distance.rs:20-33)."""
        if not v1.has_same_dimension(v2):
            raise DimensionMismatchError(v1.dimension, v2.dimension)
        if self is DistanceMetric.EUCLIDEAN:
            return euclidean_distance(v1, v2)
        if self is DistanceMetric.COSINE:
            return cosine_distance(v1, v2)
        return -dot_product(v1, v2)

    @classmethod
    def from_name(cls, name: str) -> "DistanceMetric":
        try:
            return cls(name.lower())
        except ValueError:
            raise ValueError(f"Unknown distance metric: {name}") from None


def euclidean_distance(v1: Vector, v2: Vector) -> float:
    """L2 distance (reference: src/distance.rs:37-44)."""
    a = as_f32_array(v1)
    b = as_f32_array(v2)
    diff = a - b
    return float(np.sqrt(np.float32(np.dot(diff, diff))))


def cosine_distance(v1: Vector, v2: Vector) -> float:
    """1 - cosine similarity, clamped; zero vectors error
    (reference: src/distance.rs:47-64)."""
    a = as_f32_array(v1)
    b = as_f32_array(v2)
    norm1 = float(np.sqrt(np.float32(np.dot(a, a))))
    norm2 = float(np.sqrt(np.float32(np.dot(b, b))))
    if norm1 == 0.0 or norm2 == 0.0:
        raise InvalidVectorError("Cannot compute cosine distance with zero vector")
    sim = float(np.dot(a, b)) / (norm1 * norm2)
    sim = max(-1.0, min(1.0, sim))
    return 1.0 - sim


def dot_product(v1: Vector, v2: Vector) -> float:
    """Plain dot product (reference: src/distance.rs:67-73)."""
    a = as_f32_array(v1)
    b = as_f32_array(v2)
    return float(np.float32(np.dot(a, b)))


# -- batched device formulations ------------------------------------------
#
# These run under jit on arrays already resident on the device. They are
# written against the jax.numpy namespace but accept numpy too, so the same
# code backs the NumPy oracle used in tests.


def pairwise_distances(xp, queries, db, metric: DistanceMetric,
                       db_sq_norms=None, db_norms=None,
                       query_norms=None, precision=None):
    """Distances of shape (Q, N) between ``queries`` (Q, d) and ``db`` (N, d).

    All metrics are expressed around one (Q, d) @ (d, N) matmul so the MXU
    carries the FLOPs:
      * euclidean: sqrt(relu(|q|^2 + |x|^2 - 2 q.x))
      * cosine:    1 - clip(q.x / (|q| |x|), -1, 1)
      * dot:       -q.x

    ``xp`` is the array namespace (jax.numpy on device, numpy for the oracle).
    Precomputed ``db_sq_norms`` (N,) / ``db_norms`` (N,) avoid re-reducing the
    database every call. Zero-norm handling for cosine is done by callers
    (host-side validation), matching reference error semantics.
    """
    if precision is not None and xp is not np:
        # full-f32 MXU passes: XLA's default precision is bf16-grade, which
        # breaks the |q|^2+|x|^2-2qx cancellation at ~1e-3 relative error
        dots = xp.matmul(queries, db.T, precision=precision)
    else:
        dots = xp.matmul(queries, db.T)  # (Q, N) — the MXU matmul
    if metric is DistanceMetric.DOT_PRODUCT:
        return -dots
    if metric is DistanceMetric.EUCLIDEAN:
        if db_sq_norms is None:
            db_sq_norms = xp.sum(db * db, axis=1)
        q_sq = xp.sum(queries * queries, axis=1, keepdims=True)  # (Q, 1)
        sq = q_sq + db_sq_norms[None, :] - 2.0 * dots
        return xp.sqrt(xp.maximum(sq, 0.0))
    # cosine
    if db_norms is None:
        if db_sq_norms is None:
            db_sq_norms = xp.sum(db * db, axis=1)
        db_norms = xp.sqrt(db_sq_norms)
    if query_norms is None:
        query_norms = xp.sqrt(xp.sum(queries * queries, axis=1, keepdims=True))
    else:
        query_norms = query_norms.reshape(-1, 1)
    denom = query_norms * db_norms[None, :]
    # avoid 0/0 — callers guarantee no zero vectors reach this path for cosine
    sim = dots / xp.where(denom == 0.0, 1.0, denom)
    sim = xp.clip(sim, -1.0, 1.0)
    return 1.0 - sim


def validate_cosine_operands(metric: DistanceMetric, query_norm: float,
                             num_zero_norm_rows: int) -> None:
    """Reference parity: any zero vector participating in a cosine search is
    an error (reference: src/distance.rs:51-55 propagated through
    src/flat_index.rs:52-65)."""
    if metric is not DistanceMetric.COSINE:
        return
    if query_norm == 0.0 or num_zero_norm_rows > 0:
        raise InvalidVectorError("Cannot compute cosine distance with zero vector")


__all__ = [
    "DistanceMetric",
    "euclidean_distance",
    "cosine_distance",
    "dot_product",
    "pairwise_distances",
    "validate_cosine_operands",
]
