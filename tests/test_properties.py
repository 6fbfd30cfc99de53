"""Property-based tests (hypothesis). The reference DECLARES proptest
(Cargo.toml:27) but ships no property tests; this suite covers the gap:
vector algebra invariants, filter-AST evaluation + wire roundtrips, WAL
append/replay with arbitrary torn tails, snapshot codec roundtrips, and a
stateful store-vs-model check.

Kept light (bounded example counts, small shapes) so the suite stays fast
on the single-core CI host.
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vectordb_tpu import DistanceMetric, VectorStore
from vectordb_tpu.distance import cosine_distance, dot_product, \
    euclidean_distance
from vectordb_tpu.errors import DimensionMismatchError
from vectordb_tpu.metadata import Metadata, MetadataFilter
from vectordb_tpu.persistence.serialization import (DatabaseSnapshot,
                                                    SerializedVector,
                                                    WalEntry,
                                                    decode_snapshot,
                                                    decode_wal_entry,
                                                    encode_snapshot,
                                                    encode_wal_entry)
from vectordb_tpu.vector import Vector

LIGHT = settings(max_examples=40, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

finite_f32 = st.floats(min_value=-1e6, max_value=1e6, width=32,
                       allow_nan=False, allow_infinity=False)
vec_data = st.lists(finite_f32, min_size=1, max_size=12)


# -- vector algebra ----------------------------------------------------------

@LIGHT
@given(vec_data)
def test_norm_matches_numpy(data):
    v = Vector(data)
    assert math.isclose(v.norm(), float(np.linalg.norm(
        np.asarray(data, np.float32))), rel_tol=1e-5, abs_tol=1e-5)


@LIGHT
@given(vec_data)
def test_normalized_has_unit_norm(data):
    v = Vector(data)
    if v.norm() == 0.0:
        with pytest.raises(Exception):
            v.normalized()
    else:
        assert math.isclose(v.normalized().norm(), 1.0, rel_tol=1e-4)


@LIGHT
@given(vec_data, vec_data)
def test_add_sub_roundtrip_or_dim_error(a, b):
    va, vb = Vector(a), Vector(b)
    if len(a) != len(b):
        with pytest.raises(DimensionMismatchError):
            va + vb
        return
    s = va + vb
    back = s - vb
    # (a+b)-b loses a's low bits when |b| >> |a| (f32 absorption), so the
    # tolerance must scale with the absorbing magnitude
    scale = float(np.max(np.abs(vb.as_array()), initial=1.0))
    np.testing.assert_allclose(back.as_array(), va.as_array(),
                               rtol=1e-4, atol=1e-3 + 4e-7 * scale)


@LIGHT
@given(vec_data, finite_f32)
def test_scalar_mul_linearity(data, c):
    v = Vector(data)
    np.testing.assert_allclose(
        (v * c).as_array(),
        np.asarray(data, np.float32) * np.float32(c), rtol=1e-5, atol=1e-2)


@LIGHT
@given(vec_data)
def test_from_str_roundtrip(data):
    v = Vector(data)
    s = ",".join(repr(float(x)) for x in v.as_list())
    np.testing.assert_array_equal(Vector.from_str(s).as_array(),
                                  v.as_array())


@LIGHT
@given(vec_data, vec_data)
def test_metric_identities(a, b):
    if len(a) != len(b):
        return
    va, vb = Vector(a), Vector(b)
    assert euclidean_distance(va, vb) == euclidean_distance(vb, va)
    assert euclidean_distance(va, va) <= 1e-3
    assert math.isclose(dot_product(va, vb), dot_product(vb, va),
                        rel_tol=1e-5, abs_tol=1e-3)
    if va.norm() > 1e-3 and vb.norm() > 1e-3:
        d = cosine_distance(va, vb)
        assert -1e-6 <= d <= 2.0 + 1e-6
        assert cosine_distance(va, va) <= 1e-3


# -- filter AST --------------------------------------------------------------

def filter_strategy():
    keys = st.sampled_from(["a", "b", "c"])
    vals = st.sampled_from(["x", "y", ""])
    leaf = st.one_of(
        st.builds(MetadataFilter.eq, keys, vals),
        st.builds(MetadataFilter.ne, keys, vals),
        st.builds(MetadataFilter.exists, keys),
    )
    return st.recursive(
        leaf,
        lambda children: st.one_of(
            st.builds(MetadataFilter.and_,
                      st.lists(children, min_size=1, max_size=3)),
            st.builds(MetadataFilter.or_,
                      st.lists(children, min_size=1, max_size=3)),
        ),
        max_leaves=8)


def eval_reference(f: MetadataFilter, fields: dict) -> bool:
    """Independent recursive evaluator for differential testing."""
    d = f.to_dict()

    def ev(node):
        op = node["op"]
        if op == "eq":
            return fields.get(node["field"]) == node["value"]
        if op == "ne":
            return fields.get(node["field"]) != node["value"]
        if op == "exists":
            return node["field"] in fields
        subs = [ev(x) for x in node["filters"]]
        return all(subs) if op == "and" else any(subs)

    return ev(d)


meta_strategy = st.dictionaries(st.sampled_from(["a", "b", "c", "d"]),
                                st.sampled_from(["x", "y", ""]), max_size=4)


@LIGHT
@given(filter_strategy(), meta_strategy)
def test_filter_matches_reference_eval(f, fields):
    assert f.matches(Metadata(fields)) == eval_reference(f, fields)


@LIGHT
@given(filter_strategy())
def test_filter_dict_roundtrip(f):
    back = MetadataFilter.from_dict(f.to_dict())
    assert back.to_dict() == f.to_dict()


# -- WAL + snapshot codecs ---------------------------------------------------

entry_strategy = st.one_of(
    st.builds(WalEntry.insert,
              st.text(max_size=8), st.integers(0, 2 ** 31 - 1),
              st.lists(finite_f32, min_size=1, max_size=6).map(
                  lambda xs: np.asarray(xs, np.float32)),
              meta_strategy),
    st.builds(WalEntry.delete, st.text(max_size=8)),
    st.just(WalEntry.checkpoint()),
)


def _entries_equal(a: WalEntry, b: WalEntry) -> bool:
    if (a.kind, a.string_id, a.internal_id, a.metadata) != \
            (b.kind, b.string_id, b.internal_id, b.metadata):
        return False
    if (a.data is None) != (b.data is None):
        return False
    return a.data is None or np.array_equal(a.data, b.data)


@LIGHT
@given(entry_strategy)
def test_wal_entry_codec_roundtrip(entry):
    assert _entries_equal(decode_wal_entry(encode_wal_entry(entry)), entry)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(st.lists(entry_strategy, max_size=6), st.integers(0, 64),
       st.binary(max_size=16))
def test_wal_replay_is_prefix_after_torn_tail(tmp_path, entries, cut,
                                              garbage):
    """Crash-tolerance property: append entries, then chop the file tail
    and/or append garbage — replay must return a clean PREFIX of what was
    appended and never raise (reference wal.rs:66-110 semantics)."""
    from vectordb_tpu.persistence.wal import WriteAheadLog

    path = tmp_path / "wal.log"
    with WriteAheadLog.open(path) as wal:
        for e in entries:
            wal.append(e)
    raw = path.read_bytes()
    mutated = raw[: max(0, len(raw) - cut)] + garbage
    path.write_bytes(mutated)
    with WriteAheadLog.open(path) as wal:
        replayed = wal.replay()
    assert len(replayed) <= len(entries)
    for got, want in zip(replayed, entries):
        assert _entries_equal(got, want)
    path.unlink()


@LIGHT
@given(st.lists(
    st.tuples(st.integers(0, 1000), st.text(max_size=6),
              st.lists(finite_f32, min_size=2, max_size=4)),
    max_size=5), st.integers(0, 100))
def test_snapshot_codec_roundtrip(rows, next_id):
    vectors = [SerializedVector(i, sid, np.asarray(xs, np.float32))
               for i, sid, xs in rows]
    snap = DatabaseSnapshot(
        vectors=vectors,
        metadata={i: {"k": sid} for i, sid, _ in rows},
        next_id=next_id,
        dimension=len(rows[0][2]) if rows else None)
    back = decode_snapshot(encode_snapshot(snap))
    assert back.next_id == snap.next_id
    assert back.dimension == snap.dimension
    assert back.metadata == snap.metadata
    assert len(back.vectors) == len(vectors)
    for got, want in zip(back.vectors, vectors):
        assert (got.internal_id, got.string_id) == (want.internal_id,
                                                    want.string_id)
        np.testing.assert_array_equal(got.data, want.data)


# -- store vs model ----------------------------------------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.sampled_from(["insert", "delete"]),
                          st.sampled_from(["a", "b", "c", "d", "e"]),
                          st.lists(finite_f32, min_size=3, max_size=3)),
                max_size=15))
def test_store_matches_model_under_upsert_delete(ops):
    """Differential test: arbitrary upsert/delete sequences against a plain
    dict model; list_ids, len and exact-match search must agree."""
    store = VectorStore.new(DistanceMetric.EUCLIDEAN)
    model = {}
    for op, key, xs in ops:
        if op == "insert":
            store.insert(key, Vector(xs))
            model[key] = np.asarray(xs, np.float32)
        else:
            if key in model:
                store.delete(key)
                del model[key]
            else:
                with pytest.raises(Exception):
                    store.delete(key)
    assert sorted(store.list_ids()) == sorted(model)
    for key, arr in model.items():
        got = np.asarray(store.get(key).as_array())
        np.testing.assert_array_equal(got, arr)


# -- radius search ------------------------------------------------------------

radius_rows = st.lists(
    st.lists(st.floats(min_value=-8.0, max_value=8.0, width=32,
                       allow_nan=False),
             min_size=3, max_size=3),
    min_size=1, max_size=24)


@LIGHT
@given(radius_rows,
       st.lists(st.floats(min_value=-8.0, max_value=8.0, width=32,
                          allow_nan=False), min_size=3, max_size=3),
       st.floats(min_value=0.0, max_value=20.0, width=32,
                 allow_nan=False),
       st.integers(min_value=1, max_value=30))
def test_radius_matches_brute_force(rows, q, radius, limit):
    """Differential: store.search_radius == numpy brute force (threshold
    + ascending sort + limit cap), for any rows/query/radius/limit."""
    store = VectorStore.new(DistanceMetric.EUCLIDEAN)
    mat = np.asarray(rows, np.float32)
    for i, r in enumerate(rows):
        store.insert(f"v{i}", Vector(r))
    qv = np.asarray(q, np.float32)
    truth = np.sqrt(np.maximum(np.sum((mat - qv) ** 2, axis=1), 0.0))
    want = sorted((float(d), f"v{i}") for i, d in enumerate(truth)
                  if d <= radius)[:limit]
    got = store.search_radius(Vector(q), radius, limit=limit)
    assert len(got) == len(want)
    got_d = [h.distance for h in got]
    assert got_d == sorted(got_d)
    for h, (wd, _) in zip(got, want):
        assert h.distance == pytest.approx(wd, abs=1e-3)
    # id sets match up to distance ties at the cut boundary
    want_ids = {wid for _, wid in want}
    for h in got:
        assert h.id in want_ids or any(
            abs(h.distance - wd) <= 1e-3 for wd, _ in want)
