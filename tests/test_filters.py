"""Metadata filter algebra (parity with reference src/storage.rs:45-71 and
the filter tests in src/storage.rs:350-756), plus the exact masked-search
upgrade."""

import numpy as np
import pytest

from vectordb_tpu import (DistanceMetric, Metadata, MetadataFilter, Vector,
                          VectorStore)
from vectordb_tpu.metadata import ColumnarMetadata


def meta(**kwargs):
    return Metadata({k: str(v) for k, v in kwargs.items()})


class TestMatches:
    def test_eq(self):
        f = MetadataFilter.eq("cat", "books")
        assert f.matches(meta(cat="books"))
        assert not f.matches(meta(cat="food"))
        assert not f.matches(meta(other="x"))

    def test_ne_matches_missing_field(self):
        # None != Some(v): rows without the field match Ne (storage.rs:65)
        f = MetadataFilter.ne("cat", "books")
        assert not f.matches(meta(cat="books"))
        assert f.matches(meta(cat="food"))
        assert f.matches(meta(other="x"))
        assert f.matches(Metadata())

    def test_exists(self):
        f = MetadataFilter.exists("cat")
        assert f.matches(meta(cat="anything"))
        assert not f.matches(Metadata())

    def test_and(self):
        f = MetadataFilter.and_([
            MetadataFilter.eq("cat", "books"),
            MetadataFilter.eq("lang", "en"),
        ])
        assert f.matches(meta(cat="books", lang="en"))
        assert not f.matches(meta(cat="books", lang="fr"))

    def test_or(self):
        f = MetadataFilter.or_([
            MetadataFilter.eq("cat", "books"),
            MetadataFilter.eq("cat", "films"),
        ])
        assert f.matches(meta(cat="books"))
        assert f.matches(meta(cat="films"))
        assert not f.matches(meta(cat="food"))

    def test_empty_and_or(self):
        assert MetadataFilter.and_([]).matches(Metadata())
        assert not MetadataFilter.or_([]).matches(Metadata())


class TestWireFormat:
    def test_tagged_json_roundtrip(self):
        d = {"op": "and", "filters": [
            {"op": "eq", "field": "cat", "value": "books"},
            {"op": "or", "filters": [
                {"op": "ne", "field": "lang", "value": "fr"},
                {"op": "exists", "field": "author"},
            ]},
        ]}
        f = MetadataFilter.from_dict(d)
        assert f.to_dict() == d

    def test_bad_op(self):
        with pytest.raises(ValueError):
            MetadataFilter.from_dict({"op": "gt", "field": "x", "value": "1"})

    def test_missing_tag(self):
        with pytest.raises(ValueError):
            MetadataFilter.from_dict({"field": "x"})


class TestColumnarMasks:
    """The columnar mask compiler must agree with row-at-a-time matches."""

    @pytest.mark.parametrize("flt", [
        MetadataFilter.eq("cat", "a"),
        MetadataFilter.eq("cat", "never-seen"),
        MetadataFilter.ne("cat", "a"),
        MetadataFilter.ne("cat", "never-seen"),
        MetadataFilter.ne("ghost-field", "x"),
        MetadataFilter.exists("cat"),
        MetadataFilter.exists("ghost-field"),
        MetadataFilter.and_([MetadataFilter.eq("cat", "a"),
                             MetadataFilter.exists("num")]),
        MetadataFilter.or_([MetadataFilter.eq("cat", "b"),
                            MetadataFilter.eq("num", "1")]),
    ])
    def test_mask_equals_rowwise(self, flt, rng):
        cats = ["a", "b", "c"]
        rows = []
        col = ColumnarMetadata(64)
        for slot in range(64):
            m = Metadata()
            if slot % 4 != 0:
                m.insert("cat", cats[slot % 3])
            if slot % 5 == 0:
                m.insert("num", str(slot % 2))
            rows.append(m)
            col.set_slot(slot, m)
        mask = col.compile_mask(flt)
        expected = np.array([flt.matches(m) for m in rows])
        np.testing.assert_array_equal(mask, expected)

    def test_clear_slot(self):
        col = ColumnarMetadata(4)
        col.set_slot(0, meta(cat="a"))
        col.clear_slot(0)
        assert not col.compile_mask(MetadataFilter.exists("cat"))[0]

    def test_grow_preserves(self):
        col = ColumnarMetadata(2)
        col.set_slot(1, meta(cat="a"))
        col.grow(8)
        mask = col.compile_mask(MetadataFilter.eq("cat", "a"))
        assert mask.shape == (8,)
        assert mask[1] and not mask[0] and not mask[7]


class TestFilteredSearch:
    def test_exact_filtered_search_beats_overfetch(self, rng):
        """With a flat index, filtered search is exact: even when matches are
        rarer than 1 in 3 (defeating the reference's 3x over-fetch), all k
        matching rows come back."""
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        data = rng.standard_normal((200, 8)).astype(np.float32)
        for i in range(200):
            tag = "rare" if i >= 190 else "common"  # 5% match rate
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(tag=tag))
        q = Vector(rng.standard_normal(8).astype(np.float32))
        results = store.search_with_filter(q, 10, MetadataFilter.eq("tag", "rare"))
        assert len(results) == 10
        assert all(r.id in {f"v{i}" for i in range(190, 200)} for r in results)
        dists = [r.distance for r in results]
        assert dists == sorted(dists)

    def test_filtered_search_empty_store(self):
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        assert store.search_with_filter(Vector([1.0]), 5,
                                        MetadataFilter.exists("x")) == []

    def test_filtered_search_no_matches(self, rng):
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        store.insert_with_metadata("a", Vector([1.0]), meta(cat="x"))
        results = store.search_with_filter(
            Vector([1.0]), 5, MetadataFilter.eq("cat", "nope"))
        assert results == []

    def test_filter_respects_upsert(self, rng):
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        store.insert_with_metadata("a", Vector([1.0]), meta(cat="old"))
        store.insert_with_metadata("a", Vector([1.0]), meta(cat="new"))
        assert store.search_with_filter(
            Vector([1.0]), 5, MetadataFilter.eq("cat", "old")) == []
        got = store.search_with_filter(
            Vector([1.0]), 5, MetadataFilter.eq("cat", "new"))
        assert [r.id for r in got] == ["a"]

    def test_filter_respects_delete(self):
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        store.insert_with_metadata("a", Vector([1.0]), meta(cat="x"))
        store.insert_with_metadata("b", Vector([2.0]), meta(cat="x"))
        store.delete("a")
        got = store.search_with_filter(Vector([1.0]), 5,
                                       MetadataFilter.eq("cat", "x"))
        assert [r.id for r in got] == ["b"]

    def test_batch_filtered_search(self, rng):
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        data = rng.standard_normal((50, 4)).astype(np.float32)
        for i in range(50):
            store.insert_with_metadata(
                f"v{i}", Vector(data[i]), meta(par=i % 2))
        queries = [(Vector(data[4]), 3), (Vector(data[7]), 3)]
        flt = MetadataFilter.eq("par", "0")
        results = store.search_batch_with_filter(queries, flt)
        assert len(results) == 2
        for batch in results:
            for r in batch:
                assert int(r.id[1:]) % 2 == 0
        assert results[0][0].id == "v4"

    def test_hnsw_filtered_fallback(self, rng):
        """HNSW uses the reference's over-fetch post-filter strategy."""
        from vectordb_tpu import HnswIndex, HnswParams
        store = VectorStore.with_index(
            HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=3)))
        data = rng.standard_normal((60, 8)).astype(np.float32)
        for i in range(60):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 2))
        q = Vector(data[8])
        results = store.search_with_filter(q, 5, MetadataFilter.eq("par", "0"))
        assert results
        assert all(int(r.id[1:]) % 2 == 0 for r in results)
        assert results[0].id == "v8"
