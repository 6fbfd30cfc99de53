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


class TestExactFilteredHnswIvf:
    """VERDICT round-1 item 7: exact filtered search on every hot path —
    masked HNSW traversal (both backends + device), masked IVF probed
    refine — retiring the 3x over-fetch (storage.rs:268-287) from them."""

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_hnsw_masked_traversal_exact(self, rng, backend):
        from vectordb_tpu import HnswIndex, HnswParams
        idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=3),
                        backend=backend)
        store = VectorStore.with_index(idx)
        data = rng.standard_normal((300, 8)).astype(np.float32)
        for i in range(300):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 3))
        flt = MetadataFilter.eq("par", "0")
        # oracle: exact filtered top-k by brute force
        q = data[9]
        elig = [i for i in range(300) if i % 3 == 0]
        d2 = np.sum((data[elig] - q) ** 2, axis=1)
        want = [f"v{elig[j]}" for j in np.argsort(d2)[:5]]
        got = store.search_with_filter(Vector(q), 5, flt)
        assert [r.id for r in got] == want
        # the masked path served (not the over-fetch): over-fetch with
        # k*3 = 15 could never see 5 eligible under a worst-case ordering,
        # but here we check the index-level hook directly
        mask = np.zeros(idx.capacity, dtype=bool)
        for i in elig:
            s = idx.slot_of(i if False else store._id_to_internal[f"v{i}"])
            if s is not None:
                mask[s] = True
        res = idx.search_masked(Vector(q), 5, mask)
        assert res is not None and len(res) == 5

    def test_hnsw_masked_selective_filter(self, rng):
        """A filter so selective that 3x over-fetch would miss most
        results: 5 eligible rows among 400 — the masked traversal must
        find them all."""
        from vectordb_tpu import HnswIndex, HnswParams
        store = VectorStore.with_index(
            HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=7)))
        data = rng.standard_normal((400, 8)).astype(np.float32)
        rare = {17, 123, 210, 333, 390}
        for i in range(400):
            store.insert_with_metadata(
                f"v{i}", Vector(data[i]),
                meta(tag="rare" if i in rare else "common"))
        q = data[17] + np.float32(0.01)
        got = store.search_with_filter(Vector(q), 5,
                                       MetadataFilter.eq("tag", "rare"))
        assert {r.id for r in got} == {f"v{i}" for i in rare}

    def test_device_traversal_mask(self, rng):
        from vectordb_tpu import HnswIndex, HnswParams
        idx = HnswIndex(DistanceMetric.EUCLIDEAN, HnswParams(seed=5))
        data = rng.standard_normal((200, 16)).astype(np.float32)
        idx.build_batch([(i, Vector(data[i])) for i in range(200)])
        mask = np.zeros(idx.capacity, dtype=bool)
        elig_slots = []
        for i in range(0, 200, 4):
            s = idx.slot_of(i)
            mask[s] = True
            elig_slots.append((i, s))
        queries = data[:8] + np.float32(0.01)
        res = idx.search_batch_device(queries, 5, ef=64, slot_mask=mask)
        elig_ids = {i for i, _ in elig_slots}
        for qi, row in enumerate(res):
            assert row, "masked device search found nothing"
            assert all(i in elig_ids for i, _ in row)
        # query 0 is next to v0 (eligible): must be the top hit
        assert res[0][0][0] == 0

    def test_ivf_probed_masked_exact(self, rng):
        """Filtered IVF goes through the PROBED path: with nprobe =
        nlist (all clusters probed) results are exact; with partial
        probing the filter is still applied exactly and recall matches
        the unfiltered contract."""
        from vectordb_tpu.index import IvfFlatIndex
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8, nprobe=8,
                           seed=0, auto_train_min=10**9)
        store = VectorStore.with_index(idx)
        data = rng.standard_normal((600, 8)).astype(np.float32)
        for i in range(600):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 2))
        idx.train()
        flt = MetadataFilter.eq("par", "0")
        elig = [i for i in range(600) if i % 2 == 0]
        for qi in (3, 44, 101):
            q = data[qi]
            d2 = np.sum((data[elig] - q) ** 2, axis=1)
            want = [f"v{elig[j]}" for j in np.argsort(d2)[:5]]
            got = store.search_with_filter(Vector(q), 5, flt)
            assert [r.id for r in got] == want, qi
        # partial probing: filter exactness unconditional, high overlap
        idx.nprobe = 4
        hits = 0
        for qi in (3, 44, 101):
            q = data[qi]
            d2 = np.sum((data[elig] - q) ** 2, axis=1)
            want = {f"v{elig[j]}" for j in np.argsort(d2)[:5]}
            got = store.search_with_filter(Vector(q), 5, flt)
            assert all(int(r.id[1:]) % 2 == 0 for r in got)
            hits += len({r.id for r in got} & want)
        assert hits >= 12  # >= 0.8 recall over the 3 queries

    def test_ivf_masked_shortfall_falls_back_exact(self, rng):
        """Selective filter (3 eligible rows): the probed path comes up
        short and the exact masked scan must serve the full answer."""
        from vectordb_tpu.index import IvfFlatIndex
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8, nprobe=1,
                           seed=0, auto_train_min=10**9)
        store = VectorStore.with_index(idx)
        data = rng.standard_normal((500, 8)).astype(np.float32)
        rare = {11, 222, 444}
        for i in range(500):
            store.insert_with_metadata(
                f"v{i}", Vector(data[i]),
                meta(tag="rare" if i in rare else "common"))
        idx.train()
        got = store.search_with_filter(Vector(data[0]), 5,
                                       MetadataFilter.eq("tag", "rare"))
        assert {r.id for r in got} == {f"v{i}" for i in rare}


class TestKnobsComposeWithFilters:
    """Round-3: per-request recall knobs (nprobe/refine/ef) compose with
    metadata filters through the masked probed/scan index paths —
    previously store/HTTP rejected the combination."""

    def _ivf_store(self, rng, n=600, d=8):
        from vectordb_tpu.index import IvfFlatIndex
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=8, nprobe=2,
                           seed=0, auto_train_min=10**9)
        store = VectorStore.with_index(idx)
        data = rng.standard_normal((n, d)).astype(np.float32)
        for i in range(n):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 2))
        idx.train()
        return store, idx, data

    def test_nprobe_with_filter_exact_at_full_probe(self, rng):
        store, idx, data = self._ivf_store(rng)
        flt = MetadataFilter.eq("par", "0")
        elig = [i for i in range(len(data)) if i % 2 == 0]
        for qi in (3, 44, 101):
            q = data[qi]
            d2 = np.sum((data[elig] - q) ** 2, axis=1)
            want = [f"v{elig[j]}" for j in np.argsort(d2)[:5]]
            # nprobe=nlist probes everything: exact filtered results,
            # overriding the index default (nprobe=2) per call
            got = store.search_with_filter(Vector(q), 5, flt, nprobe=8)
            assert [r.id for r in got] == want, qi

    def test_nprobe_with_filter_eligible_only(self, rng):
        store, idx, data = self._ivf_store(rng)
        flt = MetadataFilter.eq("par", "1")
        got = store.search_with_filter(Vector(data[10]), 7, flt, nprobe=1)
        assert len(got) == 7
        assert all(int(r.id[1:]) % 2 == 1 for r in got)
        dd = [r.distance for r in got]
        assert dd == sorted(dd)

    def test_batch_nprobe_with_filter(self, rng):
        store, idx, data = self._ivf_store(rng)
        flt = MetadataFilter.eq("par", "0")
        elig = [i for i in range(len(data)) if i % 2 == 0]
        queries = [(Vector(data[3]), 4), (Vector(data[44]), 4)]
        got = store.search_batch_with_filter(queries, flt, nprobe=8)
        for (qv, k), rows in zip(queries, got):
            q = np.asarray(qv.as_list(), np.float32)
            d2 = np.sum((data[elig] - q) ** 2, axis=1)
            want = [f"v{elig[j]}" for j in np.argsort(d2)[:k]]
            assert [r.id for r in rows] == want

    def test_refine_with_filter_on_pq(self, rng):
        from vectordb_tpu.index import PqFlatIndex
        idx = PqFlatIndex(DistanceMetric.EUCLIDEAN, m=4, ksub=16,
                          refine=8, auto_train_min=10**9, seed=0)
        store = VectorStore.with_index(idx)
        data = rng.standard_normal((4096, 8)).astype(np.float32)
        for i in range(len(data)):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 2))
        idx.train()
        flt = MetadataFilter.eq("par", "0")
        elig = [i for i in range(len(data)) if i % 2 == 0]
        q = data[8]
        d2 = np.sum((data[elig] - q) ** 2, axis=1)
        want = {f"v{elig[j]}" for j in np.argsort(d2)[:5]}
        # large refine pool: near-exact filtered results, knob honored
        got = store.search_with_filter(Vector(q), 5, flt, refine=512)
        assert all(int(r.id[1:]) % 2 == 0 for r in got)
        assert len({r.id for r in got} & want) >= 4
        # batch path
        gotb = store.search_batch_with_filter([(Vector(q), 5)], flt,
                                              refine=512)
        assert [r.id for r in gotb[0]] == [r.id for r in got]

    def test_ef_with_filter_on_hnsw(self, rng):
        from vectordb_tpu.index.hnsw import HnswIndex, HnswParams
        store = VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN,
                                      HnswParams(seed=7)))
        data = rng.standard_normal((300, 8)).astype(np.float32)
        for i in range(len(data)):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 2))
        flt = MetadataFilter.eq("par", "0")
        got = store.search_with_filter(Vector(data[4]), 5, flt, ef=256)
        assert got and all(int(r.id[1:]) % 2 == 0 for r in got)
        assert got[0].id == "v4"

    def test_ef_with_selective_filter_returns_k(self, rng):
        """ef + a SELECTIVE filter must still fill k results when k
        matches exist: the user ef rides the masked traversal (widened
        by selectivity), and the over-fetch fallback scales fetch_k by
        the mask's selectivity instead of a fixed 3x."""
        from vectordb_tpu.index.hnsw import HnswIndex, HnswParams
        store = VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN,
                                      HnswParams(seed=7)))
        data = rng.standard_normal((600, 8)).astype(np.float32)
        # 1-in-30 selectivity: 20 eligible rows total
        for i in range(len(data)):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 30))
        flt = MetadataFilter.eq("par", "0")
        elig = [i for i in range(len(data)) if i % 30 == 0]
        for ef in (16, 64):
            got = store.search_with_filter(Vector(data[30]), 10, flt,
                                           ef=ef)
            assert len(got) == 10, (ef, len(got))
            assert all(int(r.id[1:]) % 30 == 0 for r in got)
            assert got[0].id == "v30"
        # exactness of the set at a generous ef
        q = data[30]
        d2 = np.sum((data[elig] - q) ** 2, axis=1)
        want = {f"v{elig[j]}" for j in np.argsort(d2)[:10]}
        got = store.search_with_filter(Vector(q), 10, flt, ef=512)
        assert len({r.id for r in got} & want) >= 9

    def test_knob_mismatch_with_filter_raises(self, rng):
        from vectordb_tpu.errors import IndexOpError
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        store.insert_with_metadata("a", Vector([1.0, 2.0]), meta(x=1))
        with pytest.raises(IndexOpError):
            store.search_with_filter(Vector([1.0, 2.0]), 3,
                                     MetadataFilter.eq("x", "1"), nprobe=2)
        with pytest.raises(IndexOpError):
            store.search(Vector([1.0, 2.0]), 3, refine=4,
                         filter=MetadataFilter.eq("x", "1"))

    def test_search_filter_kwarg_routes_to_filtered(self, rng):
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        data = rng.standard_normal((50, 4)).astype(np.float32)
        for i in range(50):
            store.insert_with_metadata(f"v{i}", Vector(data[i]),
                                       meta(par=i % 2))
        got = store.search(Vector(data[2]), 5,
                           filter=MetadataFilter.eq("par", "0"))
        want = store.search_with_filter(Vector(data[2]), 5,
                                        MetadataFilter.eq("par", "0"))
        assert [r.id for r in got] == [r.id for r in want]
