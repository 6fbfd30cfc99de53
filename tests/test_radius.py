"""Radius (range) search — beyond the reference: every vector within a
distance threshold, ascending, capped at ``limit``. Covers the index
default, the exact flat path, HNSW/IVF over-search, the store facade
(incl. filters and the dot-product sign convention), the engine
delegate, the HTTP route, and the CLI flag."""

import numpy as np
import pytest

from vectordb_tpu import (BatchInsertItem, DistanceMetric, Vector,
                          VectorStore)
from vectordb_tpu.errors import DimensionMismatchError, IndexOpError
from vectordb_tpu.index.flat import FlatIndex
from vectordb_tpu.index.hnsw import HnswIndex
from vectordb_tpu.metadata import Metadata, MetadataFilter
from vectordb_tpu.server import test_api as make_test_api


def line_store(metric=DistanceMetric.EUCLIDEAN, index=None):
    """v0..v4 at x = 0, 1, 2, 3, 4 on the x-axis (2-d)."""
    store = VectorStore(index or FlatIndex(metric))
    store.insert_batch([
        BatchInsertItem(id=f"v{i}", vector=Vector([float(i), 0.0]),
                        metadata=Metadata({"parity": str(i % 2)}))
        for i in range(5)])
    return store


class TestStoreRadius:
    def test_exact_flat(self):
        store = line_store()
        hits = store.search_radius(Vector([0.0, 0.0]), 2.5)
        assert [h.id for h in hits] == ["v0", "v1", "v2"]
        dists = [h.distance for h in hits]
        assert dists == sorted(dists)
        assert dists == pytest.approx([0.0, 1.0, 2.0])

    def test_radius_excludes_boundary_epsilon(self):
        store = line_store()
        hits = store.search_radius(Vector([0.0, 0.0]), 1.0)  # inclusive
        assert [h.id for h in hits] == ["v0", "v1"]
        hits = store.search_radius(Vector([0.0, 0.0]), 0.999)
        assert [h.id for h in hits] == ["v0"]

    def test_limit_caps_result(self):
        store = line_store()
        hits = store.search_radius(Vector([0.0, 0.0]), 100.0, limit=2)
        assert [h.id for h in hits] == ["v0", "v1"]

    def test_limit_validated(self):
        store = line_store()
        with pytest.raises(IndexOpError):
            store.search_radius(Vector([0.0, 0.0]), 1.0, limit=0)

    def test_empty_store(self):
        store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        assert store.search_radius(Vector([1.0, 0.0]), 5.0) == []

    def test_dimension_checked(self):
        store = line_store()
        with pytest.raises(DimensionMismatchError):
            store.search_radius(Vector([1.0, 0.0, 0.0]), 5.0)

    def test_with_filter_exact(self):
        store = line_store()
        flt = MetadataFilter.from_dict(
            {"op": "eq", "field": "parity", "value": "0"})
        hits = store.search_radius(Vector([0.0, 0.0]), 2.5, filter=flt)
        assert [h.id for h in hits] == ["v0", "v2"]

    def test_dot_product_thresholds_negated_dot(self):
        # smaller-is-better convention: distance = -dot. radius=-2.0
        # admits rows with dot >= 2.0.
        store = line_store(DistanceMetric.DOT_PRODUCT)
        hits = store.search_radius(Vector([1.0, 0.0]), -2.0)
        assert [h.id for h in hits] == ["v4", "v3", "v2"]

    def test_nothing_within(self):
        store = line_store()
        assert store.search_radius(Vector([100.0, 0.0]), 1.0) == []


class TestIndexBackends:
    def test_hnsw_matches_flat_ground_truth(self):
        rng = np.random.default_rng(3)
        data = rng.standard_normal((300, 16)).astype(np.float32)
        flat = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
        hnsw = VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN))
        items = [BatchInsertItem(id=f"v{i}", vector=Vector(data[i]))
                 for i in range(len(data))]
        flat.insert_batch(items)
        hnsw.insert_batch(items)
        q = Vector(data[17] + 0.01)
        r = 2.0
        truth = {h.id: h.distance for h in flat.search_radius(q, r,
                                                              limit=300)}
        hits = hnsw.search_radius(q, r, limit=300)
        dd = [h.distance for h in hits]
        assert dd == sorted(dd)
        for h in hits:  # every hit is genuinely within the radius
            assert h.id in truth
            assert h.distance == pytest.approx(truth[h.id], abs=1e-5)
        # on 300 points with ef >= limit the traversal finds everything
        assert len(hits) == len(truth)

    def test_hnsw_ef_widens_to_limit(self):
        # limit > default ef_search (50) must not cap the beam
        idx = HnswIndex(DistanceMetric.EUCLIDEAN)
        rng = np.random.default_rng(5)
        data = rng.standard_normal((200, 8)).astype(np.float32)
        for i in range(len(data)):
            idx.add(i, Vector(data[i]))
        hits = idx.search_radius(Vector(data[0]), 1e9, 120)
        assert len(hits) == 120

    def test_ivf_smoke(self):
        from vectordb_tpu.index.ivf import IvfFlatIndex
        store = line_store(index=IvfFlatIndex(DistanceMetric.EUCLIDEAN))
        hits = store.search_radius(Vector([0.0, 0.0]), 2.5)
        assert [h.id for h in hits] == ["v0", "v1", "v2"]


class TestEngineRadius:
    def test_engine_delegates(self, tmp_path):
        from vectordb_tpu.persistence.engine import StorageEngine
        with StorageEngine.open(tmp_path) as eng:
            for i in range(5):
                eng.insert(f"v{i}", Vector([float(i), 0.0]))
            hits = eng.search_radius(Vector([0.0, 0.0]), 1.5)
            assert [h.id for h in hits] == ["v0", "v1"]


class TestHttpRadius:
    @pytest.fixture
    def api(self):
        api = make_test_api()[0]
        for i in range(5):
            api.handle("POST", "/vectors",
                       {"id": f"v{i}", "vector": [float(i), 0.0],
                        "metadata": {"parity": str(i % 2)}})
        return api

    def test_radius_search(self, api):
        status, payload = api.handle(
            "POST", "/search", {"vector": [0.0, 0.0], "radius": 2.5})
        assert status == 200
        assert [r["id"] for r in payload] == ["v0", "v1", "v2"]

    def test_radius_with_limit(self, api):
        status, payload = api.handle(
            "POST", "/search",
            {"vector": [0.0, 0.0], "radius": 100.0, "limit": 2})
        assert status == 200
        assert len(payload) == 2

    def test_radius_with_filter(self, api):
        status, payload = api.handle(
            "POST", "/search",
            {"vector": [0.0, 0.0], "radius": 2.5,
             "filter": {"op": "eq", "field": "parity", "value": "0"}})
        assert status == 200
        assert [r["id"] for r in payload] == ["v0", "v2"]

    def test_k_and_radius_400(self, api):
        status, payload = api.handle(
            "POST", "/search",
            {"vector": [0.0, 0.0], "radius": 1.0, "k": 3})
        assert status == 400
        assert "mutually exclusive" in payload["error"]

    def test_knobs_and_radius_400(self, api):
        status, payload = api.handle(
            "POST", "/search",
            {"vector": [0.0, 0.0], "radius": 1.0, "ef": 32})
        assert status == 400

    def test_radius_records_metric(self, api):
        api.handle("POST", "/search",
                   {"vector": [0.0, 0.0], "radius": 1.0})
        _, metrics = api.handle("GET", "/metrics")
        assert metrics["total_queries"] == 1


class TestNativeServerRadius:
    def test_radius_through_native_server(self):
        """A 'radius' body bypasses the C++ fast-path parse (unknown key
        -> Python router) and returns full Api semantics over a real
        socket."""
        import json
        import urllib.error
        import urllib.request

        from vectordb_tpu.server.app import AppState
        from vectordb_tpu.server.native_http import (NativeHttpServer,
                                                      native_http_available)
        from vectordb_tpu.server.routes import Api
        if not native_http_available():
            pytest.skip("native http core unavailable")
        state = AppState(VectorStore.with_flat_index(
            DistanceMetric.EUCLIDEAN))
        srv = NativeHttpServer(Api(state), "127.0.0.1", 0)
        srv.start_background()
        try:
            def req(method, path, payload=None):
                url = f"http://127.0.0.1:{srv.port}{path}"
                data = (json.dumps(payload).encode()
                        if payload is not None else None)
                r = urllib.request.Request(url, data=data, method=method)
                if data is not None:
                    r.add_header("Content-Type", "application/json")
                try:
                    with urllib.request.urlopen(r, timeout=10) as resp:
                        return resp.status, json.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return e.code, json.loads(e.read())

            items = [{"id": f"v{i}", "vector": [float(i), 0.0]}
                     for i in range(5)]
            status, _ = req("POST", "/vectors/batch", {"vectors": items})
            assert status == 201
            status, body = req("POST", "/search",
                               {"vector": [0.0, 0.0], "radius": 2.5})
            assert status == 200
            assert [r["id"] for r in body] == ["v0", "v1", "v2"]
            status, body = req("POST", "/search",
                               {"vector": [0.0, 0.0], "radius": 1.0,
                                "k": 2})
            assert status == 400
        finally:
            srv.shutdown()


class TestCliRadius:
    def test_search_radius_flag(self, capsys):
        from vectordb_tpu.cli import main
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            main(["--data-dir", tmp, "insert", "a", "--vector", "0,0"])
            main(["--data-dir", tmp, "insert", "b", "--vector", "3,0"])
            main(["--data-dir", tmp, "search", "0,0", "--radius", "1.5"])
            out = capsys.readouterr().out
            assert "a" in out.splitlines()[-1] or "a (distance" in out
            assert "b (distance" not in out

    def test_radius_knob_conflict(self, capsys):
        from vectordb_tpu.cli import main
        rc = main(["search", "0,0", "--radius", "1.0", "--ef", "8"])
        assert rc not in (0, None)


class TestShardedRadius:
    def test_radius_on_sharded_store(self):
        """Radius composes with a row-sharded mesh for free: the base
        implementation rides FlatIndex.search, which routes to the
        sharded pipeline when a mesh is attached."""
        from vectordb_tpu.parallel import make_mesh
        store = VectorStore(FlatIndex(DistanceMetric.EUCLIDEAN,
                                      mesh=make_mesh(8)))
        store.insert_batch([
            BatchInsertItem(id=f"v{i}", vector=Vector([float(i), 0.0]))
            for i in range(64)])
        hits = store.search_radius(Vector([0.0, 0.0]), 2.5)
        assert [h.id for h in hits] == ["v0", "v1", "v2"]
        dd = [h.distance for h in hits]
        assert dd == sorted(dd)


class TestQuantizedStorageRadius:
    @pytest.mark.parametrize("storage", ["bf16", "int8"])
    def test_radius_over_stored_values(self, storage):
        """Radius rides the quantized search paths: distances are exact
        over the STORED values, so integer-coordinate rows (exactly
        representable in bf16 and as int8 codes) threshold identically
        to f32."""
        store = line_store(index=FlatIndex(DistanceMetric.EUCLIDEAN,
                                           storage=storage))
        hits = store.search_radius(Vector([0.0, 0.0]), 2.5)
        assert [h.id for h in hits] == ["v0", "v1", "v2"]
        assert [h.distance for h in hits] == pytest.approx(
            [0.0, 1.0, 2.0], abs=1e-5)
