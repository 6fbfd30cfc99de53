"""HTTP route tests — in-process, no socket (the reference's oneshot
pattern, src/server/routes.rs:433-722), plus one real-socket smoke test."""

import json
import urllib.request

import pytest

from vectordb_tpu.server import test_api as make_test_api


@pytest.fixture
def api():
    return make_test_api()[0]


def insert(api, vid, vec, metadata=None):
    body = {"id": vid, "vector": vec}
    if metadata:
        body["metadata"] = metadata
    return api.handle("POST", "/vectors", body)


class TestInsert:
    def test_insert_created(self, api):
        status, payload = insert(api, "a", [1.0, 2.0])
        assert status == 201
        assert payload == {"id": "a", "status": "inserted"}

    def test_insert_with_metadata(self, api):
        status, _ = insert(api, "a", [1.0], {"cat": "x"})
        assert status == 201
        status, payload = api.handle("GET", "/vectors/a")
        assert payload["metadata"] == {"cat": "x"}

    def test_insert_dim_mismatch_400(self, api):
        insert(api, "a", [1.0, 2.0])
        status, payload = insert(api, "b", [1.0])
        assert status == 400
        assert "Dimension mismatch" in payload["error"]

    def test_insert_missing_fields_400(self, api):
        status, payload = api.handle("POST", "/vectors", {"id": "a"})
        assert status == 400
        status, payload = api.handle("POST", "/vectors", None)
        assert status == 400

    def test_insert_records_metric(self, api):
        insert(api, "a", [1.0])
        _, metrics = api.handle("GET", "/metrics")
        assert metrics["total_inserts"] == 1


class TestGet:
    def test_get_found(self, api):
        insert(api, "a", [1.0, 2.0])
        status, payload = api.handle("GET", "/vectors/a")
        assert status == 200
        assert payload["id"] == "a"
        assert payload["dimension"] == 2
        assert payload["vector"] == [1.0, 2.0]
        assert "metadata" not in payload  # omitted when empty (routes.rs:74)

    def test_get_missing_404(self, api):
        status, payload = api.handle("GET", "/vectors/nope")
        assert status == 404
        assert "Vector not found" in payload["error"]


class TestDelete:
    def test_delete(self, api):
        insert(api, "a", [1.0])
        status, payload = api.handle("DELETE", "/vectors/a")
        assert status == 200
        assert payload == {"id": "a", "status": "deleted"}
        assert api.handle("GET", "/vectors/a")[0] == 404

    def test_delete_missing_404(self, api):
        status, _ = api.handle("DELETE", "/vectors/ghost")
        assert status == 404

    def test_delete_records_metric(self, api):
        insert(api, "a", [1.0])
        api.handle("DELETE", "/vectors/a")
        _, metrics = api.handle("GET", "/metrics")
        assert metrics["total_deletes"] == 1


class TestSearch:
    def test_search_defaults_k10(self, api):
        for i in range(15):
            insert(api, f"v{i}", [float(i), 0.0])
        status, hits = api.handle("POST", "/search", {"vector": [0.0, 0.0]})
        assert status == 200
        assert len(hits) == 10
        assert hits[0]["id"] == "v0"
        assert hits[0]["distance"] == pytest.approx(0.0)

    def test_search_with_k(self, api):
        for i in range(5):
            insert(api, f"v{i}", [float(i)])
        _, hits = api.handle("POST", "/search", {"vector": [2.1], "k": 2})
        assert [h["id"] for h in hits] == ["v2", "v3"]

    def test_search_with_filter(self, api):
        insert(api, "a", [1.0], {"cat": "x"})
        insert(api, "b", [1.1], {"cat": "y"})
        _, hits = api.handle("POST", "/search", {
            "vector": [1.0],
            "filter": {"op": "eq", "field": "cat", "value": "y"},
        })
        assert [h["id"] for h in hits] == ["b"]

    def test_search_bad_filter_400(self, api):
        insert(api, "a", [1.0])
        status, _ = api.handle("POST", "/search", {
            "vector": [1.0], "filter": {"op": "gt", "field": "x", "value": "1"}})
        assert status == 400

    def test_search_dim_mismatch_400(self, api):
        insert(api, "a", [1.0, 2.0])
        status, payload = api.handle("POST", "/search", {"vector": [1.0]})
        assert status == 400

    def test_search_empty_store(self, api):
        status, hits = api.handle("POST", "/search", {"vector": [1.0]})
        assert status == 200 and hits == []

    def test_search_records_latency(self, api):
        insert(api, "a", [1.0])
        api.handle("POST", "/search", {"vector": [1.0]})
        _, metrics = api.handle("GET", "/metrics")
        assert metrics["total_queries"] == 1
        assert metrics["avg_query_latency_us"] > 0


class TestBatch:
    def test_batch_insert(self, api):
        status, payload = api.handle("POST", "/vectors/batch", {
            "vectors": [
                {"id": "a", "vector": [1.0, 0.0]},
                {"id": "b", "vector": [0.0, 1.0], "metadata": {"cat": "x"}},
            ]})
        assert status == 201
        assert payload == {"inserted": 2}
        _, metrics = api.handle("GET", "/metrics")
        assert metrics["total_inserts"] == 2

    def test_batch_insert_error_400(self, api):
        status, _ = api.handle("POST", "/vectors/batch", {
            "vectors": [
                {"id": "a", "vector": [1.0, 0.0]},
                {"id": "b", "vector": [0.0]},
            ]})
        assert status == 400

    def test_batch_search(self, api):
        for i in range(10):
            insert(api, f"v{i}", [float(i)], {"par": str(i % 2)})
        status, batches = api.handle("POST", "/search/batch", {
            "queries": [
                {"vector": [0.0], "k": 2},
                {"vector": [9.0], "k": 3},
            ]})
        assert status == 200
        assert [h["id"] for h in batches[0]] == ["v0", "v1"]
        assert [h["id"] for h in batches[1]] == ["v9", "v8", "v7"]

    def test_batch_search_shared_filter(self, api):
        for i in range(10):
            insert(api, f"v{i}", [float(i)], {"par": str(i % 2)})
        _, batches = api.handle("POST", "/search/batch", {
            "queries": [{"vector": [0.0], "k": 2}],
            "filter": {"op": "eq", "field": "par", "value": "1"},
        })
        assert [h["id"] for h in batches[0]] == ["v1", "v3"]

    def test_batch_search_one_latency_sample(self, api):
        insert(api, "a", [1.0])
        api.handle("POST", "/search/batch", {
            "queries": [{"vector": [1.0]}, {"vector": [1.0]}]})
        _, metrics = api.handle("GET", "/metrics")
        assert metrics["total_queries"] == 1  # routes.rs:365-369


class TestMisc:
    def test_list(self, api):
        insert(api, "a", [1.0])
        insert(api, "b", [2.0])
        status, ids = api.handle("GET", "/vectors")
        assert status == 200
        assert sorted(ids) == ["a", "b"]

    def test_health(self, api):
        insert(api, "a", [1.0])
        status, payload = api.handle("GET", "/health")
        assert status == 200
        assert payload == {"status": "ok", "vector_count": 1}

    def test_metrics_shape(self, api):
        _, payload = api.handle("GET", "/metrics")
        assert set(payload) == {
            "total_queries", "total_inserts", "total_deletes",
            "avg_query_latency_us", "p50_query_latency_us",
            "p95_query_latency_us", "p99_query_latency_us"}

    def test_unknown_route_404(self, api):
        assert api.handle("GET", "/nope")[0] == 404
        assert api.handle("PUT", "/vectors")[0] == 404

    def test_trailing_slash(self, api):
        insert(api, "a", [1.0])
        assert api.handle("GET", "/vectors/")[0] == 200


def test_real_socket_end_to_end():
    """One smoke test over a real TCP socket."""
    from vectordb_tpu.server import AppState
    from vectordb_tpu.server.app import start_server_background
    from vectordb_tpu.store import VectorStore
    from vectordb_tpu.distance import DistanceMetric

    state = AppState(VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN))
    server, _ = start_server_background("127.0.0.1:0", state)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/vectors", method="POST",
            data=json.dumps({"id": "a", "vector": [1.0, 2.0]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 201
        req = urllib.request.Request(
            f"{base}/search", method="POST",
            data=json.dumps({"vector": [1.0, 2.0]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            hits = json.loads(resp.read())
            assert hits[0]["id"] == "a"
        with urllib.request.urlopen(f"{base}/health") as resp:
            assert json.loads(resp.read())["vector_count"] == 1
    finally:
        server.shutdown()
        server.server_close()


class TestSearchKnobs:
    """Per-request recall knobs: 'ef' (HNSW) / 'nprobe' (IVF)."""

    def _hnsw_api(self):
        from vectordb_tpu.distance import DistanceMetric
        from vectordb_tpu.index.hnsw import HnswIndex, HnswParams
        from vectordb_tpu.server import AppState
        from vectordb_tpu.server.routes import Api
        from vectordb_tpu.store import VectorStore
        store = VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN,
                                      HnswParams(seed=7)))
        return Api(AppState(store))

    def _ivf_api(self):
        import numpy as np
        from vectordb_tpu.distance import DistanceMetric
        from vectordb_tpu.index.ivf import IvfFlatIndex
        from vectordb_tpu.server import AppState
        from vectordb_tpu.server.routes import Api
        from vectordb_tpu.store import VectorStore
        idx = IvfFlatIndex(DistanceMetric.EUCLIDEAN, nlist=4,
                           auto_train_min=10 ** 9)
        store = VectorStore(idx)
        api = Api(AppState(store))
        rng = np.random.default_rng(0)
        items = [{"id": f"v{i}", "vector": [float(x) for x in row]}
                 for i, row in enumerate(
                     rng.standard_normal((64, 8)).astype("float32"))]
        status, _ = api.handle("POST", "/vectors/batch", {"vectors": items})
        assert status == 201
        idx.train()
        return api, items

    def test_ef_on_hnsw_search(self):
        api = self._hnsw_api()
        for i in range(30):
            status, _ = insert(api, f"v{i}", [float(i), float(i % 3)])
            assert status == 201
        status, payload = api.handle(
            "POST", "/search", {"vector": [4.0, 1.0], "k": 3, "ef": 200})
        assert status == 200
        assert payload[0]["id"] == "v4"

    def test_ef_on_flat_index_400(self, api):
        insert(api, "a", [1.0, 2.0])
        status, payload = api.handle(
            "POST", "/search", {"vector": [1.0, 2.0], "ef": 50})
        assert status == 400
        assert "ef" in payload["error"]

    def test_nprobe_on_ivf_search_and_batch(self):
        api, items = self._ivf_api()
        q = items[5]["vector"]
        status, payload = api.handle(
            "POST", "/search", {"vector": q, "k": 1, "nprobe": 4})
        assert status == 200
        assert payload[0]["id"] == "v5"
        status, payload = api.handle(
            "POST", "/search/batch",
            {"queries": [{"vector": q, "k": 1}], "nprobe": 2})
        assert status == 200
        assert payload[0][0]["id"] == "v5"

    def test_nprobe_on_flat_index_400(self, api):
        insert(api, "a", [1.0, 2.0])
        status, payload = api.handle(
            "POST", "/search", {"vector": [1.0, 2.0], "nprobe": 2})
        assert status == 400
        assert "nprobe" in payload["error"]

    def test_knobs_mutually_exclusive_400(self):
        api = self._hnsw_api()
        insert(api, "a", [1.0, 2.0])
        status, payload = api.handle(
            "POST", "/search", {"vector": [1.0, 2.0], "ef": 8, "nprobe": 2})
        assert status == 400

    def test_ef_composes_with_filter(self):
        """Knobs now COMPOSE with filters (round-3: the masked probed /
        scan / tuned-over-fetch paths serve exact filtered+tuned
        results instead of a 400)."""
        api = self._hnsw_api()
        for i in range(30):
            status, _ = api.handle("POST", "/vectors", {
                "id": f"v{i}", "vector": [float(i), float(i % 3)],
                "metadata": {"par": str(i % 2)}})
            assert status == 201
        status, payload = api.handle(
            "POST", "/search",
            {"vector": [4.0, 1.0], "k": 3, "ef": 200,
             "filter": {"op": "eq", "field": "par", "value": "0"}})
        assert status == 200
        assert all(int(hit["id"][1:]) % 2 == 0 for hit in payload)
        assert payload  # eligible rows exist

    def test_nprobe_composes_with_filter_search_and_batch(self):
        import numpy as np
        api, items = self._ivf_api()
        # tag even ids: re-insert with metadata
        for i, item in enumerate(items):
            status, _ = api.handle("POST", "/vectors", {
                **item, "metadata": {"par": str(i % 2)}})
            assert status == 201
        flt = {"op": "eq", "field": "par", "value": "0"}
        q = items[6]["vector"]
        status, payload = api.handle(
            "POST", "/search",
            {"vector": q, "k": 3, "nprobe": 4, "filter": flt})
        assert status == 200
        assert payload[0]["id"] == "v6"
        assert all(int(h["id"][1:]) % 2 == 0 for h in payload)
        status, payload = api.handle(
            "POST", "/search/batch",
            {"queries": [{"vector": q, "k": 2}], "nprobe": 4,
             "filter": flt})
        assert status == 200
        assert payload[0][0]["id"] == "v6"
        assert all(int(h["id"][1:]) % 2 == 0 for h in payload[0])

    def test_knob_index_mismatch_with_filter_still_400(self, api):
        # a knob the index can't serve stays a 400 even when filtered
        insert(api, "a", [1.0, 2.0])
        status, payload = api.handle(
            "POST", "/search",
            {"vector": [1.0, 2.0], "nprobe": 2,
             "filter": {"op": "eq", "field": "x", "value": "1"}})
        assert status == 400
        assert "nprobe" in payload["error"]

    def test_bad_knob_values_400(self):
        api = self._hnsw_api()
        insert(api, "a", [1.0, 2.0])
        for body in ({"vector": [1.0, 2.0], "ef": "abc"},
                     {"vector": [1.0, 2.0], "ef": 0},
                     {"vector": [1.0, 2.0], "nprobe": -1}):
            status, _ = api.handle("POST", "/search", body)
            assert status == 400, body
