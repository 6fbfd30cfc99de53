"""Durable serving: the HTTP Api over a StorageEngine-backed AppState.

Beyond the reference, which rejects serve + --data-dir outright
(src/main.rs:100-102): here the engine exposes the full VectorStore
surface, so the same 9-endpoint router serves WAL-first durable writes,
and POST /checkpoint forces a snapshot + WAL truncate. The in-memory
surface is unchanged (/checkpoint answers 404 there).
"""

import json
import urllib.request

from vectordb_tpu.persistence import EngineConfig, StorageEngine
from vectordb_tpu.server import test_api as make_memory_api
from vectordb_tpu.server.app import AppState
from vectordb_tpu.server.routes import Api


def make_api(data_dir, **cfg):
    engine = StorageEngine.open(data_dir, EngineConfig(**cfg))
    return Api(AppState(engine)), engine


def insert(api, vid, vec, metadata=None):
    body = {"id": vid, "vector": vec}
    if metadata:
        body["metadata"] = metadata
    return api.handle("POST", "/vectors", body)


class TestDurableCrud:
    def test_insert_survives_reopen(self, tmp_path):
        api, engine = make_api(tmp_path)
        status, _ = insert(api, "a", [1.0, 2.0], {"kind": "x"})
        assert status == 201
        engine.close()

        api2, engine2 = make_api(tmp_path)
        status, payload = api2.handle("GET", "/vectors/a")
        assert status == 200
        assert payload["vector"] == [1.0, 2.0]
        assert payload["metadata"] == {"kind": "x"}
        engine2.close()

    def test_delete_survives_reopen(self, tmp_path):
        api, engine = make_api(tmp_path)
        insert(api, "a", [1.0, 2.0])
        insert(api, "b", [3.0, 4.0])
        status, _ = api.handle("DELETE", "/vectors/a")
        assert status == 200
        engine.close()

        api2, engine2 = make_api(tmp_path)
        assert api2.handle("GET", "/vectors/a")[0] == 404
        assert api2.handle("GET", "/vectors/b")[0] == 200
        engine2.close()

    def test_batch_insert_survives_reopen(self, tmp_path):
        api, engine = make_api(tmp_path)
        status, payload = api.handle("POST", "/vectors/batch", {
            "vectors": [{"id": f"v{i}", "vector": [float(i), 0.0]}
                        for i in range(20)]})
        assert status == 201 and payload == {"inserted": 20}
        engine.close()

        api2, engine2 = make_api(tmp_path)
        status, ids = api2.handle("GET", "/vectors")
        assert status == 200 and len(ids) == 20
        engine2.close()

    def test_unclean_close_recovers_from_wal(self, tmp_path):
        # no close(): the WAL alone must carry the writes (crash model)
        api, engine = make_api(tmp_path)
        insert(api, "a", [1.0, 0.0])
        insert(api, "b", [0.0, 1.0])
        api.handle("DELETE", "/vectors/a")

        api2, engine2 = make_api(tmp_path)
        status, ids = api2.handle("GET", "/vectors")
        assert status == 200 and ids == ["b"]
        engine2.close()
        engine.close()


class TestDurableSearch:
    def test_search_endpoints_match_memory_store(self, tmp_path):
        api, engine = make_api(tmp_path)
        mem_api, _ = make_memory_api()
        rows = [("a", [0.0, 0.0], {"kind": "x"}),
                ("b", [1.0, 0.0], {"kind": "y"}),
                ("c", [0.0, 2.0], {"kind": "x"}),
                ("d", [3.0, 3.0], None)]
        for vid, vec, meta in rows:
            insert(api, vid, vec, meta)
            insert(mem_api, vid, vec, meta)

        for body in (
            {"vector": [0.1, 0.1], "k": 3},
            {"vector": [0.1, 0.1], "k": 2,
             "filter": {"op": "eq", "field": "kind", "value": "x"}},
            {"vector": [0.0, 0.0], "radius": 1.5},
            {"vector": [0.0, 0.0], "radius": 1.5, "limit": 1,
             "filter": {"op": "eq", "field": "kind", "value": "x"}},
        ):
            assert api.handle("POST", "/search", body) == \
                mem_api.handle("POST", "/search", body), body

        batch = {"queries": [{"vector": [0.1, 0.1], "k": 2},
                             {"vector": [3.0, 3.0]}]}
        assert api.handle("POST", "/search/batch", batch) == \
            mem_api.handle("POST", "/search/batch", batch)
        batch["filter"] = {"op": "exists", "field": "kind"}
        assert api.handle("POST", "/search/batch", batch) == \
            mem_api.handle("POST", "/search/batch", batch)
        engine.close()

    def test_health_and_list(self, tmp_path):
        api, engine = make_api(tmp_path)
        insert(api, "a", [1.0])
        status, payload = api.handle("GET", "/health")
        assert status == 200
        assert payload == {"status": "ok", "vector_count": 1}
        assert api.handle("GET", "/vectors") == (200, ["a"])
        engine.close()

    def test_hnsw_engine_behind_api(self, tmp_path):
        api, engine = make_api(tmp_path, index_type="hnsw")
        for i in range(32):
            insert(api, f"v{i}", [float(i), float(i % 3)])
        status, hits = api.handle(
            "POST", "/search", {"vector": [5.0, 2.0], "k": 3})
        assert status == 200 and hits[0]["id"] == "v5"
        engine.close()
        # reopen imports the checkpointed graph or rebuilds — either way
        # the same query answers identically
        api2, engine2 = make_api(tmp_path, index_type="hnsw")
        status, hits2 = api2.handle(
            "POST", "/search", {"vector": [5.0, 2.0], "k": 3})
        assert status == 200 and hits2[0]["id"] == "v5"
        engine2.close()


class TestCheckpointEndpoint:
    def test_checkpoint_truncates_wal(self, tmp_path):
        api, engine = make_api(tmp_path)
        for i in range(8):
            insert(api, f"v{i}", [float(i), 1.0])
        wal_path = tmp_path / "wal.log"
        assert wal_path.stat().st_size > 0
        status, payload = api.handle("POST", "/checkpoint")
        assert status == 200
        assert payload == {"status": "checkpointed", "vector_count": 8}
        # WAL now holds only the post-truncate marker-free tail
        assert engine._wal_count == 0
        engine.close()

        api2, engine2 = make_api(tmp_path)
        status, ids = api2.handle("GET", "/vectors")
        assert status == 200 and len(ids) == 8
        engine2.close()

    def test_checkpoint_404_on_memory_store(self):
        api, _ = make_memory_api()
        status, payload = api.handle("POST", "/checkpoint")
        assert status == 404

    def test_checkpoint_wrong_method_404(self, tmp_path):
        api, engine = make_api(tmp_path)
        assert api.handle("GET", "/checkpoint")[0] == 404
        engine.close()


class TestDurableSocket:
    def test_real_socket_durable_roundtrip(self, tmp_path):
        """Insert over a real socket, restart the server on the same
        directory, and read the row back (the stdlib backend; the native
        front-end shares the Api/store surface)."""
        from vectordb_tpu.server.app import start_server_background

        def request(port, method, path, body=None):
            data = None if body is None else json.dumps(body).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=data, method=method,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())

        engine = StorageEngine.open(tmp_path, EngineConfig())
        server, _ = start_server_background("127.0.0.1:0", AppState(engine))
        port = server.server_address[1]
        try:
            status, _ = request(port, "POST", "/vectors",
                                {"id": "a", "vector": [1.0, 2.0]})
            assert status == 201
        finally:
            server.shutdown()
            engine.close()

        engine2 = StorageEngine.open(tmp_path, EngineConfig())
        server2, _ = start_server_background("127.0.0.1:0",
                                             AppState(engine2))
        port2 = server2.server_address[1]
        try:
            status, payload = request(port2, "GET", "/vectors/a")
            assert status == 200 and payload["vector"] == [1.0, 2.0]
            status, hits = request(port2, "POST", "/search",
                                   {"vector": [1.0, 2.0], "k": 1})
            assert status == 200 and hits[0]["id"] == "a"
        finally:
            server2.shutdown()
            engine2.close()


class TestCliFlag:
    def test_parser_accepts_durable_dir(self):
        from vectordb_tpu.cli import build_parser
        args = build_parser().parse_args(
            ["serve", "--durable-dir", "/tmp/x", "--addr", "127.0.0.1:0"])
        assert args.durable_dir == "/tmp/x"

    def test_serve_data_dir_still_rejected(self, tmp_path, capsys):
        # reference parity (main.rs:100-102) is unchanged by the extension
        from vectordb_tpu.cli import main
        rc = main(["--data-dir", str(tmp_path), "serve"])
        assert rc == 1
        assert "not supported with --data-dir" in capsys.readouterr().err
