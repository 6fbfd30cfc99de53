"""Native C++ HTTP front-end (httpcore.cpp + server/native_http.py).

Drives the real epoll server over real sockets: all 9 endpoints, keep-alive
reuse, URL-encoded IDs, error statuses, and concurrent searches (which the
worker drain-batches into fused device calls).
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from vectordb_tpu import DistanceMetric, VectorStore
from vectordb_tpu.server.app import AppState
from vectordb_tpu.server.native_http import (NativeHttpServer,
                                             native_http_available)
from vectordb_tpu.server.routes import Api

pytestmark = pytest.mark.skipif(not native_http_available(),
                                reason="native http core unavailable")


@pytest.fixture
def server():
    state = AppState(VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN))
    srv = NativeHttpServer(Api(state), "127.0.0.1", 0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _req(srv, method, path, payload=None):
    url = f"http://127.0.0.1:{srv.port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_all_nine_endpoints(server):
    # insert
    status, body = _req(server, "POST", "/vectors",
                        {"id": "a", "vector": [1.0, 2.0, 3.0],
                         "metadata": {"cat": "x"}})
    assert (status, body["status"]) == (201, "inserted")
    # batch insert
    status, body = _req(server, "POST", "/vectors/batch", {"vectors": [
        {"id": "b", "vector": [1.0, 2.0, 4.0]},
        {"id": "c", "vector": [9.0, 9.0, 9.0], "metadata": {"cat": "y"}}]})
    assert (status, body["inserted"]) == (201, 2)
    # get (with metadata)
    status, body = _req(server, "GET", "/vectors/a")
    assert status == 200 and body["vector"] == [1.0, 2.0, 3.0]
    assert body["metadata"] == {"cat": "x"}
    # get (no metadata key when empty)
    status, body = _req(server, "GET", "/vectors/b")
    assert status == 200 and "metadata" not in body
    # list
    status, body = _req(server, "GET", "/vectors")
    assert status == 200 and sorted(body) == ["a", "b", "c"]
    # search
    status, body = _req(server, "POST", "/search",
                        {"vector": [1.0, 2.0, 3.1], "k": 2})
    assert status == 200 and [r["id"] for r in body] == ["a", "b"]
    # filtered search
    status, body = _req(server, "POST", "/search",
                        {"vector": [1.0, 2.0, 3.1], "k": 3,
                         "filter": {"op": "eq", "field": "cat",
                                    "value": "y"}})
    assert status == 200 and [r["id"] for r in body] == ["c"]
    # batch search
    status, body = _req(server, "POST", "/search/batch", {"queries": [
        {"vector": [1.0, 2.0, 3.0], "k": 1},
        {"vector": [9.0, 9.0, 9.0], "k": 1}]})
    assert status == 200
    assert [[r["id"] for r in q] for q in body] == [["a"], ["c"]]
    # delete
    status, body = _req(server, "DELETE", "/vectors/b")
    assert (status, body["status"]) == (200, "deleted")
    status, _ = _req(server, "GET", "/vectors/b")
    assert status == 404
    # health
    status, body = _req(server, "GET", "/health")
    assert status == 200 and body == {"status": "ok", "vector_count": 2}
    # metrics
    status, body = _req(server, "GET", "/metrics")
    assert status == 200 and body["total_queries"] >= 3


def test_error_statuses(server):
    status, body = _req(server, "POST", "/vectors", {"id": "x"})
    assert status == 400
    status, body = _req(server, "GET", "/vectors/missing")
    assert status == 404
    status, body = _req(server, "POST", "/nope", {})
    assert status == 404
    status, body = _req(server, "POST", "/search", {"vector": "bad"})
    assert status == 400


def test_invalid_json_body(server):
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
    conn.request("POST", "/search", body=b"{not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_keep_alive_reuses_connection(server):
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=10)
    for i in range(5):
        conn.request("POST", "/vectors",
                     body=json.dumps({"id": f"k{i}",
                                      "vector": [float(i), 0.0]}).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 201
        resp.read()
    conn.request("GET", "/health")
    resp = conn.getresponse()
    assert json.loads(resp.read())["vector_count"] == 5
    conn.close()


def test_url_encoded_ids(server):
    status, _ = _req(server, "POST", "/vectors",
                     {"id": "has space", "vector": [1.0]})
    assert status == 201
    status, body = _req(server, "GET", "/vectors/has%20space")
    assert status == 200 and body["id"] == "has space"


def test_concurrent_searches_drain_batch(server):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((512, 16)).astype(np.float32)
    items = [{"id": f"v{i}", "vector": [float(x) for x in data[i]]}
             for i in range(512)]
    status, _ = _req(server, "POST", "/vectors/batch", {"vectors": items})
    assert status == 201

    errors = []
    results = {}

    def worker(qi):
        try:
            status, body = _req(server, "POST", "/search",
                                {"vector": [float(x) for x in data[qi]],
                                 "k": 1})
            assert status == 200, body
            results[qi] = body[0]["id"]
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(qi,))
               for qi in range(0, 64)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert all(results[qi] == f"v{qi}" for qi in range(64))


def test_sustained_pipeline_depth(server):
    """Closed-loop clients issuing repeated searches force multiple drain
    cycles in flight at once (the collector thread overlaps cycle i's
    collect with cycle i+1's submit); every response must still match
    its request."""
    rng = np.random.default_rng(3)
    data = rng.standard_normal((256, 16)).astype(np.float32)
    items = [{"id": f"p{i}", "vector": [float(x) for x in data[i]]}
             for i in range(256)]
    status, _ = _req(server, "POST", "/vectors/batch", {"vectors": items})
    assert status == 201

    errors = []

    def worker(tid):
        try:
            for rep in range(10):
                qi = (tid * 10 + rep) % 256
                status, body = _req(
                    server, "POST", "/search",
                    {"vector": [float(x) for x in data[qi]], "k": 1})
                assert status == 200, body
                assert body[0]["id"] == f"p{qi}", (qi, body)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_large_batch_insert_roundtrip(server):
    # a multi-MB body exercises incremental reads in the C++ parser
    rng = np.random.default_rng(1)
    data = rng.standard_normal((800, 64)).astype(np.float32)
    items = [{"id": f"big{i}", "vector": [float(x) for x in data[i]]}
             for i in range(800)]
    status, body = _req(server, "POST", "/vectors/batch", {"vectors": items})
    assert (status, body["inserted"]) == (201, 800)
    status, body = _req(server, "GET", "/health")
    assert body["vector_count"] == 800


def test_fast_path_equivalence_and_fallback(server):
    """The C++ pre-parsed /search path (method 5) must be byte-equivalent
    to the Python JSON path, and odd bodies must fall back cleanly."""
    rng = np.random.default_rng(7)
    for i in range(50):
        _req(server, "POST", "/vectors",
             {"id": f"r{i}", "vector": rng.standard_normal(8).tolist(),
              "metadata": {"grp": str(i % 2)}})
    q = rng.standard_normal(8).tolist()
    # plain body -> C++ fast path
    s1, r1 = _req(server, "POST", "/search", {"vector": q, "k": 5})
    assert s1 == 200 and len(r1) == 5
    # same query via a body shape the C++ parser bails on (extra key) ->
    # Python path; results must be identical
    s2, r2 = _req(server, "POST", "/search",
                  {"vector": q, "k": 5, "unknown_key": 1})
    # unknown keys are ignored by the Python router too
    assert (s2, r2) == (s1, r1)
    # filter:null is fast-path eligible; a real filter is not
    s3, r3 = _req(server, "POST", "/search",
                  {"vector": q, "k": 5, "filter": None})
    assert (s3, r3) == (s1, r1)
    s4, r4 = _req(server, "POST", "/search",
                  {"vector": q, "k": 50,
                   "filter": {"op": "eq", "field": "grp", "value": "1"}})
    assert s4 == 200 and all(rr["id"][1:] != "0" or int(rr["id"][1:]) % 2
                             for rr in r4)
    # exponent/negative/integer number spellings parse identically
    exotic = [1, -2.5, 3e-2, -4E1, 0.125, 0, 7e2, -0.0]
    _req(server, "POST", "/vectors", {"id": "exo", "vector": exotic})
    s5, r5 = _req(server, "POST", "/search", {"vector": exotic, "k": 1})
    assert s5 == 200 and r5[0]["id"] == "exo" and r5[0]["distance"] == 0.0
    # malformed vector still 400s through the fallback
    s6, _ = _req(server, "POST", "/search", {"vector": ["x", "y"], "k": 1})
    assert s6 == 400
    # k as a JSON float is rejected by the fast parser; Python int() takes
    # floats -> must behave like the Python path (which accepts int-likes)
    s7, r7 = _req(server, "POST", "/search", {"vector": q, "k": 5.0})
    assert s7 in (200, 400)


def test_batch_fast_path_equivalence(server):
    """The C++ pre-parsed /search/batch path (method 6) must match the
    Python JSON route, including per-query k and fallback cases."""
    rng = np.random.default_rng(11)
    for i in range(30):
        _req(server, "POST", "/vectors",
             {"id": f"b{i}", "vector": rng.standard_normal(6).tolist(),
              "metadata": {"grp": str(i % 2)}})
    q1, q2 = (rng.standard_normal(6).tolist() for _ in range(2))
    body = {"queries": [{"vector": q1, "k": 3}, {"vector": q2}]}
    s1, r1 = _req(server, "POST", "/search/batch", body)
    assert s1 == 200 and len(r1) == 2
    assert len(r1[0]) == 3 and len(r1[1]) == 10   # per-query k, default 10
    # same body with an unknown key -> C++ bails -> Python route; identical
    s2, r2 = _req(server, "POST", "/search/batch", {**body, "zz": 1})
    assert (s2, r2) == (s1, r1)
    # real filter is not fast-path eligible but must still work
    s3, r3 = _req(server, "POST", "/search/batch",
                  {**body, "filter": {"op": "eq", "field": "grp",
                                      "value": "0"}})
    assert s3 == 200 and len(r3) == 2
    # malformed query object still 400s
    s4, _ = _req(server, "POST", "/search/batch", {"queries": [{"k": 3}]})
    assert s4 == 400
    # metrics: exactly one query sample per batch call
    _, m = _req(server, "GET", "/metrics")
    assert m["total_queries"] == 3


def test_cxx_response_bytes_match_python_route(server):
    """The C++-formatted /search response must be BYTE-identical to the
    Python router's json.dumps output — including integral distances
    ("0.0", never "0") and ensure_ascii \\u-escapes for non-ASCII ids."""
    import urllib.request

    def raw(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}{path}",
            data=json.dumps(payload).encode(), method="POST")
        req.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.read()

    _req(server, "POST", "/vectors",
         {"id": "café \U0001f680", "vector": [1.0, 2.0]})
    _req(server, "POST", "/vectors", {"id": "plain", "vector": [4.0, 6.0]})
    q = {"vector": [1.0, 2.0], "k": 2}
    fast = raw("/search", q)                       # C++ fast path
    slow = raw("/search", {**q, "unknown_key": 1})  # Python route
    assert fast == slow, (fast, slow)
    assert b'0.0' in fast and b'\\u00e9' in fast and b'\\ud83d' in fast


def test_pipelined_search_insert_interleave(server):
    """Rapid search/insert/search alternation through the depth-2
    pipelined drain loop: every search must reflect all writes the same
    client already had acknowledged (per-connection ordering)."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((32, 8)).astype(np.float32)
    items = [{"id": f"v{i}", "vector": [float(x) for x in base[i]]}
             for i in range(32)]
    status, _ = _req(server, "POST", "/vectors/batch", {"vectors": items})
    assert status == 201
    for step in range(8):
        vec = (base[step] + 100.0 * (step + 1)).astype(np.float32)
        status, _ = _req(server, "POST", "/vectors",
                         {"id": f"new{step}",
                          "vector": [float(x) for x in vec]})
        assert status == 201
        status, body = _req(server, "POST", "/search",
                            {"vector": [float(x) for x in vec], "k": 1})
        assert status == 200
        assert body[0]["id"] == f"new{step}"
        status, _ = _req(server, "DELETE", f"/vectors/new{step}")
        assert status == 200
        status, body = _req(server, "POST", "/search",
                            {"vector": [float(x) for x in vec], "k": 1})
        assert status == 200
        assert body[0]["id"] != f"new{step}"


def test_search_knobs_through_native_server():
    """ef/nprobe bodies bypass the C++ fast-path parse, group by
    (k, ef, nprobe), and reach the tuned index paths."""
    from vectordb_tpu.index.hnsw import HnswIndex, HnswParams
    state = AppState(VectorStore(HnswIndex(DistanceMetric.EUCLIDEAN,
                                           HnswParams(seed=3))))
    srv = NativeHttpServer(Api(state), "127.0.0.1", 0)
    srv.start_background()
    try:
        items = [{"id": f"v{i}", "vector": [float(i), float(i % 5)]}
                 for i in range(40)]
        status, _ = _req(srv, "POST", "/vectors/batch", {"vectors": items})
        assert status == 201
        status, body = _req(srv, "POST", "/search",
                            {"vector": [7.0, 2.0], "k": 2, "ef": 128})
        assert status == 200 and body[0]["id"] == "v7", body
        status, body = _req(srv, "POST", "/search",
                            {"vector": [7.0, 2.0], "nprobe": 2})
        assert status == 400 and "nprobe" in body["error"]
        # ef COMPOSES with filter (round-3): tuned over-fetch + post-
        # filter; no row carries metadata x -> 200 with an empty result
        status, body = _req(srv, "POST", "/search",
                            {"vector": [7.0, 2.0], "ef": 8,
                             "filter": {"op": "eq", "field": "x",
                                        "value": "1"}})
        assert status == 200 and body == []
        # and with matching metadata the tuned filtered path serves hits
        status, _ = _req(srv, "POST", "/vectors",
                         {"id": "tagged", "vector": [7.0, 2.0],
                          "metadata": {"x": "1"}})
        assert status == 201
        status, body = _req(srv, "POST", "/search",
                            {"vector": [7.0, 2.0], "ef": 64,
                             "filter": {"op": "eq", "field": "x",
                                        "value": "1"}})
        assert status == 200 and [h["id"] for h in body] == ["tagged"]
    finally:
        srv.shutdown()
