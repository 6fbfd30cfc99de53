"""HTTP serving: AppState + a stdlib threaded HTTP server.

Parity with reference src/server/mod.rs:13-51: ``AppState`` holds the store
and metrics behind a readers-writer lock; ``start_flat``/``start_hnsw``
build the state and serve. The transport is a stdlib ThreadingHTTPServer
(zero dependencies); route logic lives in routes.Api, which the reference-
style in-process tests drive directly.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple
from urllib.parse import unquote

from ..distance import DistanceMetric
from ..index.hnsw import HnswIndex, HnswParams
from ..metrics import MetricsCollector
from ..store import VectorStore
from ..utils.locks import RwLock
from .routes import Api


class VdbHTTPServer(ThreadingHTTPServer):
    """Threaded server tuned for bursty concurrent clients: the stdlib
    default listen backlog of 5 drops connections the moment requests
    queue (e.g. while the batcher coalesces a window)."""
    request_queue_size = 256
    daemon_threads = True


class AppState:
    """Shared server state (reference: src/server/mod.rs:13-16).

    ``store`` is anything exposing the VectorStore surface — an in-memory
    VectorStore or a persistence.StorageEngine (durable serving)."""

    def __init__(self, store: "VectorStore",
                 metrics: Optional[MetricsCollector] = None):
        self.store = store
        self.metrics = metrics or MetricsCollector()
        self.lock = RwLock()


def _make_handler(api: Api):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _read_body(self):
            length = int(self.headers.get("Content-Length") or 0)
            if length == 0:
                return None
            raw = self.rfile.read(length)
            try:
                return json.loads(raw)
            except json.JSONDecodeError:
                return ValueError("invalid JSON body")

        def _respond(self, status: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _dispatch(self) -> None:
            body = self._read_body()
            if isinstance(body, ValueError):
                self._respond(400, {"error": str(body)})
                return
            # strip the query string and URL-decode (so /vectors/some%20id
            # matches the literal ID, like the reference's Path extractor)
            path = unquote(self.path.partition("?")[0])
            try:
                status, payload = api.handle(self.command, path, body)
            except Exception as e:  # defense in depth: never kill the worker
                status, payload = 500, {"error": str(e)}
            self._respond(status, payload)

        do_GET = do_POST = do_DELETE = do_PUT = _dispatch

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def _make_api(state: AppState, batch_window_ms: float) -> Api:
    if batch_window_ms and batch_window_ms > 0:
        from .batcher import QueryBatcher
        batcher = QueryBatcher(state.store, state.lock,
                               window_ms=batch_window_ms)
        return Api(state, batcher=batcher)
    return Api(state)


def serve(addr: str, state: AppState,
          ready_event: Optional[threading.Event] = None,
          batch_window_ms: float = 0.0, backend: str = "auto") -> None:
    """Bind and serve forever (reference: src/server/mod.rs:27-29).

    ``backend``: "native" = the C++ epoll front-end (httpcore.cpp) with
    drain-batched searches; "python" = the stdlib threaded server; "auto"
    (default) = native when the library is available."""
    from ..utils.jit_cache import enable_persistent_jit_cache
    enable_persistent_jit_cache()
    host, port = _split_addr(addr)
    api = _make_api(state, batch_window_ms)
    if backend == "auto":
        from .native_http import native_http_available
        backend = "native" if native_http_available() else "python"
    if backend == "native":
        from .native_http import NativeHttpServer
        server = NativeHttpServer(api, host, port)
        print(f"vectordb-tpu server (native) listening on "
              f"{host}:{server.port}")
        if ready_event is not None:
            ready_event.set()
        try:
            server.serve_forever()
        finally:
            server.shutdown()
        return
    server = VdbHTTPServer((host, port), _make_handler(api))
    print(f"vectordb-tpu server listening on {host}:{server.server_address[1]}")
    if ready_event is not None:
        ready_event.set()
    try:
        server.serve_forever()
    finally:
        server.server_close()


def start_server_background(addr: str, state: AppState) -> Tuple[ThreadingHTTPServer, threading.Thread]:
    """Non-blocking serve for tests/embedding; returns (server, thread)."""
    host, port = _split_addr(addr)
    api = Api(state)
    server = VdbHTTPServer((host, port), _make_handler(api))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread


def _split_addr(addr: str) -> Tuple[str, int]:
    host, _, port = addr.rpartition(":")
    if not host:
        host, port = addr, "3000"
    return host, int(port)


def start_flat(addr: str, metric: DistanceMetric,
               batch_window_ms: float = 0.0, backend: str = "auto",
               search_mode: str = "exact", storage: str = "f32") -> None:
    """Serve an in-memory flat-index store (reference: src/server/mod.rs:19-31)."""
    serve(addr,
          AppState(VectorStore.with_flat_index(metric,
                                               search_mode=search_mode,
                                               storage=storage)),
          batch_window_ms=batch_window_ms, backend=backend)


def start_hnsw(addr: str, metric: DistanceMetric,
               params: Optional[HnswParams] = None,
               batch_window_ms: float = 0.0, backend: str = "auto") -> None:
    """Serve an in-memory HNSW store (reference: src/server/mod.rs:34-51)."""
    index = HnswIndex(metric, params or HnswParams())
    serve(addr, AppState(VectorStore.with_index(index)),
          batch_window_ms=batch_window_ms, backend=backend)


def start_durable(addr: str, data_dir, config=None,
                  batch_window_ms: float = 0.0,
                  backend: str = "auto") -> None:
    """Serve a WAL-backed persistent store (beyond the reference, which
    rejects serve + --data-dir outright: src/main.rs:100-102).

    Every HTTP insert/delete is WAL-first durable before the response is
    sent (routes hold the write lock across the engine call, so WAL
    appends serialize); reads go straight to the recovered store; POST
    /checkpoint forces a snapshot + WAL truncate. Reopening the same
    directory recovers the pre-crash state, including HNSW graph tables
    and trained IVF layouts (persistence/engine.py)."""
    from ..persistence import StorageEngine
    with StorageEngine.open(data_dir, config) as engine:
        serve(addr, AppState(engine), batch_window_ms=batch_window_ms,
              backend=backend)


__all__ = ["AppState", "serve", "start_flat", "start_hnsw",
           "start_durable", "start_server_background"]
