"""End-to-end HTTP serving benchmark: native C++ front-end vs the stdlib
Python server, over real sockets with a separate client-swarm process.

Usage:
  python benchmarks/http_bench.py --backend native --n 100000 --d 256 \
      --clients 16 --duration 10 --endpoint search

The server runs in this process (real chip by default); the clients run in
a subprocess (no jax import) so the two Python GILs don't share.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import textwrap
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLIENT_CODE = textwrap.dedent("""
    import http.client, json, sys, threading, time
    port, clients, duration, endpoint, d = (
        int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3]),
        sys.argv[4], int(sys.argv[5]))
    stop = time.monotonic() + duration
    counts = [0] * clients
    errors = [0] * clients

    def run(ci):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        import random
        rnd = random.Random(ci)
        # pre-serialize a pool of distinct bodies BEFORE the clock: the
        # host has one core, so client-side json.dumps inside the loop
        # would bill ~120 us/req of client work to the server measurement
        pool = [json.dumps({"vector": [rnd.gauss(0, 1) for _ in range(d)],
                            "k": 10}).encode() for _ in range(16)]
        pi = 0
        while time.monotonic() < stop:
            try:
                if endpoint == "health":
                    conn.request("GET", "/health")
                else:
                    pi = (pi + 1) % len(pool)
                    conn.request("POST", "/search", body=pool[pi],
                        headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
                if resp.status != 200:
                    errors[ci] += 1
                else:
                    counts[ci] += 1
            except Exception:
                errors[ci] += 1
                try:
                    conn.close()
                except Exception:
                    pass
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=30)
        conn.close()

    threads = [threading.Thread(target=run, args=(ci,))
               for ci in range(clients)]
    t0 = time.monotonic()
    for t in threads: t.start()
    for t in threads: t.join()
    elapsed = time.monotonic() - t0
    print(json.dumps({"requests": sum(counts), "errors": sum(errors),
                      "elapsed": elapsed,
                      "rps": sum(counts) / elapsed}))
""")


RAW_CLIENT_CODE = textwrap.dedent("""
    import json, random, selectors, socket, sys, time
    port, clients, duration, endpoint, d = (
        int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3]),
        sys.argv[4], int(sys.argv[5]))

    # Pre-built raw HTTP/1.1 request bytes: the load generator spends
    # ~20 us/req instead of http.client's ~400 us — on this single-core
    # host the client would otherwise starve the server under test.
    # Semantics are unchanged: N persistent connections, each closed-loop
    # (one request in flight, next sent only after the full response).
    reqs = []
    rnd = random.Random(7)
    for _ in range(16):
        if endpoint == "health":
            reqs.append(b"GET /health HTTP/1.1\\r\\nHost: x\\r\\n\\r\\n")
        else:
            body = json.dumps({"vector": [rnd.gauss(0, 1)
                                          for _ in range(d)],
                               "k": 10}).encode()
            reqs.append(b"POST /search HTTP/1.1\\r\\nHost: x\\r\\n"
                        b"Content-Type: application/json\\r\\n"
                        b"Content-Length: " + str(len(body)).encode()
                        + b"\\r\\n\\r\\n" + body)

    sel = selectors.DefaultSelector()

    class Conn:
        __slots__ = ("sock", "buf", "need", "pi", "ok", "err")
        def __init__(self, i):
            self.sock = socket.create_connection(("127.0.0.1", port))
            self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.sock.setblocking(False)
            self.buf = b""
            self.need = -1
            self.pi = i % len(reqs)
            self.ok = 0
            self.err = 0
            sel.register(self.sock, selectors.EVENT_READ, self)
            self.send()
        def send(self):
            self.pi = (self.pi + 1) % len(reqs)
            self.sock.sendall(reqs[self.pi])
            self.buf = b""
            self.need = -1
        def feed(self):
            data = self.sock.recv(65536)
            if not data:
                raise ConnectionError
            self.buf += data
            while True:
                if self.need < 0:
                    he = self.buf.find(b"\\r\\n\\r\\n")
                    if he < 0:
                        return
                    head = self.buf[:he]
                    cl = head.lower().find(b"content-length:")
                    ln = int(head[cl + 15:head.index(b"\\r\\n", cl)]) \\
                        if cl >= 0 else 0
                    if head[9:12] == b"200":
                        self.ok += 1
                    else:
                        self.err += 1
                    self.need = he + 4 + ln
                if len(self.buf) < self.need:
                    return
                self.buf = self.buf[self.need:]
                self.need = -1
                self.send()
                return

    conns = [Conn(i) for i in range(clients)]
    t0 = time.monotonic()
    stop = t0 + duration
    while time.monotonic() < stop:
        for key, _ in sel.select(timeout=0.2):
            c = key.data
            try:
                c.feed()
            except Exception:
                c.err += 1
                try:
                    sel.unregister(c.sock); c.sock.close()
                except Exception:
                    pass
                try:
                    conns[conns.index(c)] = Conn(c.pi)
                except Exception:
                    pass
    elapsed = time.monotonic() - t0
    total = sum(c.ok for c in conns)
    errors = sum(c.err for c in conns)
    print(json.dumps({"requests": total, "errors": errors,
                      "elapsed": elapsed, "rps": total / elapsed}))
""")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["native", "python"],
                    default="native")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--endpoint", choices=["search", "health"],
                    default="search")
    ap.add_argument("--client", choices=["httplib", "raw"],
                    default="httplib",
                    help="raw = single-thread selectors client with "
                         "pre-built request bytes (~20x cheaper per "
                         "request on this single-core host)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the store on the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from vectordb_tpu import DistanceMetric, VectorStore
    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.server.app import AppState, _make_handler, VdbHTTPServer
    from vectordb_tpu.server.routes import Api

    enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    data = rng.standard_normal((args.n, args.d)).astype(np.float32)
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
    from vectordb_tpu import BatchInsertItem, Vector
    store.insert_batch([BatchInsertItem(f"v{i}", Vector(data[i]))
                        for i in range(args.n)])
    state = AppState(store)
    api = Api(state)

    if args.backend == "native":
        from vectordb_tpu.server.native_http import NativeHttpServer
        server = NativeHttpServer(api, "127.0.0.1", 0)
        server.start_background()
        port = server.port
    else:
        httpd = VdbHTTPServer(("127.0.0.1", 0), _make_handler(api))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        port = httpd.server_address[1]

    # warm the device path: compile every pow2 query-batch bucket the
    # drain-batcher can produce for this client count, so the timed window
    # measures steady state rather than jit compiles
    qmax = 1
    while qmax < args.clients:
        qmax *= 2
    qb = 1
    while qb <= qmax:
        queries = [(Vector(data[i % args.n]), 10) for i in range(qb)]
        store.search_batch(queries)
        qb *= 2
    import urllib.request
    body = json.dumps({"vector": [0.0] * args.d, "k": 10}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/search",
                                 data=body, method="POST")
    urllib.request.urlopen(req, timeout=300).read()

    code = RAW_CLIENT_CODE if args.client == "raw" else CLIENT_CODE
    out = subprocess.run(
        [sys.executable, "-c", code, str(port), str(args.clients),
         str(args.duration), args.endpoint, str(args.d)],
        capture_output=True, text=True, timeout=args.duration + 120)
    print(out.stdout.strip())
    if out.returncode != 0:
        print(out.stderr, file=sys.stderr)
    result = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"backend={args.backend} endpoint={args.endpoint} "
          f"client={args.client} n={args.n} d={args.d} "
          f"clients={args.clients}: "
          f"{result['rps']:.0f} req/s ({result['errors']} errors)")


if __name__ == "__main__":
    main()
