"""Depth x client-count sweep of the native HTTP server in ONE process.

Round-4 shipped the depth-N pipelined drain (server/native_http.py:
collector thread overlapping cycle i's collect RPC with cycle i+1's
submit) but never measured it; BASELINE.md still quotes the r2 depth-1
rows. This driver builds the 100k x 256 store once, then for each
pipeline depth starts a fresh NativeHttpServer and runs the raw
selectors client swarm (http_bench.py's --client raw) at each client
count — same-window A/B, one setup cost.

Usage:
  python benchmarks/http_sweep.py [--depths 1,3] \
      [--clients 64,256,1024,2048] [--duration 10] [--out results.jsonl]

Reference serving surface: /root/reference/src/server/mod.rs:19-51 (one
axum task per connection over a RwLock store); same 9-endpoint semantics,
measured here at equal workload.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from http_bench import RAW_CLIENT_CODE  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--depths", default="1,3")
    ap.add_argument("--clients", default="64,256,1024,2048")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from vectordb_tpu import (BatchInsertItem, DistanceMetric, Vector,
                              VectorStore)
    from vectordb_tpu.cli import enable_persistent_jit_cache
    from vectordb_tpu.server.app import AppState
    from vectordb_tpu.server.native_http import NativeHttpServer
    from vectordb_tpu.server.routes import Api

    enable_persistent_jit_cache()
    depths = [int(x) for x in args.depths.split(",")]
    client_counts = [int(x) for x in args.clients.split(",")]

    rng = np.random.default_rng(0)
    data = rng.standard_normal((args.n, args.d)).astype(np.float32)
    store = VectorStore.with_flat_index(DistanceMetric.EUCLIDEAN)
    store.insert_batch([BatchInsertItem(f"v{i}", Vector(data[i]))
                        for i in range(args.n)])
    api = Api(AppState(store))

    # warm every pow2 query-batch bucket the drain-batcher can produce
    qmax = 1
    while qmax < max(client_counts):
        qmax *= 2
    qb = 1
    while qb <= qmax:
        store.search_batch([(Vector(data[i % args.n]), 10)
                            for i in range(qb)])
        qb *= 2
        print(f"warmed Q-bucket {qb // 2}", flush=True)

    rows = []
    for depth in depths:
        server = NativeHttpServer(api, "127.0.0.1", 0,
                                  pipeline_depth=depth)
        server.start_background()
        port = server.port
        import urllib.request
        body = json.dumps({"vector": [0.0] * args.d, "k": 10}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search", data=body, method="POST")
        urllib.request.urlopen(req, timeout=300).read()
        for nc in client_counts:
            out = subprocess.run(
                [sys.executable, "-c", RAW_CLIENT_CODE, str(port),
                 str(nc), str(args.duration), "search", str(args.d)],
                capture_output=True, text=True,
                timeout=args.duration + 180)
            try:
                res = json.loads(out.stdout.strip().splitlines()[-1])
            except Exception:
                print(f"depth={depth} clients={nc}: client failed\n"
                      f"{out.stdout}\n{out.stderr}", flush=True)
                continue
            row = {"depth": depth, "clients": nc, "n": args.n,
                   "d": args.d, "duration": args.duration,
                   "rps": round(res["rps"], 1),
                   "errors": res["errors"], "ts": time.time()}
            rows.append(row)
            print(json.dumps(row), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(row) + "\n")
        server.shutdown()
        time.sleep(1.0)

    # summary table
    print("\ndepth " + " ".join(f"{c:>8d}" for c in client_counts),
          flush=True)
    for depth in depths:
        vals = {r["clients"]: r["rps"] for r in rows
                if r["depth"] == depth}
        print(f"{depth:>5d} " + " ".join(
            f"{vals.get(c, float('nan')):>8.0f}" for c in client_counts),
            flush=True)


if __name__ == "__main__":
    main()
