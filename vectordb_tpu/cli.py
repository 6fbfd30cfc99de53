"""Command-line interface.

Capability parity with reference src/main.rs:10-198:
  * global flags: ``--index {flat,hnsw}`` (default flat) and ``--data-dir``
    (persistent mode)
  * subcommands: insert ID --vector CSV | search QUERY --k 5 | delete ID |
    list | serve --addr 0.0.0.0:3000
  * serve + --data-dir is rejected (main.rs:100-102); durable serving is
    the explicit ``serve --durable-dir DIR`` extension (WAL-first writes,
    crash recovery on reopen, POST /checkpoint)
  * metric is Euclidean everywhere, matching the reference defaults
    (main.rs:158, 178); override with --metric
  * same user-facing output strings as the reference handlers
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from .distance import DistanceMetric
from .errors import IndexOpError, VectorDbError
from .index.hnsw import HnswIndex, HnswParams
from .store import VectorStore
from .vector import Vector


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="vectordb-tpu",
        description="A TPU-native vector database built from scratch")
    parser.add_argument("--index",
                        choices=["flat", "hnsw", "ivf", "pq", "ivfpq"],
                        default="flat",
                        help="Index type to use for search")
    parser.add_argument("--data-dir", default=None,
                        help="Data directory for persistence. If set, data "
                             "is persisted to disk.")
    parser.add_argument("--metric",
                        choices=[m.value for m in DistanceMetric],
                        default="euclidean", help="Distance metric")
    parser.add_argument("--search-mode", choices=["exact", "fast"],
                        default="exact",
                        help="Flat scan mode: exact full-precision, or the "
                             "two-tier fast path (~1.4x throughput, exact "
                             "distances, ~99%% top-k id agreement)")
    parser.add_argument("--storage", choices=["f32", "bf16", "int8"],
                        default="f32",
                        help="Flat-index vector storage: f32 (default) or "
                             "bf16 (half the device memory, 2x the rows "
                             "per chip; vectors quantized at insert, "
                             "search certified-exact over stored values)")
    sub = parser.add_subparsers(dest="command", required=True)

    p_insert = sub.add_parser("insert", help="Insert a vector")
    p_insert.add_argument("id", help="Vector ID")
    p_insert.add_argument("-v", "--vector", required=True,
                          help='Vector data as comma-separated values '
                               '(e.g., "1.0,2.0,3.0")')

    p_search = sub.add_parser("search", help="Search for similar vectors")
    p_search.add_argument("query", help='Query vector as comma-separated '
                                        'values (e.g., "1.0,2.0,3.0")')
    p_search.add_argument("-k", type=int, default=None,
                          help="Number of results to return (default 5; "
                               "mutually exclusive with --radius)")
    p_search.add_argument("--ef", type=int, default=None,
                          help="HNSW beam width for this query "
                               "(requires --index hnsw)")
    p_search.add_argument("--radius", type=float, default=None,
                          help="Range query: return every vector within "
                               "this distance instead of the top k "
                               "(capped at --limit results)")
    p_search.add_argument("--limit", type=int, default=100,
                          help="Result cap for --radius queries")
    p_search.add_argument("--nprobe", type=int, default=None,
                          help="IVF clusters to probe for this query "
                               "(requires --index ivf)")
    p_search.add_argument("--refine", type=int, default=None,
                          help="PQ candidates to re-rank exactly for this "
                               "query (requires --index pq or ivfpq)")

    p_delete = sub.add_parser("delete", help="Delete a vector")
    p_delete.add_argument("id", help="Vector ID to delete")

    sub.add_parser("list", help="List all vector IDs")

    p_serve = sub.add_parser("serve", help="Start the HTTP API server")
    p_serve.add_argument("--addr", default="0.0.0.0:3000",
                         help="Address to bind to")
    p_serve.add_argument("--durable-dir", default=None,
                         help="Serve a WAL-backed persistent store from "
                              "this directory (beyond the reference, which "
                              "rejects serve + --data-dir): inserts/deletes "
                              "are durable before the response, reopening "
                              "recovers state, and POST /checkpoint forces "
                              "a snapshot")
    p_serve.add_argument("--batch-window-ms", type=float, default=0.0,
                         help="Coalesce concurrent searches into one device "
                              "call within this window (0 = disabled; the "
                              "native backend drain-batches regardless)")
    p_serve.add_argument("--http", choices=["auto", "native", "python"],
                         default="auto",
                         help="HTTP backend: the C++ epoll front-end "
                              "(native), the stdlib threaded server "
                              "(python), or auto-detect")
    return parser


def _run_commands(db, args) -> int:
    """Shared command dispatch for in-memory stores and the persistent
    engine (reference: main.rs:65-150 duplicates this; the surfaces are
    identical so one function serves both)."""
    if args.command == "insert":
        v = Vector.from_str(args.vector)
        db.insert(args.id, v)
        print(f"Inserted vector with ID: {args.id}")
    elif args.command == "search":
        q = Vector.from_str(args.query)
        if args.radius is not None:
            # same contract as the HTTP surface (routes.py): k and the
            # recall knobs are mutually exclusive with a range query
            if args.k is not None:
                raise IndexOpError(
                    "-k and --radius are mutually exclusive")
            if (args.ef is not None or args.nprobe is not None
                    or args.refine is not None):
                raise IndexOpError(
                    "--ef/--nprobe/--refine cannot be combined with "
                    "--radius")
            results = db.search_radius(q, args.radius, limit=args.limit)
        else:
            k = 5 if args.k is None else args.k
            results = db.search(q, k, ef=args.ef, nprobe=args.nprobe,
                                refine=args.refine)
        if not results:
            print("No results found (store is empty)"
                  if args.radius is None else "No results within radius")
        else:
            print(f"Top {len(results)} results:")
            for i, r in enumerate(results):
                print(f"{i + 1}. {r.id} (distance: {r.distance:.4f})")
    elif args.command == "delete":
        db.delete(args.id)
        print(f"Deleted vector with ID: {args.id}")
    elif args.command == "list":
        ids = db.list_ids()
        if not ids:
            print("No vectors in store")
        else:
            print(f"Vector IDs ({len(ids)} total):")
            for vid in ids:
                print(f"  - {vid}")
    return 0


# re-exported for callers that import it from here (server, bench)
from .utils.jit_cache import enable_persistent_jit_cache  # noqa: E402


def _pq_family_index(kind: str, metric: DistanceMetric):
    if kind == "ivfpq":
        from .index.ivfpq import IvfPqIndex
        return IvfPqIndex(metric)
    from .index.pq import PqFlatIndex
    return PqFlatIndex(metric)


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    enable_persistent_jit_cache()
    metric = DistanceMetric.from_name(args.metric)
    if args.index in ("pq", "ivfpq") and args.storage != "f32":
        print(f"Error: --index {args.index} owns its device representation "
              "(codes); --storage does not compose with it.",
              file=sys.stderr)
        return 1
    try:
        if args.command == "serve":
            if args.data_dir:
                # reference main.rs:100-102 (durable serving is the
                # explicit opt-in `serve --durable-dir` extension instead)
                print("Error: Serve command is not supported with --data-dir "
                      "(persistent storage). Use in-memory mode, or "
                      "`serve --durable-dir DIR` for a WAL-backed server.",
                      file=sys.stderr)
                return 1
            if args.durable_dir:
                from .persistence import EngineConfig
                from .server.app import start_durable
                config = EngineConfig(checkpoint_interval=1000,
                                      metric=metric,
                                      index_type=args.index,
                                      search_mode=args.search_mode,
                                      storage=args.storage)
                start_durable(args.addr, args.durable_dir, config,
                              batch_window_ms=args.batch_window_ms,
                              backend=args.http)
                return 0
            from .server import start_flat, start_hnsw
            if args.index == "ivf":
                from .index.ivf import IvfFlatIndex
                from .server.app import AppState, serve
                serve(args.addr,
                      AppState(VectorStore.with_index(
                          IvfFlatIndex(metric, storage=args.storage))),
                      batch_window_ms=args.batch_window_ms,
                      backend=args.http)
                return 0
            if args.index in ("pq", "ivfpq"):
                from .server.app import AppState, serve
                serve(args.addr,
                      AppState(VectorStore.with_index(
                          _pq_family_index(args.index, metric))),
                      batch_window_ms=args.batch_window_ms,
                      backend=args.http)
                return 0
            if args.index == "hnsw":
                start_hnsw(args.addr, metric, HnswParams(),
                           batch_window_ms=args.batch_window_ms,
                           backend=args.http)
            else:
                start_flat(args.addr, metric,
                           batch_window_ms=args.batch_window_ms,
                           backend=args.http, search_mode=args.search_mode,
                           storage=args.storage)
            return 0

        if args.data_dir:
            from .persistence import EngineConfig, StorageEngine
            # unlike the reference (engine.rs:33 hard-wires flat), --index
            # hnsw also works in persistent mode, with fast graph reopen
            config = EngineConfig(checkpoint_interval=1000, metric=metric,
                                  index_type=args.index,
                                  search_mode=args.search_mode,
                                  storage=args.storage)
            with StorageEngine.open(args.data_dir, config) as engine:
                return _run_commands(engine, args)

        if args.index == "ivf":
            from .index.ivf import IvfFlatIndex
            store = VectorStore.with_index(
                IvfFlatIndex(metric, storage=args.storage))
        elif args.index in ("pq", "ivfpq"):
            store = VectorStore.with_index(
                _pq_family_index(args.index, metric))
        elif args.index == "hnsw":
            store = VectorStore.with_index(HnswIndex(metric, HnswParams()))
        else:
            from .index.flat import FlatIndex
            store = VectorStore.with_index(
                FlatIndex(metric, search_mode=args.search_mode,
                          storage=args.storage))
        return _run_commands(store, args)
    except VectorDbError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
