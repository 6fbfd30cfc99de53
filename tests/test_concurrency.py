"""Concurrency: readers-writer lock semantics and threaded API stress.

The reference gets thread safety from Rust's type system + RwLock
(src/server/mod.rs:13-16); here the equivalent guarantees are exercised
explicitly: lock exclusion invariants and a mixed reader/writer stress run
through the HTTP router.
"""

import threading
import time

import numpy as np
import pytest

from vectordb_tpu.server import test_api as make_test_api
from vectordb_tpu.utils.locks import RwLock


class TestRwLock:
    def test_readers_share(self):
        lock = RwLock()
        inside = []
        barrier = threading.Barrier(3)

        def reader():
            with lock.read():
                barrier.wait(timeout=5)  # all 3 readers inside together
                inside.append(1)

        threads = [threading.Thread(target=reader) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(inside) == 3

    def test_writer_excludes_readers(self):
        lock = RwLock()
        log = []

        def writer():
            with lock.write():
                log.append("w-start")
                time.sleep(0.05)
                log.append("w-end")

        def reader():
            time.sleep(0.01)  # let the writer in first
            with lock.read():
                log.append("r")

        tw = threading.Thread(target=writer)
        tr = threading.Thread(target=reader)
        tw.start()
        tr.start()
        tw.join(timeout=10)
        tr.join(timeout=10)
        assert log == ["w-start", "w-end", "r"]

    def test_writers_exclusive(self):
        lock = RwLock()
        counter = {"v": 0, "max_inside": 0}

        def writer():
            for _ in range(50):
                with lock.write():
                    counter["v"] += 1
                    counter["max_inside"] = max(counter["max_inside"], 1)

        threads = [threading.Thread(target=writer) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert counter["v"] == 200


def test_threaded_api_stress():
    """Concurrent inserts, searches, deletes and metrics reads through the
    router must neither crash nor corrupt the store."""
    api, state = make_test_api()
    dim = 8
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((200, dim)).astype(np.float32)
    errors = []

    def inserter(base):
        try:
            for i in range(50):
                vid = f"t{base}-{i}"
                status, _ = api.handle("POST", "/vectors", {
                    "id": vid, "vector": [float(x) for x in vectors[(base * 50 + i) % 200]],
                    "metadata": {"thread": str(base)}})
                assert status == 201
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher():
        try:
            for _ in range(50):
                status, hits = api.handle("POST", "/search", {
                    "vector": [0.0] * dim, "k": 5})
                assert status == 200
                dists = [h["distance"] for h in hits]
                assert dists == sorted(dists)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def deleter():
        try:
            for i in range(25):
                api.handle("DELETE", f"/vectors/t0-{i}")  # 200 or 404, both fine
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = ([threading.Thread(target=inserter, args=(b,)) for b in range(3)]
               + [threading.Thread(target=searcher) for _ in range(2)]
               + [threading.Thread(target=deleter)])
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors

    status, payload = api.handle("GET", "/health")
    assert status == 200
    # 150 inserted, up to 25 deleted
    assert 125 <= payload["vector_count"] <= 150
    # every remaining id can be fetched consistently
    _, ids = api.handle("GET", "/vectors")
    assert len(ids) == payload["vector_count"]
    for vid in ids[:10]:
        assert api.handle("GET", f"/vectors/{vid}")[0] == 200
