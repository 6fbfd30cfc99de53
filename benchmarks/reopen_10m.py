"""Reopen-only probe of the 10M x 768 sharded recovery path.

Opens an EXISTING /tmp/sharded10m data dir (30 GB snapshot written by
benchmarks/sharded_10m.py) into an 8-way virtual mesh with
VDB_RECOVER_TIMING marks, runs one sharded search, and prints the phase
breakdown — the fast iteration loop for the recovery-time levers
(BASELINE.md: r4 measured walk 0 s + apply 340 s + hydration 252 s =
593 s; target < 500 s). The full crash protocol (checkpoint + WAL tail +
drop without close) lives in sharded_10m.py --resume; this probe only
re-measures the reopen itself.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("VDB_RECOVER_TIMING", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

DATA_DIR = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sharded10m")


def main():
    from vectordb_tpu import Vector
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.parallel import make_mesh
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    mesh = make_mesh(n_devices=8)
    t0 = time.perf_counter()
    eng = StorageEngine.open(DATA_DIR, EngineConfig(
        metric=DistanceMetric.EUCLIDEAN, storage="bf16", mesh=mesh,
        checkpoint_interval=10 ** 12))
    t_open = time.perf_counter() - t0
    n = len(eng)
    idx = eng.store.index
    print(f"reopen: {t_open:.0f}s for {n} rows "
          f"(host rows dtype={idx._vectors.dtype})", flush=True)
    rng = np.random.default_rng(7)
    pid = int(rng.integers(0, n))
    probe = np.asarray(eng.get(f"v{pid}").as_list(), np.float32)
    t0 = time.perf_counter()
    hits = eng.search(Vector(probe), 10)
    print(f"self-hit: {'OK' if hits[0].id == f'v{pid}' else 'FAIL'} "
          f"({time.perf_counter() - t0:.1f}s first sharded search incl. "
          f"compile; shards="
          f"{len(idx._device['db'].sharding.device_set)})", flush=True)
    assert hits[0].id == f"v{pid}"


if __name__ == "__main__":
    main()
