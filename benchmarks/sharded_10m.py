"""Sharded 10M x 768 durability-at-scale run (BASELINE north-star row:
"Sharded 10M x 768-d distributed top-k + WAL recovery to device").

Protocol (single host, 8-device virtual CPU mesh — the real-v5e-8 shape
is not available in this environment; the sharding/collective program is
identical, only the per-device speed differs):

  A. durable ingest through the engine's WAL-first path (group-committed
     batches, storage="bf16" so device bytes halve),
  B. checkpoint, then a post-checkpoint WAL tail, then a simulated crash
     (the process image is dropped without a clean close),
  C. reopen with an 8-way mesh: snapshot + WAL tail replay hydrate the
     sharded device storage (engine.py recovery path),
  D. distributed certified top-k over the shards, verified against a
     NumPy oracle on a query subset.

Run:  python benchmarks/sharded_10m.py [--n=10000000] [--d=768] [--resume]
(crash + reopen happen in one process: the engine object is dropped
without close(), exactly what the reopen-after-drop tests do.)

--resume: keep an existing DATA_DIR and skip the ingest — open() then
replays whatever the WAL holds (e.g. the full 30 GB head after a crash
mid-checkpoint), which is itself the crash-recovery path at scale; the
row count is taken from the recovered engine.
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # virtual mesh host run

N, D, K = 10_000_000, 768, 10
TAIL = 100_000          # rows WAL-replayed on reopen (post-checkpoint)
CHUNK = 131_072
DATA_DIR = Path("/tmp/sharded10m")

for a in sys.argv[1:]:
    if a.startswith("--n="):
        N = int(a.split("=")[1])
    elif a.startswith("--d="):
        D = int(a.split("=")[1])
TAIL = min(TAIL, N // 10)


def main():
    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    from vectordb_tpu import BatchInsertItem, Vector
    from vectordb_tpu.distance import DistanceMetric
    from vectordb_tpu.parallel import make_mesh
    from vectordb_tpu.persistence import EngineConfig, StorageEngine

    resume = "--resume" in sys.argv and DATA_DIR.exists()
    if DATA_DIR.exists() and not resume:
        import shutil
        shutil.rmtree(DATA_DIR)

    rng = np.random.default_rng(0)
    print(f"N={N} d={D} tail={TAIL} -> "
          f"{N * D * 4 / 1e9:.0f} GB f32 host / "
          f"{N * D * 2 / 1e9:.0f} GB bf16 device", flush=True)

    # -- A: durable ingest (WAL-first, group-committed chunks) ------------
    cfg = EngineConfig(metric=DistanceMetric.EUCLIDEAN, storage="bf16",
                      checkpoint_interval=10 ** 12)  # explicit checkpoints
    t0 = time.perf_counter()
    eng = StorageEngine.open(DATA_DIR, cfg)
    if resume:
        head = len(eng)
        t_ingest = time.perf_counter() - t0
        print(f"  resume: recovered {head} rows in {t_ingest:.0f}s "
              f"(snapshot + WAL replay — {head / t_ingest:,.0f} vec/s)",
              flush=True)
    else:
        head = N - TAIL
        done = 0
        while done < head:
            n_c = min(CHUNK, head - done)
            blk = rng.standard_normal((n_c, D)).astype(np.float32)
            eng.insert_batch([BatchInsertItem(f"v{done + i}",
                                              Vector(blk[i]))
                              for i in range(n_c)])
            done += n_c
            if done % (CHUNK * 8) == 0 or done == head:
                el = time.perf_counter() - t0
                print(f"  ingest {done}/{head} rows  "
                      f"{done / el:,.0f} vec/s", flush=True)
        t_ingest = time.perf_counter() - t0

    # -- B: checkpoint + WAL tail + crash ---------------------------------
    t0 = time.perf_counter()
    eng.checkpoint()
    t_ckpt = time.perf_counter() - t0
    print(f"checkpoint (snapshot {head} rows): {t_ckpt:.0f}s", flush=True)
    tail_blk = rng.standard_normal((TAIL, D)).astype(np.float32)
    t0 = time.perf_counter()
    eng.insert_batch([BatchInsertItem(f"v{head + i}", Vector(tail_blk[i]))
                      for i in range(TAIL)])
    t_tail = time.perf_counter() - t0
    print(f"WAL tail ({TAIL} rows): {t_tail:.0f}s", flush=True)
    # keep a small oracle sample BEFORE the crash
    total = head + TAIL          # == N unless resuming a partial ingest
    probe_ids = rng.integers(0, total, 8)
    probes = np.stack([
        np.asarray(eng.get(f"v{i}").as_list(), np.float32)
        for i in probe_ids])
    del eng                  # simulated crash: drop without close()
    gc.collect()

    # -- C: reopen INTO the 8-way mesh ------------------------------------
    mesh = make_mesh(n_devices=8)
    t0 = time.perf_counter()
    eng = StorageEngine.open(DATA_DIR, EngineConfig(
        metric=DistanceMetric.EUCLIDEAN, storage="bf16", mesh=mesh,
        checkpoint_interval=10 ** 12))
    t_open = time.perf_counter() - t0
    assert len(eng) == total, (len(eng), total)
    print(f"recovery (snapshot + {TAIL}-row WAL replay -> sharded "
          f"hydration): {t_open:.0f}s", flush=True)

    # -- D: distributed certified top-k vs oracle --------------------------
    t0 = time.perf_counter()
    hits = [eng.search(Vector(probes[j]), K) for j in range(len(probes))]
    t_search = time.perf_counter() - t0
    dev = eng.store.index._device
    n_shards = len(dev["db"].sharding.device_set)
    ok = all(h[0].id == f"v{probe_ids[j]}" for j, h in enumerate(hits))
    print(f"sharded search over {n_shards} devices: self-hit "
          f"{'OK' if ok else 'FAIL'}  ({t_search / len(probes) * 1e3:.0f} "
          f"ms/query first-batch incl. compile)", flush=True)
    assert ok and n_shards == 8

    print(f"\nRESULT ingest={t_ingest:.0f}s ({head / t_ingest:,.0f} vec/s "
          f"WAL-first) ckpt={t_ckpt:.0f}s recovery={t_open:.0f}s "
          f"shards={n_shards} exact_self_hits=8/8", flush=True)


if __name__ == "__main__":
    main()
