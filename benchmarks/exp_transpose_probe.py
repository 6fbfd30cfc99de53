"""Probe: cost of top_k over a transposed (T, Q) minima array, with and
without an optimization barrier forcing the transpose to materialize."""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T, Q, M = 65536, 1024, 16
ITERS = 5


def timeit(fn, base):
    np.asarray(jax.tree_util.tree_leaves(fn(base))[0])
    times = []
    for i in range(ITERS):
        x = base + np.float32(i + 1)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(fn(x))[0])
        times.append(time.perf_counter() - t0)
    return min(times)


@jax.jit
def t_only(m_tq):
    return jax.lax.optimization_barrier(m_tq.T).sum()


@jax.jit
def topk_fused(m_tq):
    neg, idx = jax.lax.top_k(-(m_tq.T), M)
    return neg.sum() + idx.sum()


@jax.jit
def topk_barrier(m_tq):
    m_qt = jax.lax.optimization_barrier(m_tq.T)
    neg, idx = jax.lax.top_k(-m_qt, M)
    return neg.sum() + idx.sum()


@jax.jit
def topk_direct(m_qt):
    neg, idx = jax.lax.top_k(-m_qt, M)
    return neg.sum() + idx.sum()


def main():
    from vectordb_tpu.cli import enable_persistent_jit_cache
    enable_persistent_jit_cache()
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(1)
    m_tq = jax.random.uniform(key, (T, Q), dtype=jnp.float32)
    m_qt = jnp.asarray(m_tq.T)
    np.asarray(m_tq.sum() + m_qt.sum())

    print(f"transpose+sum (barrier):  {timeit(t_only, m_tq)*1e3:7.1f} ms")
    print(f"top_k over fused T:       {timeit(topk_fused, m_tq)*1e3:7.1f} ms")
    print(f"top_k over barrier T:     {timeit(topk_barrier, m_tq)*1e3:7.1f} ms")
    print(f"top_k direct (Q, T):      {timeit(topk_direct, m_qt)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
