"""Persistent XLA compilation cache setup (shared by CLI, server, bench)."""

from __future__ import annotations

import os


def enable_persistent_jit_cache() -> None:
    """Point JAX at an on-disk compilation cache so short-lived processes
    don't pay the full compile cost every time. Never fails startup."""
    try:
        import jax
        cache_dir = os.environ.get(
            "VDB_TPU_JIT_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "vectordb_tpu", "jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass  # the cache is an optimization; never fail startup over it


__all__ = ["enable_persistent_jit_cache"]
