"""Tracing/profiling helpers smoke tests."""

import jax.numpy as jnp

from vectordb_tpu.utils.profiling import annotate, timed, trace


def test_timed_blocks_on_device_value():
    with timed() as t:
        value = t.block_on(jnp.sum(jnp.arange(1000.0)))
    assert t.seconds >= 0.0
    assert float(value) == 499500.0


def test_timed_without_value():
    with timed() as t:
        pass
    assert t.seconds >= 0.0


def test_annotate_context():
    with annotate("unit-test-span"):
        x = jnp.ones((8, 8)).sum()
    assert float(x) == 64.0


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        jnp.ones((16, 16)).sum().block_until_ready()
    # the profiler must have produced artifacts under the log dir
    produced = list(tmp_path.rglob("*"))
    assert produced, "no trace artifacts written"
