"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment preloads jax via sitecustomize (the axon TPU plugin), so
plain env vars are too late for JAX_PLATFORMS — use jax.config.update
instead, before any backend is initialized. XLA_FLAGS is still read at
backend-init time, so setting it here works for the device count.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
