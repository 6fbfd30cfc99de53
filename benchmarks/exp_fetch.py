"""Probe: cost of multiple device->host fetches through the relay, and
whether packing outputs into one array or jax.device_get on a tuple helps."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

Q, K = 2048, 16
ITERS = 5


@jax.jit
def make(x):
    d = jnp.abs(x[:, :K])
    i = (x[:, K:2 * K] * 100).astype(jnp.int32)
    c = x[:, 0] > 0
    return d, i, c


@jax.jit
def make_packed(x):
    d = jnp.abs(x[:, :K])
    i = (x[:, K:2 * K] * 100).astype(jnp.int32)
    c = x[:, 0] > 0
    packed = jnp.concatenate(
        [d, jax.lax.bitcast_convert_type(i, jnp.float32),
         c.astype(jnp.float32)[:, None]], axis=1)
    return packed


def timeit(fn, base):
    fn(base)
    ts = []
    for i in range(ITERS):
        x = base + np.float32(i + 1)
        t0 = time.perf_counter()
        fn(x)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    base = jax.random.normal(key, (Q, 64), dtype=jnp.float32)
    np.asarray(base.sum())

    def three_fetches(x):
        d, i, c = make(x)
        return np.asarray(d), np.asarray(i), np.asarray(c)

    def device_get_tuple(x):
        return jax.device_get(make(x))

    def one_packed(x):
        p = np.asarray(make_packed(x))
        d = p[:, :K]
        i = p[:, K:2 * K].view(np.int32)
        c = p[:, 2 * K] != 0.0
        return d, i, c

    print(f"3x np.asarray:     {timeit(three_fetches, base)*1e3:7.1f} ms")
    print(f"device_get(tuple): {timeit(device_get_tuple, base)*1e3:7.1f} ms")
    print(f"packed single:     {timeit(one_packed, base)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
