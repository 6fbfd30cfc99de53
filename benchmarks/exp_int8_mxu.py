"""Probe: does Mosaic lower an int8 x int8 dot_general to the v5e MXU's
native int8 path (~2x bf16 peak)?

The int8-storage coarse scan currently casts codes to bf16 in VMEM and
dots at bf16 speed. If int8 operands run natively, the 16M x 768 scan
(MXU-bound at Q>=512) nearly doubles. Queries would be symmetrically
quantized with an exactly-computed residual, which the 1-pass
certificate already knows how to price (qlo_n term).

Measures three kernels over the same (N, d) tile stream:
  bf16:    codes cast to bf16, bf16 x bf16 dot (the current path)
  int8:    raw int8 x int8 dot, preferred_element_type=int32
  int8f:   raw int8 x int8 dot, preferred_element_type=float32
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def make_kernel(variant: str):
    def kern(q_ref, db_ref, out_ref):
        if variant == "bf16":
            lhs = db_ref[:].astype(jnp.bfloat16)
            rhs = q_ref[:].astype(jnp.bfloat16)
            dots = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "int8":
            dots = jax.lax.dot_general(
                db_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:  # int8f
            dots = jax.lax.dot_general(
                db_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # tile-min reduce so the output is small (mimics the coarse kernel)
        out_ref[:] = dots.reshape(dots.shape[0] // 16, 16,
                                  dots.shape[1]).min(axis=1)
    return kern


def run(variant: str, n: int, d: int, q: int, tn: int, iters: int):
    codes = jnp.asarray(
        np.random.default_rng(0).integers(-127, 128, (n, d), np.int8))
    qcodes = jnp.asarray(
        np.random.default_rng(1).integers(-127, 128, (d, q), np.int8))
    grid_spec = pl.GridSpec(
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((d, q), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn // 16, q), lambda ti: (ti, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((n // 16, q), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d, bytes_accessed=n * d + q * d,
            transcendentals=0),
    )
    fj = jax.jit(f)
    try:
        out = jax.block_until_ready(fj(qcodes, codes))
    except Exception as e:  # noqa: BLE001
        print(f"{variant}: FAILED to compile/run: {type(e).__name__}: "
              f"{str(e)[:300]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fj(qcodes, codes)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    tf = 2 * q * n * d / dt / 1e12
    print(f"{variant}: {dt * 1e3:7.2f} ms  {tf:6.1f} TF/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--q", type=int, default=1024)
    ap.add_argument("--tn", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    n = 1 << args.logn
    print(f"n={n} d={args.d} q={args.q} tn={args.tn} "
          f"device={jax.devices()[0].device_kind}")
    for variant in ("bf16", "int8", "int8f"):
        run(variant, n, args.d, args.q, args.tn, args.iters)


if __name__ == "__main__":
    main()
