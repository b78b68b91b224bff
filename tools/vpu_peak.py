"""Empirical VPU speed-of-light on the attached TPU.

The public spec sheets give MXU FLOPs but not VPU elementwise throughput,
so the SMC' kernel roofline (docs/DESIGN.md) is anchored to two measured
micro-kernels on shapes matching the production kernel's working set
((tb, M, 128) f32 blocks resident in VMEM):

* fma  — chains of a = a * b + c        (pure ALU issue rate)
* roll — chains of a = a + roll(a, 1)   (the sublane-rotate pattern the
          SMC' scans are made of; rotates can be slower than ALU ops)

Prints element-ops/s for each, where one op = one elementwise operation
over a (4, 16, 128) f32 block element (mul+add in an fma counts as 2).

Usage: python tools/vpu_peak.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, M, LANES = 4, 16, 128
INNER = 4096  # fma/roll steps per grid step


STREAMS = 4  # independent dependence chains so the issue rate, not the
# ALU latency, is what saturates


def _fma_kernel(a_ref, b_ref, c_ref, o_ref):
    b, c = b_ref[...], c_ref[...]
    init = tuple(a_ref[...] * (1.0 + 0.01 * k) for k in range(STREAMS))

    def body(i, accs):
        return tuple(a * b + c for a in accs)

    accs = lax.fori_loop(jnp.int32(0), jnp.int32(INNER), body, init)
    o_ref[...] = sum(accs)


def _roll_kernel(a_ref, b_ref, c_ref, o_ref):
    b = b_ref[...]
    init = tuple(a_ref[...] * (1.0 + 0.01 * k) for k in range(STREAMS))

    def body(i, accs):
        return tuple(b * a + pltpu.roll(a, jnp.int32(1), 1) for a in accs)

    accs = lax.fori_loop(jnp.int32(0), jnp.int32(INNER), body, init)
    o_ref[...] = sum(accs)


@functools.partial(jax.jit, static_argnames=("which", "grid"))
def run(a, b, c, which: str, grid: int):
    kern = _fma_kernel if which == "fma" else _roll_kernel
    spec = pl.BlockSpec((TB, M, LANES), lambda g: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(grid,), in_specs=[spec] * 3, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((TB, M, LANES), jnp.float32),
    )(a, b, c)


def measure(which: str, grid: int = 64, reps: int = 5) -> float:
    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (TB, M, LANES), jnp.float32, 0.5, 1.0)
    b = jnp.full((TB, M, LANES), 0.999, jnp.float32)
    c = 0.001 * a

    def sync(o):
        return float(o.ravel()[0])

    sync(run(a, b, c, which, grid))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(10):
            o = run(a, b, c, which, grid)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / 10)
    elems = TB * M * LANES
    ops_per = 2 if which == "fma" else 3  # mul+add | mul+add+roll
    return grid * INNER * STREAMS * elems * ops_per / best


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    for which in ("fma", "roll"):
        rate = measure(which)
        print(f"{which}: {rate / 1e12:.2f} Tera element-ops/s")


if __name__ == "__main__":
    main()
