"""Compile-sanity check for the full jitted SVGD training step on TPU.

Builds the production-shaped training program (500 particles, S=5,
2.5 kb chunks) and times build / compile+first-step / steady-state step.
Run this FIRST after any change to the transition assembly or the step
graph: a pathological XLA:TPU compile (observed once with a
stack/slice-based associative-scan combine — >10 min, never finished)
shows up here before it can wedge anything else.  Never kill this
mid-compile on the tunneled TPU backend; see .claude/skills/verify.

Usage: python tools/step_compile.py [steps_per_call]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

t0 = time.time()
from phlash_tpu.training import build_training  # noqa: E402

spc = int(sys.argv[1]) if len(sys.argv) > 1 else 1
rng = np.random.default_rng(0)
chunks = rng.binomial(1, 0.05, size=(2000, 2500)).astype(np.int8)
afs = rng.integers(100, 1000, size=9).astype(np.int64)
prog = build_training(
    chunks,
    afs,
    window_size=100,
    overlap=500,
    key=jax.random.PRNGKey(0),
    options=dict(
        num_particles=500, minibatch_size=5, niter=100, steps_per_call=spc
    ),
)
print(f"[{time.time() - t0:6.1f}s] built (steps_per_call={spc})", flush=True)
step = jax.jit(prog.step)
key = jax.random.PRNGKey(1)
out = step(prog.state, key)
jax.block_until_ready(jax.tree.leaves(out.particles)[0])
print(f"[{time.time() - t0:6.1f}s] compiled + first step", flush=True)
best = 1e9
for _ in range(3):
    t1 = time.perf_counter()
    s = prog.state
    for _ in range(10):
        s = step(s, key)
    jax.tree.leaves(s.particles)[0].block_until_ready()
    best = min(best, (time.perf_counter() - t1) / 10)
print(
    f"full step ({spc} SVGD iter/call): {best * 1e3:.2f} ms/call, "
    f"{best * 1e3 / spc:.2f} ms/iter",
    flush=True,
)
