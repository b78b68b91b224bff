"""Ablation profile of the full SVGD step: where do the milliseconds go?

The kernel roofline (docs/DESIGN.md) says per-site work is done; this tool
answers the follow-up — at production shapes, how much of a step is kernel
time vs the parameter-graph assembly, the warmup filter, the AFS term and
the SVGD/optimizer update.  It times the SAME jitted step function the
driver runs, then re-times it with one component ablated at a time:

  full        the production step (B particles, S chunks, AFS, warmup)
  -afs        afs=None (removes etbl/esfs + xlogy and their VJPs)
  -warmup     overlap=0 (pi passthrough instead of the filter kernel)
  -sites      chunk body shrunk to 64 sites (leaves per-step fixed costs)
  svgd-only   step with a constant-gradient stub (Gram matrix + optax only)

plus the isolated fwd+grad kernel call at the same shape (as bench.py).
Differences between rows are fused-graph estimates, not exact — XLA may
fuse differently per variant — but they localize the dominant cost.

Amortized-dispatch timing (see bench.py's module docstring for why).

Usage: python tools/step_profile.py [--particles 500] [--chunk 2000]
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def amortized_ms(fn, *args, reps: int = 3, inner: int = 10) -> float:
    "Best amortized per-call latency in milliseconds."

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:8]))

    sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def build(chunks: np.ndarray, afs, overlap: int, options: dict):
    from phlash_tpu.training import build_training

    prog = build_training(
        chunks,
        afs,
        window_size=100,
        overlap=overlap,
        key=jax.random.PRNGKey(0),
        options=options,
    )
    return prog


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--overlap", type=int, default=500)
    ap.add_argument("--nchunks", type=int, default=2000)
    args = ap.parse_args()

    B, L, O, N = args.particles, args.chunk, args.overlap, args.nchunks
    rng = np.random.default_rng(0)
    chunks = rng.binomial(1, 0.05, size=(N, O + L)).astype(np.int8)
    afs = rng.integers(100, 1000, size=9).astype(np.int64)
    opts = dict(num_particles=B, minibatch_size=5, niter=100, progress=False)
    key = jax.random.PRNGKey(1)

    rows = {}

    def record(name, value):
        rows[name] = value
        print(f"{name:28s} {value:8.2f} ms", flush=True)

    prog = build(chunks, afs, O, opts)
    step = jax.jit(prog.step)
    record("full", amortized_ms(step, prog.state, key))

    prog2 = build(chunks, None, O, opts)
    record("-afs", amortized_ms(jax.jit(prog2.step), prog2.state, key))

    prog3 = build(chunks[:, O:], afs, 0, opts)
    record("-warmup", amortized_ms(jax.jit(prog3.step), prog3.state, key))

    short = np.ascontiguousarray(chunks[:, : O + 64])
    prog4 = build(short, afs, O, opts)
    record("-sites (64-site chunks)", amortized_ms(jax.jit(prog4.step), prog4.state, key))

    # SVGD machinery alone: same particle cloud, constant gradient
    from phlash_tpu.svgd import SVGD
    import optax

    stub = SVGD(
        lambda P, **kw: jax.tree.map(jnp.ones_like, P),
        optax.amsgrad(0.1),
        batched_grad=True,
    )
    sstate = stub.init(prog.state.particles)
    record(
        "svgd-only (stub grad)",
        amortized_ms(jax.jit(lambda s: stub.step(s)), sstate),
    )

    # isolated kernel fwd+grad at the same (B, S, L) shape
    kern = prog.kern
    S = prog.S
    import phlash_tpu.params as params

    dms = jax.vmap(params.MCMCParams.to_dm)(prog.state.particles)
    pps = jax.vmap(params.PSMCParams.from_dm)(dms)
    bc = lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], S) + a.shape[1:])  # noqa: E731
    pps_chunks = params.PSMCParams(*[bc(leaf) for leaf in pps])
    pps_chunks = jax.tree.map(lambda a: a.astype(jnp.float32), pps_chunks)
    inds = jnp.arange(S, dtype=jnp.int32)
    kern_grad = jax.jit(
        jax.grad(lambda p: kern.loglik_batched(p, inds).sum())
    )
    record("kernel fwd+grad only", amortized_ms(kern_grad, pps_chunks))

    # assembly alone: to_dm + from_dm fwd+vjp over the cloud
    def assembly_loss(P):
        pp = jax.vmap(params.PSMCParams.from_dm)(jax.vmap(params.MCMCParams.to_dm)(P))
        return sum(jnp.sum(l) for l in jax.tree.leaves(pp))

    record(
        "assembly fwd+grad only",
        amortized_ms(jax.jit(jax.grad(assembly_loss)), prog.state.particles),
    )

    print(json.dumps({k: round(v, 2) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
