"""On-hardware kernel verification: run on a real TPU.

The pytest suite pins itself to CPU (interpret-mode Pallas) so it can run
anywhere; this script is the hardware half of the dual-implementation test
strategy — it executes the compiled kernels on the attached TPU and checks
values and gradients against the scan oracle, like the reference's
self-hosted GPU CI job (reference .github/workflows/test.yml).

Usage:  python tools/tpu_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: no TPU attached (backend={jax.default_backend()})")
        return 0

    from phlash_tpu.hmm import psmc_ll
    from phlash_tpu.ops.kernel_dense import DenseKernel
    from phlash_tpu.ops.kernel_smc import SMCKernel
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    rng = np.random.default_rng(0)
    B, S, L = 64, 5, 2048
    data = rng.binomial(1, 0.05, size=(8, L)).astype(np.int8)
    data[1, 100:200] = -1
    dm = DemographicModel.default(pattern="16*1", theta=1e-2, rho=1e-2)
    pp = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.arange(S)

    kern = SMCKernel(M_=16, data=data)
    dkern = DenseKernel(M=16, data=data)
    failures = 0

    # values vs oracle
    ll = np.asarray(kern.loglik_batched(pps, inds))
    for s in range(S):
        want = float(psmc_ll(pp, jnp.asarray(data[s]))[1])
        rel = abs(ll[0, s] - want) / abs(want)
        status = "ok" if rel < 1e-4 else "FAIL"
        failures += status == "FAIL"
        print(f"value chunk {s}: pallas {ll[0, s]:.4f} oracle {want:.4f} rel {rel:.2e} {status}")

    # grads vs dense backend
    W = jnp.linspace(0.5, 1.5, B * S).reshape(B, S)
    gp = jax.grad(lambda p: (kern.loglik_batched(p, inds) * W).sum())(pps)
    gd = jax.grad(lambda p: (dkern.loglik_batched(p, inds) * W).sum())(pps)
    for name, a, b in zip(pps._fields, gp, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name != "pi":
            a, b = a.sum(1), b.sum(1)
        denom = np.abs(b).max() + 1e-12
        rel = np.abs(a - b).max() / denom
        status = "ok" if rel < 1e-3 else "FAIL"
        failures += status == "FAIL"
        print(f"grad {name}: maxrel {rel:.2e} {status}")

    # aligned layout (chunk-uniform tiles, per-tile shift decode): B a lane
    # multiple selects it; value+grad must match the dense backend exactly
    # like the dense layout above (the production B=500, S=5 shape is
    # aligned too)
    B2 = 256
    layout, _, _ = kern._layout(B2, S)
    pps2 = jax.tree.map(lambda a: jnp.broadcast_to(a, (B2, S) + a.shape), pp)
    ll2 = np.asarray(kern.loglik_batched(pps2, inds))
    rel = abs(ll2[0, 0] - float(psmc_ll(pp, jnp.asarray(data[0]))[1])) / abs(ll2[0, 0])
    status = "ok" if (layout == "aligned" and rel < 1e-4) else "FAIL"
    failures += status == "FAIL"
    print(f"aligned layout value (B={B2}): layout {layout} rel {rel:.2e} {status}")
    W2 = jnp.linspace(0.5, 1.5, B2 * S).reshape(B2, S)
    gp2 = jax.grad(lambda p: (kern.loglik_batched(p, inds) * W2).sum())(pps2)
    gd2 = jax.grad(lambda p: (dkern.loglik_batched(p, inds) * W2).sum())(pps2)
    worst = 0.0
    for name, a, b in zip(pps._fields, gp2, gd2):
        a, b = np.asarray(a), np.asarray(b)
        if name != "pi":
            a, b = a.sum(1), b.sum(1)
        worst = max(worst, np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
    status = "ok" if worst < 1e-3 else "FAIL"
    failures += status == "FAIL"
    print(f"aligned layout grads (B={B2}): maxrel {worst:.2e} {status}")

    # production kernel under a mesh: one full SVGD step, sharded vs not.
    # (single-chip machines get a (1, 1) mesh — still the shard_map path.)
    from phlash_tpu.parallel import make_mesh, shard_training_step
    from phlash_tpu.training import build_training

    mesh = make_mesh(len(jax.devices()))
    chunks = rng.binomial(1, 0.05, size=(16, 1000)).astype(np.int8)
    afs = np.array([50, 20, 10, 5, 2], dtype=np.int64)
    opts = dict(num_particles=16, minibatch_size=2, kernel_backend="pallas", niter=10)
    key = jax.random.PRNGKey(0)
    prog = build_training(
        chunks, afs, window_size=100, overlap=200, key=key, options=dict(opts, mesh=mesh)
    )
    place, jit_step = shard_training_step(prog.step, mesh)
    state = place(prog.state)
    got = jax.block_until_ready(jit_step(state)(state, jax.random.PRNGKey(1)))
    prog0 = build_training(
        chunks, afs, window_size=100, overlap=200, key=key, options=opts
    )
    want = jax.jit(prog0.step)(prog0.state, jax.random.PRNGKey(1))
    rel = max(
        float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12))
        for a, b in zip(jax.tree.leaves(got.particles), jax.tree.leaves(want.particles))
    )
    status = "ok" if rel < 5e-5 else "FAIL"
    failures += status == "FAIL"
    print(
        f"mesh {mesh.devices.shape} pallas SVGD step vs unsharded: maxrel {rel:.2e} {status}"
    )

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
