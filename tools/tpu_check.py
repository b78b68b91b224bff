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

    # non-default state counts on real hardware (the interpret-mode parity
    # lives in tests/test_smc_kernel.py::test_smc_m_generality; this is the
    # compiled-TPU half): value vs the scan oracle, grads vs dense
    for m in (8, 32, 64):
        dm_m = DemographicModel.default(pattern=f"{m}*1", theta=1e-2, rho=1e-2)
        pp_m = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm_m))
        pps_m = jax.tree.map(lambda a: jnp.broadcast_to(a, (16, S) + a.shape), pp_m)
        kern_m = SMCKernel(M_=m, data=data)
        dkern_m = DenseKernel(M=m, data=data)
        ll_m = np.asarray(kern_m.loglik_batched(pps_m, inds))
        want = float(psmc_ll(pp_m, jnp.asarray(data[0]))[1])
        rel = abs(ll_m[0, 0] - want) / abs(want)
        status = "ok" if rel < 1e-4 else "FAIL"
        failures += status == "FAIL"
        print(f"M={m} value: pallas {ll_m[0, 0]:.4f} oracle {want:.4f} rel {rel:.2e} {status}")
        Wm = jnp.linspace(0.5, 1.5, 16 * S).reshape(16, S)
        gp_m = jax.grad(lambda p: (kern_m.loglik_batched(p, inds) * Wm).sum())(pps_m)
        gd_m = jax.grad(lambda p: (dkern_m.loglik_batched(p, inds) * Wm).sum())(pps_m)
        worst_m = 0.0
        for name, a, b in zip(pps_m._fields, gp_m, gd_m):
            a, b = np.asarray(a), np.asarray(b)
            if name != "pi":
                a, b = a.sum(1), b.sum(1)
            worst_m = max(worst_m, np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
        status = "ok" if worst_m < 1e-3 else "FAIL"
        failures += status == "FAIL"
        print(f"M={m} grads: maxrel {worst_m:.2e} {status}")

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
