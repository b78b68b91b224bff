"""Probe: jax.grad through the sharded Pallas kernel on an n-device CPU mesh.

Interpret mode; tiny shapes (seg_len=8, L=16, B chosen so each device gets
one 128-lane tile).  Compares value+grad against the dense backend.

Usage: python tools/sharded_adjoint_probe.py [n_devices] [timeout_note]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

import faulthandler

faulthandler.dump_traceback_later(1200, exit=True)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from phlash_tpu.ops.kernel_smc import SMCKernel
from phlash_tpu.params import PSMCParams
from phlash_tpu.parallel import make_mesh
from phlash_tpu.size_history import DemographicModel


def main():
    rng = np.random.default_rng(4)
    data = rng.binomial(1, 0.05, size=(2, 16)).astype(np.int8)
    dm = DemographicModel.default(pattern="16*1", theta=1e-2, rho=1e-2)
    pp = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))
    B, S = 16, 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.arange(S)
    W = jnp.arange(1.0, B * S + 1).reshape(B, S).astype(jnp.float32)

    mesh = make_mesh(N_DEV)
    kern = SMCKernel(M_=16, data=data, seg_len=8, mesh=mesh)

    t0 = time.time()
    with pltpu.force_tpu_interpret_mode():
        val, grads = jax.jit(
            jax.value_and_grad(lambda p: (kern.loglik_batched(p, inds) * W).sum())
        )(pps)
        jax.block_until_ready(grads)
    t1 = time.time()
    print(f"[{N_DEV} dev] sharded value+grad executed in {t1 - t0:.1f}s", flush=True)

    from phlash_tpu.ops.check import assert_grads_match, dense_f64_value_and_grad

    dval, dgrads = dense_f64_value_and_grad(data, pps, inds, W, seg_len=8)
    np.testing.assert_allclose(float(val), float(dval), rtol=1e-4)
    assert_grads_match(pps._fields, grads, dgrads)
    print(f"[{N_DEV} dev] sharded adjoint matches dense backend", flush=True)


if __name__ == "__main__":
    main()
