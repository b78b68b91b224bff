"""A/B the instance layouts of the structured kernel at the bench shape.

The r2 peak (1924.4 Msites/s fwd+grad, BENCH_r02) predates the aligned
chunk-uniform layout default (commit b06f043); the healthy-device r4
number is ~1880.  This times the full custom-VJP gradient with the layout
forced each way so a layout-choice regression at the production shape
(B=500, S=5 -> both layouts need 20 tiles) is attributed directly.

Usage: python tools/layout_ab.py [L]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def measure(fn, pps, sites, reps=3, inner=10):
    def sync(out):
        return float(jax.tree.leaves(out)[0].ravel()[0])

    sync(fn(pps))
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(inner):
            o = fn(pps)
        sync(o)
        per.append(sites / ((time.perf_counter() - t0) / inner) / 1e6)
    return max(per), per


def main():
    from phlash_tpu.ops.kernel_smc import SMCKernel, _ceil_to
    from phlash_tpu.ops.pallas_smc import LANES
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    B, S = 500, 5
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rng = np.random.default_rng(0)
    data = rng.binomial(1, 0.05, size=(max(8, S), L)).astype(np.int8)
    data[:, 1000:1100] = -1
    dm = DemographicModel.default(pattern="16*1", theta=1e-2, rho=1e-2)
    pp = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.arange(S)
    sites = B * S * L

    for which in ("aligned", "dense"):
        kern = SMCKernel(M_=16, data=data)

        def forced(Bq, Sq, _which=which):
            if _which == "aligned":
                n = kern._mesh_tiles(Sq * (_ceil_to(Bq, LANES) // LANES))
                return "aligned", n, _ceil_to(Bq, LANES)
            n = kern._mesh_tiles(_ceil_to(Bq * Sq, LANES) // LANES)
            return "dense", n, Bq

        kern._layout = forced
        loss = lambda p: kern.loglik_batched(p, inds).sum()  # noqa: E731
        best_f, per_f = measure(jax.jit(loss), pps, sites)
        best_g, per_g = measure(jax.jit(jax.grad(loss)), pps, sites)
        print(f"{which:8s} fwd-only: {best_f:7.1f} Msites/s  per-rep {[round(x, 1) for x in per_f]}")
        print(f"{which:8s} fwd+grad: {best_g:7.1f} Msites/s  per-rep {[round(x, 1) for x in per_g]}")


if __name__ == "__main__":
    main()
