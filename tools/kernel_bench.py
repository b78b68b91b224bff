"""Micro-benchmark of the structured SMC' Pallas kernels on the real TPU.

Times the forward and adjoint passes separately at the reference workload
(B=500 particles x S=5 chunks x L=20k sites, M=16) so kernel work can be
attributed.  Usage:  python tools/kernel_bench.py [L]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3, inner=10):
    """Per-call wall time, amortizing the remote-tunnel sync latency.

    Dispatches `inner` async calls back-to-back and syncs once (a scalar
    host transfer — block_until_ready is not a reliable fence on the
    tunneled backend), so the one-off transfer cost is divided by `inner`.
    """

    def sync(out):
        leaves = jax.tree.leaves(out)
        return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))

    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(inner):
            o = fn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, out


def main():
    from phlash_tpu.ops import pallas_smc
    from phlash_tpu.ops.kernel_smc import SMCKernel
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    # experiment knobs
    if os.environ.get("PH_FWD_TB"):
        pallas_smc.FWD_TILE_BLOCK = int(os.environ["PH_FWD_TB"])
    if os.environ.get("PH_BWD_TB"):
        pallas_smc.BWD_TILE_BLOCK = int(os.environ["PH_BWD_TB"])
    seg_env = int(os.environ.get("PH_SEG", pallas_smc.DEFAULT_SEG))

    B, S = 500, 5
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    M_ = int(os.environ.get("PH_M", 16))  # any of ops/pallas_smc.SUPPORTED_M
    rng = np.random.default_rng(0)
    data = rng.binomial(1, 0.05, size=(max(8, S), L)).astype(np.int8)
    data[:, 1000:1100] = -1
    dm = DemographicModel.default(pattern=f"{M_}*1", theta=1e-2, rho=1e-2)
    pp = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.arange(S)
    sites = B * S * L

    kern = SMCKernel(M_=M_, data=data, seg_len=seg_env)
    params, pi, shifts, _, _ = kern._pack_instances(pps, S)
    obs = pallas_smc.pack_obs(kern.data[inds], kern.seg_len)
    seg = kern.seg_len
    print(f"M={M_} n_t={params[0].shape[0]} n_seg={obs.shape[0]} seg_len={seg}")

    fwd = jax.jit(lambda p, q, sh, o: pallas_smc.forward_structured(p, q, sh, o, seg))
    t_f, (ll, alpha, pstates) = timeit(fwd, params, pi, shifts, obs)
    print(f"forward (w/ residuals):     {t_f*1e3:7.2f} ms  {sites/t_f/1e9:6.2f} Gsites/s")

    gbar = jnp.ones_like(alpha)
    abar0 = jnp.zeros_like(alpha)
    bwd = jax.jit(
        lambda p, sh, o, c, g, a: pallas_smc.backward_structured(p, sh, o, c, g, a, seg)
    )
    t_b, _ = timeit(bwd, params, shifts, obs, pstates, gbar, abar0)
    print(f"backward (rebuild+sweep):  {t_b*1e3:7.2f} ms  {sites/t_b/1e9:6.2f} Gsites/s")

    loss = jax.jit(lambda p: kern.loglik_batched(p, inds).sum())
    t_v, _ = timeit(loss, pps)
    print(f"value (loglik_batched):    {t_v*1e3:7.2f} ms  {sites/t_v/1e9:6.2f} Gsites/s")

    g = jax.jit(jax.grad(lambda p: kern.loglik_batched(p, inds).sum()))
    t_g, _ = timeit(g, pps)
    print(f"value+grad (custom vjp):   {t_g*1e3:7.2f} ms  {sites/t_g/1e9:6.2f} Gsites/s")


if __name__ == "__main__":
    main()
