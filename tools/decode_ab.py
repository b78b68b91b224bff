"""A/B: per-lane (n_t,1,128) vs per-tile (n_t,1,1) chunk-shift decode cost.

Round 3's dense instance packing moved the observation decode from
scalar-row to full-lane width; BENCH regressed 1924 -> 1781 Msites/s at the
same time.  This measures the isolated effect on the raw Pallas kernels at
the production shape (B=500, S=5, L=20k, seg=256).  Correctness is NOT the
point here (the (n_t,1,1) variant decodes chunk 0 for every lane); the
timing difference is.

Run on TPU:  python tools/decode_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from phlash_tpu.ops import pallas_smc
from phlash_tpu.ops.pallas_smc import LANES, M


def sync(out):
    "Fence via a tiny device->host transfer (block_until_ready is unreliable on the tunnel)."
    return float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:8]))


def timeit(f, *args, reps=3, inner=10):
    sync(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    B, S, L, seg = 500, 5, 20480, 256  # L a seg multiple (prod pads to this)
    n_t = -(-B * S // LANES)
    rng = np.random.default_rng(0)
    params = tuple(
        jnp.asarray(rng.uniform(0.1, 0.9, size=(n_t, M, LANES)), dtype=jnp.float32)
        for _ in range(6)
    )
    pi = jnp.asarray(rng.dirichlet(np.ones(M), size=(n_t, LANES)).transpose(0, 2, 1), dtype=jnp.float32)
    obs_rows = rng.binomial(1, 0.05, size=(S, L)).astype(np.int8)
    obs = pallas_smc.pack_obs(jnp.asarray(obs_rows), seg)

    chunk_of = np.repeat(np.arange(S, dtype=np.int32), B)
    sh_lane = np.zeros(n_t * LANES, dtype=np.int32)
    sh_lane[: S * B] = 2 * chunk_of
    shifts_lane = jnp.asarray(sh_lane.reshape(n_t, 1, LANES))
    shifts_tile = jnp.zeros((n_t, 1, 1), dtype=jnp.int32)

    sites = B * S * L

    for name, sh in [("per-lane (r3)", shifts_lane), ("per-tile (r2-style)", shifts_tile)]:
        fwd = jax.jit(
            lambda p, q, s, o: pallas_smc.forward_structured(p, q, s, o, seg, with_residuals=False)[0]
        )
        t_f = timeit(fwd, params, pi, sh, obs)

        def fg(p, q, s, o):
            ll, alpha, pst = pallas_smc.forward_structured(p, q, s, o, seg)
            gbar = jnp.ones((n_t, M, LANES), jnp.float32)
            dp, dpi = pallas_smc.backward_structured(p, s, o, pst, gbar, jnp.zeros_like(alpha), seg)
            return dp[0]

        t_g = timeit(jax.jit(fg), params, pi, sh, obs)
        print(
            f"{name:22s} fwd {sites / t_f / 1e6:8.1f} Msites/s   "
            f"fwd+bwd {sites / t_g / 1e6:8.1f} Msites/s"
        )


if __name__ == "__main__":
    main()
