"""Bisect the f32-vs-f64 gradient discrepancy in the parameter graph.

Round-2 finding: with `double_precision_params=False` the full differentiated
assembly graph runs in float32 and the SVGD step is 2.7x faster, but
posterior recovery degrades (bottleneck tv 0.49 vs 0.14).  Assembly VALUES
match f64 to ~3e-6, so the defect is in the gradient path.  This script
isolates it:

1. builds the bottleneck-validation setup,
2. draws the same particle cloud in f64 and f32,
3. compares per-leaf gradients of each density term (prior / HMM / AFS)
   between dtypes over the cloud (one jacrev per dtype),
4. reports non-finite counts (a -inf density zeroes that particle's gradient
   and freezes it, which would degrade recovery far more than noise would).

Run on CPU (native f64): JAX_PLATFORMS=cpu python tools/f32_bisect.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from phlash_tpu.model import log_density_batched
from phlash_tpu.sim import bottleneck_demography, simulate_hmm
from phlash_tpu.training import build_training


def build(pdtype, key, chunks, afs):
    options = dict(
        num_particles=32,
        minibatch_size=5,
        kernel_backend="dense",
        niter=100,
        theta=1e-2,
        t1=1e-3,
        tM=15.0,
        alpha=1.0,
        double_precision_params=pdtype == jnp.float64,
        double_precision=True,  # dense kernel in f64 in BOTH runs: only the
        # parameter/assembly graph dtype varies
    )
    return build_training(
        chunks, afs, window_size=100, overlap=64, key=key, options=options
    )


def main():
    truth = bottleneck_demography(theta=1e-2)
    contig = simulate_hmm(truth, L=8_000, key=0)
    H = contig.het_matrix
    overlap, chunk = 64, 256
    n = (H.shape[1] - overlap) // chunk
    chunks = np.stack(
        [H[0, i * chunk : i * chunk + chunk + overlap] for i in range(n)]
    ).astype(np.int8)
    afs = np.array([100], dtype=np.int64)

    key = jax.random.PRNGKey(7)
    prog64 = build(jnp.float64, key, chunks, afs)
    prog32 = build(jnp.float32, key, chunks, afs)

    # identical clouds: cast the f64 draw down
    p64 = prog64.state.particles
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), p64)

    inds = jnp.arange(prog64.S)
    warmup = np.asarray(prog64.warmup)[np.asarray(inds)]

    def terms(P, prog):
        "(4,) per-term particle-summed densities: prior, hmm, afs, total."
        dt = jax.tree.leaves(P)[0].dtype
        outs = []
        for c in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [1.0, 1.0, 1.0]):
            outs.append(
                log_density_batched(
                    P,
                    c=jnp.asarray(c, dtype=dt),
                    inds=inds,
                    warmup=jnp.asarray(warmup),
                    kern=prog.kern,
                    afs=prog.afs,
                    afs_transform=prog.afs_transform,
                ).sum()
            )
        return jnp.stack(outs)

    print("compiling f64 jacobian...", flush=True)
    v64 = jax.jit(lambda P: terms(P, prog64))(p64)
    j64 = jax.jit(jax.jacrev(lambda P: terms(P, prog64)))(p64)
    print("compiling f32 jacobian...", flush=True)
    v32 = jax.jit(lambda P: terms(P, prog32))(p32)
    j32 = jax.jit(jax.jacrev(lambda P: terms(P, prog32)))(p32)

    names = ["prior", "hmm", "afs", "total"]
    for k, name in enumerate(names):
        a, b = float(v64[k]), float(v32[k])
        print(
            f"== {name}: value f64 {a:.6g} f32 {b:.6g} "
            f"rel {abs(a - b) / (abs(a) + 1e-12):.2e}",
            flush=True,
        )
        for leaf_name, l64, l32 in zip(
            ["t_tr", "c_tr", "rho_tr"], jax.tree.leaves(j64), jax.tree.leaves(j32)
        ):
            a64 = np.asarray(l64, dtype=np.float64)[k]
            a32 = np.asarray(l32, dtype=np.float64)[k]
            scale = np.abs(a64).max() + 1e-12
            rel = np.abs(a32 - a64) / scale
            print(
                f"   {leaf_name:7s} relerr med {np.median(rel):.2e} "
                f"p99 {np.quantile(rel, 0.99):.2e} max {rel.max():.2e} "
                f"(|g| max {scale:.2e})",
                flush=True,
            )


if __name__ == "__main__":
    main()
