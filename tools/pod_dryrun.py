"""Pod-scale dryrun at the BASELINE config-5 shape (virtual 8-device mesh).

Exercises the sharding math the pod story rests on, with real tensors:

* a 10^5-chunk int8 tensor sharded over the mesh's 'd' (chunk) axis —
  per-device bytes must be ~1/|d| of the total (HBM capacity scaling);
* 500 particles sharded over 'p' with slices laid outermost (n_slices=2);
* one full SVGD training step executed on the mesh, numerically identical
  to the unsharded step on the same inputs.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/pod_dryrun.py

Prints per-device bytes for the chunk tensor and the particle state, then
the sharded-vs-unsharded max relative difference.  Exit 0 on success.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    jax.config.update("jax_platforms", "cpu")
    from phlash_tpu.parallel import chunk_sharding, make_mesh, shard_training_step
    from phlash_tpu.training import build_training

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, particle_axis=max(2, n_dev // 2), n_slices=2)
    print(f"mesh {mesh.devices.shape} axes {mesh.axis_names} over {n_dev} devices")

    # config-5 shape: 10^5 chunks; short chunk bodies keep the CPU dryrun
    # step affordable while the SHARDING math (bytes, specs, collectives)
    # is exactly the pod layout's
    N_CHUNKS, SPAN, OVERLAP = 100_000, 520, 20
    rng = np.random.default_rng(0)
    chunks = rng.binomial(1, 0.05, size=(N_CHUNKS, SPAN)).astype(np.int8)
    afs = np.array([5000, 2000, 800, 300, 100], dtype=np.int64)
    options = dict(
        num_particles=500, minibatch_size=5, kernel_backend="dense", niter=100,
        steps_per_call=1,
    )
    key = jax.random.PRNGKey(0)

    prog = build_training(
        chunks, afs, window_size=100, overlap=OVERLAP, key=key,
        options=dict(options, mesh=mesh),
    )

    # --- per-device bytes: the chunk tensor must split over 'd'
    data = prog.kern.data
    shard_bytes = sorted({s.data.nbytes for s in data.addressable_shards})
    total = data.nbytes
    d_size = mesh.devices.shape[1]
    print(
        f"chunk tensor: total {total/1e6:.1f} MB, per-device "
        f"{[f'{b/1e6:.1f}' for b in shard_bytes]} MB (d={d_size} -> expect "
        f"~{total/d_size/1e6:.1f} MB/device)"
    )
    assert max(shard_bytes) <= -(-total // d_size) + SPAN  # ceil share + pad row
    # every device holds a proper shard, not a replica
    assert len(data.sharding.device_set) == n_dev

    place, jit_step = shard_training_step(prog.step, mesh)
    state = place(prog.state)
    pleaf = jax.tree.leaves(state.particles)[0]
    p_bytes = sum(
        sum(s.data.nbytes for s in leaf.addressable_shards) // n_dev
        for leaf in jax.tree.leaves(state.particles)
    )
    print(f"particle state: ~{p_bytes/1e3:.1f} kB/device (500 particles over p)")
    assert len(pleaf.sharding.device_set) == n_dev

    got = jit_step(state)(state, jax.random.PRNGKey(1))

    # --- numerics vs the unsharded step on identical inputs
    prog0 = build_training(
        chunks, afs, window_size=100, overlap=OVERLAP, key=key, options=options
    )
    want = jax.jit(prog0.step)(prog0.state, jax.random.PRNGKey(1))
    rel = max(
        float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12))
        for a, b in zip(jax.tree.leaves(got.particles), jax.tree.leaves(want.particles))
    )
    print(f"sharded vs unsharded one-step particles: maxrel {rel:.2e}")
    assert rel < 5e-5
    print("POD DRYRUN OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
