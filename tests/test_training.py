"""Training-program construction tests."""

import numpy as np

from phlash_tpu.training import build_training



def test_f32_step_graph_has_no_tensor_f64():
    """The default (f32-parameter) training step's traced graph must contain
    no non-scalar float64 intermediate: under the global x64 policy one bare
    jnp.zeros/jnp.array silently promotes a subgraph to f64, which is
    software-emulated on TPU (the AFS term once lost ~8 ms/step this way —
    tools/step_profile.py).  Scalar f64s from optax/random internals are
    tolerated."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    chunks = rng.binomial(1, 0.05, size=(32, 320)).astype(np.int8)
    afs = rng.integers(10, 100, size=5).astype(np.int64)
    prog = build_training(
        chunks, afs, window_size=100, overlap=64, key=jax.random.PRNGKey(0),
        options=dict(num_particles=8, minibatch_size=2, niter=10,
                     kernel_backend="dense"),
    )
    jxp = jax.make_jaxpr(prog.step)(prog.state, jax.random.PRNGKey(1))

    offenders = []

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                if (
                    getattr(aval, "dtype", None) == jnp.float64
                    and np.prod(aval.shape, dtype=int) > 8
                ):
                    offenders.append((eqn.primitive.name, str(aval)))
            for p in eqn.params.values():
                for sub in p if isinstance(p, (list, tuple)) else [p]:
                    if hasattr(sub, "jaxpr"):
                        walk(sub.jaxpr)

    walk(jxp.jaxpr)
    assert not offenders, f"f64 tensors in the f32 step graph: {offenders[:10]}"
