"""Model log-density tests (cf. reference tests/test_model.py:8-19)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from phlash_tpu.hmm import PureXLAKernel
from phlash_tpu.model import log_density, log_prior
from phlash_tpu.ops.kernel_dense import DenseKernel


def _density_args(data):
    S = 3
    inds = jnp.arange(S)
    warmup = jnp.asarray(data[:S, :100])
    afs = jnp.array([100, 40, 20, 10, 5], dtype=jnp.int64)
    return dict(
        c=jnp.array([1.0, 1.0, 1.0]),
        inds=inds,
        warmup=warmup,
        afs=afs,
        afs_transform=None,
    )


def test_log_prior_finite(mcp):
    assert np.isfinite(float(log_prior(mcp)))


def test_log_density_finite(mcp, data):
    kern = PureXLAKernel(M=16, data=data[:, 100:], double_precision=True)
    ld = log_density(mcp, kern=kern, **_density_args(data))
    assert np.isfinite(float(ld))


def test_log_density_backends_agree(mcp, data):
    args = _density_args(data)
    k1 = PureXLAKernel(M=16, data=data[:, 100:], double_precision=True)
    k2 = DenseKernel(M=16, data=data[:, 100:], double_precision=True, seg_len=128)
    v1 = float(log_density(mcp, kern=k1, **args))
    v2 = float(log_density(mcp, kern=k2, **args))
    np.testing.assert_allclose(v1, v2, rtol=1e-8)


@pytest.mark.slow  # two reverse-mode compiles (~28 s); kernel-level gradient
# agreement is covered fast by test_kernels.py::test_grads_agree
def test_log_density_backends_grads_agree(mcp, data):
    args = _density_args(data)
    k1 = PureXLAKernel(M=16, data=data[:, 100:], double_precision=True)
    k2 = DenseKernel(M=16, data=data[:, 100:], double_precision=True, seg_len=128)
    g1 = jax.grad(lambda m: log_density(m, kern=k1, **args))(mcp)
    g2 = jax.grad(lambda m: log_density(m, kern=k2, **args))(mcp)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-10)


@pytest.mark.slow  # ~29 s reverse-mode compile; gradient finiteness is
# asserted fast at kernel level (test_kernels) and per-step inside fit()
def test_log_density_grad_finite(mcp, data):
    kern = DenseKernel(M=16, data=data[:, 100:], double_precision=True, seg_len=128)
    g = jax.grad(lambda m: log_density(m, kern=kern, **_density_args(data)))(mcp)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_zero_width_warmup_is_pi_passthrough(mcp, data):
    """A (S, 0) warmup must skip the filter and use pi directly.

    Equivalent to filtering over missing sites only (missing-site steps
    preserve the stationary pi), but without launching a padded kernel —
    the held-out ELPD path uses this."""
    from phlash_tpu.model import log_density_batched

    args = _density_args(data)
    kern = DenseKernel(M=16, data=data[:, 100:], double_precision=True, seg_len=128)
    mcps = jax.tree.map(lambda a: jnp.broadcast_to(a, (2,) + jnp.shape(a)), mcp)
    S = 3
    empty = jnp.zeros((S, 0), dtype=jnp.int8)
    missing = jnp.full((S, 4), -1, dtype=jnp.int8)
    del args["warmup"]
    v_empty = log_density_batched(mcps, warmup=empty, kern=kern, **args)
    v_missing = log_density_batched(mcps, warmup=missing, kern=kern, **args)
    assert np.isfinite(np.asarray(v_empty)).all()
    # pi is the stationary law of the SMC' transition, so filtering over
    # missing-only sites leaves it unchanged up to float tolerance
    np.testing.assert_allclose(
        np.asarray(v_empty), np.asarray(v_missing), rtol=1e-4
    )
