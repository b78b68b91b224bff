"""Pallas TPU kernel equivalence tests (interpret mode on CPU).

Mirrors the reference's CUDA-vs-JAX dual-implementation strategy
(tests/test_gpu.py): the MXU-packed kernel must agree with the O(M) scan
oracle and the dense XLA kernel in value and gradient, including missing
data and padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

# the MXU-packed kernel is a comparison backend (production is the
# structured VPU kernel, tests/test_smc_kernel.py); its interpret-mode
# equivalence runs are compile-heavy, so they live in the slow lane
HEAVY = pytest.mark.slow

from phlash_tpu.hmm import psmc_ll
from phlash_tpu.ops.kernel_dense import DenseKernel
from phlash_tpu.ops.kernel_pallas import PallasKernel


@pytest.fixture
def f32_pp(pp):
    return jax.tree.map(lambda a: a.astype(jnp.float32), pp)


@pytest.fixture
def short_data(rng):
    d = rng.binomial(1, 0.05, size=(4, 300)).astype(np.int8)
    d[1, 50:80] = -1  # missing stretch
    return d


@HEAVY
def test_pallas_values_match_oracle(short_data, f32_pp):
    kern = PallasKernel(M_=16, data=short_data, seg_len=128)
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (2, 2) + a.shape), f32_pp)
    with pltpu.force_tpu_interpret_mode():
        ll = np.asarray(kern.loglik_batched(pps, jnp.array([0, 1])))
    for s, i in enumerate([0, 1]):
        want = float(psmc_ll(f32_pp, jnp.asarray(short_data[i]))[1])
        np.testing.assert_allclose(ll[:, s], want, rtol=1e-4)


@HEAVY
def test_pallas_grads_match_dense(short_data, f32_pp):
    kern = PallasKernel(M_=16, data=short_data, seg_len=128)
    dkern = DenseKernel(M=16, data=short_data, seg_len=64)
    B, S = 3, 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), f32_pp)
    inds = jnp.array([0, 1])
    W = jnp.arange(1.0, B * S + 1).reshape(B, S)  # distinct cotangents

    def loss(kern_):
        return lambda p: (kern_.loglik_batched(p, inds) * W).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(kern))(pps)
    gd = jax.grad(loss(dkern))(pps)
    for name, a, b in zip(pps._fields, gp, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name != "pi":
            # the pallas path routes chunk-invariant grads through chunk 0
            a, b = a.sum(1), b.sum(1)
        denom = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5, err_msg=name)


@HEAVY
def test_pallas_padding_is_noop(f32_pp, rng):
    "Likelihood must be invariant to the kernel-internal -2 padding."
    d = rng.binomial(1, 0.05, size=(2, 200)).astype(np.int8)
    k1 = PallasKernel(M_=16, data=d, seg_len=128)  # pads 200 -> 256
    k2 = PallasKernel(M_=16, data=np.pad(d, [(0, 0), (0, 56)], constant_values=-2),
                      seg_len=128)
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (1, 1) + a.shape), f32_pp)
    with pltpu.force_tpu_interpret_mode():
        l1 = float(k1.loglik_batched(pps, jnp.array([0]))[0, 0])
        l2 = float(k2.loglik_batched(pps, jnp.array([0]))[0, 0])
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_pallas_rejects_double_precision(short_data):
    with pytest.raises(ValueError, match="float32"):
        PallasKernel(M_=16, data=short_data, double_precision=True)


def test_pack_obs_roundtrip(rng):
    from phlash_tpu.ops.pallas_hmm import ROWS, pack_obs

    obs = rng.integers(-2, 2, size=(ROWS, 256)).astype(np.int8)
    packed = np.asarray(pack_obs(jnp.asarray(obs), 128))
    assert packed.shape == (2, ROWS, 16)
    flat = packed.reshape(2 * ROWS * 16)
    # decode and compare
    codes = np.stack([(flat >> (2 * r)) & 3 for r in range(ROWS)])
    expect = np.where(obs == 0, 0, np.where(obs == 1, 1, np.where(obs == -1, 2, 3)))
    np.testing.assert_array_equal(codes.reshape(ROWS, -1), expect)
