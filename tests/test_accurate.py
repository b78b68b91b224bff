"""Faithful-f32 transcendentals (utils/accurate.py) vs float64 oracles.

These back the f32 parameter-assembly gradient path: XLA:TPU's native f32
exp/expm1/log approximations carry 4e-6..2.6e-4 max relative error, which
the assembly VJP's cancellations amplify into O(1) gradient error
(tools/f32_xplat.py).  The accurate versions must stay within a few ulp of
f64 on both platforms — this file pins the CPU half; tools/tpu_check.py
covers the hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phlash_tpu.utils import accurate as am

RNG = np.random.default_rng(3)
XS = np.concatenate(
    [
        np.float32(10.0) ** RNG.uniform(-8, 1.5, 200),
        -(np.float32(10.0) ** RNG.uniform(-8, 1.5, 200)),
        RNG.uniform(-80.0, 80.0, 100),
    ]
).astype(np.float32)


@pytest.mark.parametrize(
    "name,fn,ref,domain",
    [
        ("exp", am.exp, np.exp, lambda x: x),
        ("expm1", am.expm1, np.expm1, lambda x: x),
        ("log", am.log, np.log, lambda x: np.abs(x) + np.float32(1e-30)),
        ("log1p", am.log1p, np.log1p, lambda x: np.maximum(x, np.float32(-0.5))),
    ],
)
def test_accurate_f32_few_ulp(name, fn, ref, domain):
    x = domain(XS)
    got = np.asarray(jax.jit(fn)(jnp.asarray(x)), dtype=np.float64)
    want = ref(x.astype(np.float64))
    rel = np.abs(got - want) / (np.abs(want) + 1e-300)
    assert rel.max() < 5e-7, (name, rel.max())


def test_accurate_f64_dispatches_native():
    x = jnp.asarray(XS, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(am.exp(x)), np.asarray(jnp.exp(x)))
    np.testing.assert_array_equal(np.asarray(am.log(jnp.abs(x) + 1e-30)),
                                  np.asarray(jnp.log(jnp.abs(x) + 1e-30)))


def test_accurate_gradients():
    "custom_jvp derivatives match the analytic forms to f32 accuracy."
    x = jnp.asarray(np.clip(XS, -30, 30))
    g_exp = np.asarray(jax.vmap(jax.grad(am.exp))(x), np.float64)
    g_expm1 = np.asarray(jax.vmap(jax.grad(am.expm1))(x), np.float64)
    want = np.exp(np.asarray(x, np.float64))
    for g in (g_exp, g_expm1):
        rel = np.abs(g - want) / (np.abs(want) + 1e-300)
        assert rel.max() < 5e-7
    xp = jnp.abs(x) + np.float32(1e-6)
    g_log = np.asarray(jax.vmap(jax.grad(am.log))(xp), np.float64)
    want = 1.0 / np.asarray(xp, np.float64)
    rel = np.abs(g_log - want) / np.abs(want)
    assert rel.max() < 5e-7


def test_accurate_compositions():
    x = jnp.asarray(np.clip(XS, -60, 60))
    sp = np.asarray(am.softplus(x), np.float64)
    want = np.logaddexp(0.0, np.asarray(x, np.float64))
    assert (np.abs(sp - want) / (np.abs(want) + 1e-30)).max() < 1e-6
    sig = np.asarray(am.expit(x), np.float64)
    want = 1.0 / (1.0 + np.exp(-np.asarray(x, np.float64)))
    assert (np.abs(sig - want) / np.abs(want)).max() < 1e-6
    gs = np.asarray(am.geomspace(jnp.float32(1e-4), jnp.float32(15.0), 15), np.float64)
    want = np.geomspace(1e-4, 15.0, 15)
    assert (np.abs(gs - want) / want).max() < 1e-6
