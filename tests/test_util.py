"""Utility tests (cf. reference tests/test_util.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phlash_tpu.utils import Pattern, softplus_inv, tree_stack, tree_unstack


def test_pattern_parse():
    p = Pattern("14*1+1*2")
    assert p.M == 16
    assert len(p) == 15


def test_pattern_single():
    p = Pattern("16*1")
    assert p.M == 16 and len(p) == 16


def test_pattern_mixed():
    p = Pattern("4+2*3+1")
    assert p.M == 4 + 6 + 1
    assert len(p) == 4


def test_pattern_expand():
    p = Pattern("2*2+1")
    x = np.array([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(p.expand(x), [1, 1, 2, 2, 3])


def test_pattern_errors():
    for bad in ["", "0*1", "-1", "a*b"]:
        with pytest.raises(ValueError):
            Pattern(bad)


def test_softplus_inv_roundtrip():
    import jax

    y = jnp.array([0.1, 1.0, 10.0, 100.0])
    np.testing.assert_allclose(np.asarray(jax.nn.softplus(softplus_inv(y))), y, rtol=1e-10)


def test_tree_stack_unstack():
    trees = [{"a": jnp.array([i, i + 1]), "b": jnp.float32(i)} for i in range(3)]
    stacked = tree_stack(trees)
    assert stacked["a"].shape == (3, 2)
    back = tree_unstack(stacked)
    assert len(back) == 3
    np.testing.assert_array_equal(back[1]["a"], trees[1]["a"])


def test_invert_cpwli():
    from scipy.interpolate import PPoly

    from phlash_tpu.utils import invert_cpwli

    # R(t): slope 2 on [0,1), slope 0.5 beyond, continuous
    R = PPoly(x=np.array([0.0, 1.0, np.inf]), c=np.array([[2.0, 0.5], [0.0, 2.0]]))
    Rinv = invert_cpwli(R)
    for t in [0.2, 0.9, 1.5, 4.0]:
        np.testing.assert_allclose(Rinv(R(t)), t, rtol=1e-12)


def test_expm1inv():
    "1/expm1(x) for moderate x; no overflow for large x (ref util.py)."
    from phlash_tpu.utils import expm1inv

    x = np.array([1e-3, 0.5, 5.0, 9.9, 10.1, 50.0, 700.0])
    np.testing.assert_allclose(
        np.asarray(expm1inv(jnp.asarray(x))), 1.0 / np.expm1(x), rtol=1e-12
    )
    import jax

    g = jax.grad(lambda v: expm1inv(v))(700.0)
    assert np.isfinite(g)


def test_texp_mean_quadrature():
    "Truncated-exponential mean vs quadrature, across the branch boundary."
    import scipy.integrate

    from phlash_tpu.utils import texp_mean

    for r in [1e-8, 0.05, 0.0999, 0.1001, 1.0, 30.0]:
        num, _ = scipy.integrate.quad(lambda u: u * r * np.exp(-r * u), 0, 1)
        den = -np.expm1(-r)
        np.testing.assert_allclose(
            float(texp_mean(jnp.float64(r))), num / den, rtol=1e-7, err_msg=str(r)
        )
    # limits: uniform at 0, instant decay at infinity
    np.testing.assert_allclose(float(texp_mean(jnp.float64(0.0))), 0.5)
    assert float(texp_mean(jnp.float64(1e6))) < 1e-5


def test_kahan_add():
    from phlash_tpu.utils import kahan_add

    s = (jnp.float32(0.0), jnp.float32(0.0))
    for _ in range(10000):
        s = kahan_add(s, jnp.float32(1e-4))
    # naive f32 accumulation of 1e4 * 1e-4 drifts by ~1e-4; Kahan is exact
    np.testing.assert_allclose(float(s[0]), 1.0, rtol=1e-7)
