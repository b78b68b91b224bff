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
