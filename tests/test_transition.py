"""Transition-matrix oracles (cf. reference tests/test_transition.py:21-48)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate
import scipy.linalg

from phlash_tpu.size_history import DemographicModel, SizeHistory
from phlash_tpu.transition import expQ, q_s, transition_matrix


@pytest.mark.parametrize("n", [2, 3, 5])
def test_expQ_vs_scipy_expm(rng, n):
    r = rng.uniform(0.01, 2.0)
    c = rng.uniform(0.1, 3.0)
    Q = np.array(
        [
            [-r, r, 0.0],
            [c, -(n * c), (n - 1) * c],
            [0.0, 0.0, 0.0],
        ]
    )
    expected = scipy.linalg.expm(Q)
    np.testing.assert_allclose(np.asarray(expQ(r, c, n)), expected, rtol=1e-8, atol=1e-12)


def test_expQ_small_u():
    "Series branch for tiny eigenvalue gap must stay finite with gradients."
    g = jax.grad(lambda r: expQ(r, r / 2.0, 2)[0, 1])(1e-9)
    assert np.isfinite(float(g))


def test_rows_sum_to_one(dm):
    A = np.asarray(transition_matrix(dm))
    np.testing.assert_allclose(A.sum(1), 1.0, rtol=1e-6)
    assert (A >= 0).all()


def test_rows_sum_to_one_variable(rng):
    M = 16
    t = np.concatenate([[0.0], np.sort(rng.uniform(1e-3, 10.0, M - 1))])
    c = rng.uniform(0.2, 4.0, M)
    dm = DemographicModel(eta=SizeHistory(t=t, c=c), theta=1e-2, rho=1.3e-2)
    A = np.asarray(transition_matrix(dm))
    np.testing.assert_allclose(A.sum(1), 1.0, rtol=1e-5)


@pytest.mark.slow  # scipy.quad oracle (~7 s); related quadrature oracles run fast in test_size_history
def test_q_s_integrates_to_one(dm):
    "Continuous density + atom must integrate to 1 (quadrature oracle)."
    s = 1.0
    q, atom = q_s(eta=dm.eta, s=s, r=0.02)
    qj = jax.jit(q)  # quad makes hundreds of point evals; one compile wins
    t_hi = float(dm.eta.t[-1]) + 60.0 / float(np.min(np.asarray(dm.eta.c)))
    val, _ = scipy.integrate.quad(
        lambda t: float(qj(t)), 0.0, t_hi, points=list(dm.eta.t) + [s], limit=300
    )
    np.testing.assert_allclose(val + float(atom), 1.0, rtol=1e-5)


def test_assembly_dtype_follows_inputs(dm):
    """The assembly respects the input dtype (f64 here under package x64),
    and the small lower-triangle entries are meaningful — strictly positive,
    stable under tiny perturbation — not complement noise.  (Historically
    the f32 assembly was catastrophically wrong, forcing f64; the
    cancellation-free rewrite made f32 safe — see
    test_assembly_f32_matches_f64.)"""
    from phlash_tpu.params import PSMCParams

    A = transition_matrix(dm)
    assert A.dtype == np.float64
    pp = PSMCParams.from_dm(dm)
    assert pp.b.dtype == np.float64
    # entries into the earliest interval are tiny but strictly positive and
    # far below f32's absolute-error floor around 1.0
    col0 = np.asarray(A[1:, 0])
    assert (col0 > 0).all()
    assert col0.max() < 1e-4
    dm2 = dm._replace(rho=dm.rho * (1 + 1e-9))
    col0b = np.asarray(transition_matrix(dm2)[1:, 0])
    np.testing.assert_allclose(col0, col0b, rtol=1e-5)


def test_assembly_f32_matches_f64():
    """The assembly must be cancellation-free: float32 reproduces float64 to
    ~1e-5 relative on every entry above 1e-12, across realistic geometric
    grids.  (The original formulation was off by up to ~12% in f32 — the
    reason round-1 forced f64 parameter assembly.)"""
    rng = np.random.default_rng(11)
    worst = 0.0
    for _ in range(5):
        t1 = 10 ** rng.uniform(-5, -3)
        tM = 10 ** rng.uniform(0.5, 1.5)
        t = np.concatenate([[0.0], np.geomspace(t1, tM, 15)])
        cvals = 10 ** rng.uniform(-1.3, 1.3, 16)
        theta = 10 ** rng.uniform(-4, -1)
        rho = theta * 10 ** rng.uniform(-1, 1)

        def build(dtype):
            dm_ = DemographicModel(
                eta=SizeHistory(t=jnp.asarray(t, dtype), c=jnp.asarray(cvals, dtype)),
                theta=dtype(theta),
                rho=dtype(rho),
            )
            return np.asarray(transition_matrix(dm_))

        A64, A32 = build(jnp.float64), build(jnp.float32)
        mask = A64 > 1e-12
        worst = max(worst, (np.abs(A32 - A64) / A64)[mask].max())
    assert worst < 3e-5, worst


def test_expQ2_degenerate_f32_no_nan():
    "c = r = 0 in pure float32 must give the identity, not 0/0 NaNs."
    from phlash_tpu.transition import _expQ2

    P2, p02, p12 = _expQ2(jnp.float32(0.0), jnp.float32(0.0), 2)
    assert P2.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(P2), np.eye(2), atol=1e-7)
    assert float(p02) == 0.0 and float(p12) == 0.0
    # and gradients through the guard stay finite
    g = jax.grad(lambda r: _expQ2(r, jnp.float32(0.5), 2)[1])(jnp.float32(0.0))
    assert np.isfinite(float(g))
