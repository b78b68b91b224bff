"""Simulator sanity (cf. reference tests/test_sim.py, dependency-free tier)."""

import numpy as np

from phlash_tpu.hmm import psmc_ll_dm
from phlash_tpu.sim import (
    bottleneck_demography,
    constant_demography,
    simulate_hmm,
    zigzag_demography,
)


def test_simulate_shapes():
    dm = constant_demography()
    c = simulate_hmm(dm, L=5000, key=0)
    assert c.het_matrix.shape == (1, 5000)
    assert set(np.unique(c.het_matrix)) <= {0, 1}


def test_simulate_missing():
    dm = constant_demography()
    c = simulate_hmm(dm, L=5000, key=0, missing_frac=0.3)
    frac = (c.het_matrix == -1).mean()
    assert 0.2 < frac < 0.4


def test_het_rate_matches_expectation():
    """Empirical het rate ~ E_pi[emis1].  Tolerance is loose because TMRCA
    segments are long-range correlated, shrinking the effective sample."""
    from phlash_tpu.params import PSMCParams

    for theta in [5e-3, 2e-2]:
        dm = constant_demography(theta=theta, rho=2e-2)
        pp = PSMCParams.from_dm(dm)
        expected = float((np.asarray(pp.pi) * np.asarray(pp.emis1)).sum())
        got = simulate_hmm(dm, L=200_000, key=1).het_matrix.mean()
        assert abs(got / expected - 1.0) < 0.5, (theta, got, expected)


def test_true_model_scores_higher():
    "The generating model should out-score a wrong model on average."
    truth = bottleneck_demography(theta=1e-2)
    wrong = zigzag_demography(theta=1e-2)
    obs = simulate_hmm(truth, L=20_000, key=2).het_matrix[0]
    ll_true = float(psmc_ll_dm(truth, obs)[1])
    ll_wrong = float(psmc_ll_dm(wrong, obs)[1])
    assert ll_true > ll_wrong
