"""Simulator sanity (cf. reference tests/test_sim.py, dependency-free tier)."""

import numpy as np
import pytest

from phlash_tpu.hmm import psmc_ll_dm
from phlash_tpu.params import PSMCParams
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


@pytest.mark.slow  # statistical check over a long simulated sequence (~6 s)
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


# -- scrm transposed-segsites parser ------------------------------------------


def _canned_scrm(L=1000, variants=None):
    """A miniature scrm --transpose-segsites stream: 4 haplotypes (2 diploids).

    Format as emitted by scrm 1.7 (echoed command, // rep marker, a
    'position' header, then `pos time hap...` rows and a trailing SFS line).
    """
    variants = variants or [
        (12.3, "0 1 0 0"),   # dip0 het, dip1 hom -> k=1
        (130.9, "1 1 0 1"),  # dip0 hom, dip1 het -> k=3
        (131.2, "0 1 1 0"),  # both het          -> k=2
        (999.0, "1 1 1 1"),  # fixed: no het, not in AFS (k=n)
    ]
    lines = [
        f"scrm 4 1 -t 10 -r 5 {L} --transpose-segsites -SC abs -p 14 -oSFS -seed 1",
        "987654 321 42",
        "",
        "//",
        "position time",
    ]
    lines += [f"{p} 0.5 {g}" for p, g in variants]
    lines.append("SFS: 1 2 0")
    return lines


def test_parse_scrm_stream():
    from phlash_tpu.sim import parse_scrm_stream

    contig = parse_scrm_stream(_canned_scrm(), window_size=100)
    assert contig.het_matrix.shape == (2, 10)
    want0 = np.zeros(10, int)
    want0[0] = 1  # pos 12
    want0[1] = 1  # pos 131
    want1 = np.zeros(10, int)
    want1[1] = 2  # pos 130 and 131
    np.testing.assert_array_equal(contig.het_matrix[0], want0)
    np.testing.assert_array_equal(contig.het_matrix[1], want1)
    np.testing.assert_array_equal(contig.afs, [1, 1, 1])  # k = 1, 2, 3
    assert contig.window_size == 100


def test_parse_scrm_stream_position_clipping():
    "A site exactly at L lands in the final window, not out of bounds."
    from phlash_tpu.sim import parse_scrm_stream

    contig = parse_scrm_stream(
        _canned_scrm(L=1000, variants=[(1000.0, "0 1 0 0")]), window_size=100
    )
    assert contig.het_matrix[0, 9] == 1


def test_parse_scrm_stream_rejects_garbage():
    import pytest as _pytest

    from phlash_tpu.sim import parse_scrm_stream

    with _pytest.raises(ValueError):
        parse_scrm_stream(["msprime 4 1"], window_size=100)
    with _pytest.raises(ValueError):
        parse_scrm_stream(["scrm 4 1 -t 1 -r 5 100"], window_size=100)  # no body


def test_scrm_threshold_constant():
    "Engine switch point matches the reference (sim.py:165-173)."
    from phlash_tpu.sim import SCRM_RHO_THRESHOLD

    assert SCRM_RHO_THRESHOLD == 1e5


# -- continuous-time SMC' simulator (the non-circular validation source) -----


def test_continuous_simulator_marginal_matches_pi():
    """Time-averaged TMRCA occupancy must match the stationary law pi.

    pi comes from SizeHistory.p_coal (survival-function differences); the
    simulator never touches that code path — it inverts the cumulative
    hazard directly — so agreement is a two-implementation cross-check."""
    from phlash_tpu.sim import _segments_smc_continuous

    dm = constant_demography(theta=1e-2)
    starts, tmrca = _segments_smc_continuous(dm, 400_000, np.random.default_rng(1))
    lengths = np.diff(starts)
    t = np.asarray(dm.eta.t)
    emp = np.zeros(len(t))
    np.add.at(emp, np.searchsorted(t, tmrca, side="right") - 1, lengths)
    emp /= emp.sum()
    pi = np.asarray(PSMCParams.from_dm(dm).pi)
    assert 0.5 * np.abs(emp - pi).sum() < 0.06


def test_continuous_simulator_transitions_match_matrix():
    """Window-binned transition frequencies must match transition_matrix.

    THE anti-circularity check: the discretized SMC' transition matrix
    (associative-scan matrix exponentials) against empirical transition
    counts from the exact continuous process, which shares no code with it
    beyond the (t, c) arrays."""
    from phlash_tpu.sim import _segments_smc_continuous
    from phlash_tpu.transition import transition_matrix

    dm = constant_demography(theta=1e-2)
    L = 400_000
    starts, tmrca = _segments_smc_continuous(dm, L, np.random.default_rng(1))
    t = np.asarray(dm.eta.t)
    sw = tmrca[np.searchsorted(starts, np.arange(L) + 0.5, side="right") - 1]
    si = np.searchsorted(t, sw, side="right") - 1
    M = len(t)
    C = np.zeros((M, M))
    np.add.at(C, (si[:-1], si[1:]), 1.0)
    A = np.asarray(transition_matrix(dm))
    checked = 0
    for i in range(M):
        n = C[i].sum()
        if n > 2000:
            assert 0.5 * np.abs(C[i] / n - A[i]).sum() < 0.02, f"row {i}"
            checked += 1
    assert checked >= 5  # the well-visited core of the state space


def test_continuous_simulator_het_rate_and_determinism():
    from phlash_tpu.sim import simulate_smc_continuous

    dm = constant_demography(theta=1e-2)
    c1 = simulate_smc_continuous(dm, 100_000, seed=3)
    c2 = simulate_smc_continuous(dm, 100_000, seed=3)
    np.testing.assert_array_equal(c1.het_matrix, c2.het_matrix)
    assert c1.het_matrix.shape == (1, 100_000)
    # E[het] = theta * E[TMRCA] = 1e-2 for the constant model
    assert abs(c1.het_matrix.mean() - 1e-2) < 2e-3
    c3 = simulate_smc_continuous(dm, 100_000, seed=4)
    assert (c1.het_matrix != c3.het_matrix).any()
