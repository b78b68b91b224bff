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


# -- scrm subprocess end-to-end (fake executable + stub demes) ----------------
#
# The optional demes/stdpopsim packages are absent here, so the subprocess
# tier is exercised with a minimal demes stand-in and a fake `scrm` binary
# that echoes its argv (as real scrm does) and emits a canned
# transposed-segsites stream.  This executes the real command assembly,
# process spawn, stream parse, and exit-status handling end to end
# (cf. reference sim.py:191-252, whose scrm path is equally subprocess-driven).


def _install_fake_demes(monkeypatch, ms_flags=""):
    import sys
    import types

    fake = types.ModuleType("demes")
    calls = []

    def to_ms(graph, *, N0, samples):
        calls.append({"graph": graph, "N0": N0, "samples": list(samples)})
        return ms_flags

    fake.to_ms = to_ms
    monkeypatch.setitem(sys.modules, "demes", fake)
    return calls


def _fake_stdpopsim_pair(L):
    "Duck-typed (model, chrom) shaped like stdpopsim's objects."
    from types import SimpleNamespace

    graph = SimpleNamespace(demes=[SimpleNamespace(name="pop0")])
    model = SimpleNamespace(model=SimpleNamespace(to_demes=lambda: graph))
    chrom = SimpleNamespace(
        interval_list=[np.array([[0.0, float(L)]])],
        mutation_rate=1e-8,
        recombination_map=SimpleNamespace(rate=np.array([1e-8])),
    )
    return model, chrom


def _write_fake_scrm(tmp_path, body_lines, exit_code=0):
    "A fake scrm: echo argv (like the real binary), print the canned body."
    script = tmp_path / "scrm"
    body = "".join(f"print({line!r})\n" for line in body_lines)
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        'print(" ".join(sys.argv))\n' + body + f"sys.exit({exit_code})\n"
    )
    script.chmod(0o755)
    return script


_SCRM_BODY = [
    "1234 5678 42",
    "",
    "//",
    "position time",
    "12.5 0.1 0 1",  # window 0: het, k=1
    "130.0 0.2 1 1",  # fixed (k=n): no het, not in AFS
    "942.0 0.3 1 0",  # window 9: het, k=1
    "SFS: 2 0",
]


def test_simulate_scrm_subprocess_end_to_end(tmp_path, monkeypatch):
    from phlash_tpu.sim import simulate_scrm

    calls = _install_fake_demes(monkeypatch)
    monkeypatch.setenv("SCRM_PATH", str(_write_fake_scrm(tmp_path, _SCRM_BODY)))
    model, chrom = _fake_stdpopsim_pair(L=1000)
    contig = simulate_scrm(model, chrom, {"pop0": 1}, N0=1e4, seed=7)
    # demography rendered once, with 2 haplotypes routed to the right deme
    assert calls == [{"graph": model.model.to_demes(), "N0": 1e4, "samples": [2]}]
    assert contig.het_matrix.shape == (1, 10)
    want = np.zeros(10, int)
    want[0] = want[9] = 1
    np.testing.assert_array_equal(contig.het_matrix[0], want)
    np.testing.assert_array_equal(contig.afs, [2])


def test_simulate_scrm_nonzero_exit_raises(tmp_path, monkeypatch):
    from phlash_tpu.sim import simulate_scrm

    _install_fake_demes(monkeypatch)
    monkeypatch.setenv(
        "SCRM_PATH", str(_write_fake_scrm(tmp_path, _SCRM_BODY, exit_code=3))
    )
    model, chrom = _fake_stdpopsim_pair(L=1000)
    with pytest.raises(RuntimeError, match="status 3"):
        simulate_scrm(model, chrom, {"pop0": 1}, N0=1e4, seed=7)


def test_build_scrm_command_windowed_approximation(monkeypatch):
    "Very large samples get scrm's -l 100r window approximation (ref :229-233)."
    from phlash_tpu.sim import build_scrm_command

    _install_fake_demes(monkeypatch, ms_flags="-eN 0.5 2.0")
    graph = object()
    argv = build_scrm_command(graph, [300], N0=1e4, theta=0.4, rho=0.4, L=1000, seed=1)
    assert argv[1:3] == ["300", "1"]
    assert "-eN" in argv and "--transpose-segsites" in argv
    assert argv[argv.index("-l") + 1] == "100r"
    small = build_scrm_command(graph, [2], N0=1e4, theta=0.4, rho=0.4, L=1000, seed=1)
    assert "-l" not in small


# -- stdpopsim catalog harness via a duck-typed stdpopsim (package absent) ----
#
# stdpopsim_dataset's own logic — chromosome filtering, the 4*N0*r*L engine
# switch, scrm-failure fallback, sample routing, truth construction — is all
# executable without the real package; only `engine.simulate` and the
# demography debugger are external.  (Reference sim.py:28-102.)


class _FakeDebugger:
    epoch_start_time = np.array([0.0, 100.0])
    mean_coal_calls = 0

    def mean_coalescence_time(self, lineages):
        assert lineages == {"pop0": 2}
        _FakeDebugger.mean_coal_calls += 1
        return 2.0e4  # -> N0 = 1e4

    def coalescence_rate_trajectory(self, t, lineages):
        assert lineages == {"pop0": 2}
        return np.full(len(t), 5e-5), None


def _install_fake_stdpopsim(monkeypatch, lengths: dict):
    """A stdpopsim stand-in with chromosomes of the given {id: length}.

    Returns the (model, simulate_log) pair for assertions."""
    import sys
    import types
    from types import SimpleNamespace

    from test_data import _FakeTS

    graph = SimpleNamespace(demes=[SimpleNamespace(name="pop0")])
    demography = SimpleNamespace(debug=_FakeDebugger, to_demes=lambda: graph)
    model = SimpleNamespace(
        model=demography, populations=[SimpleNamespace(name="pop0")]
    )
    # r = 1e-6 (100x human) keeps the 4*N0*r*L scrm threshold reachable
    # with Mb-scale test chromosomes instead of 100-Mb ones
    chroms = [
        SimpleNamespace(
            id=cid, ploidy=2, recombination_rate=1e-6, mutation_rate=1.3e-8
        )
        for cid in lengths
    ] + [
        # must be filtered out: non-numeric id; non-diploid; non-recombining
        SimpleNamespace(id="X", ploidy=2, recombination_rate=1e-6, mutation_rate=1.3e-8),
        SimpleNamespace(id="9", ploidy=1, recombination_rate=1e-6, mutation_rate=1.3e-8),
        SimpleNamespace(id="8", ploidy=2, recombination_rate=0.0, mutation_rate=1.3e-8),
    ]

    def get_contig(cid, mutation_rate, length_multiplier):
        L = lengths[cid] * length_multiplier
        return SimpleNamespace(
            interval_list=[np.array([[0.0, L]])],
            recombination_map=SimpleNamespace(rate=np.array([1e-6])),
            mutation_rate=mutation_rate,
        )

    species = SimpleNamespace(
        genome=SimpleNamespace(chromosomes=chroms),
        get_contig=get_contig,
        get_demographic_model=lambda mid: model,
    )
    simulate_log = []

    def simulate(mdl, spec, samples, seed):
        assert mdl is model and samples == {"pop0": 1}
        L = int(spec.interval_list[0][0, 1])
        simulate_log.append((L, seed))
        rng = np.random.default_rng(seed)
        pos = np.sort(rng.choice(np.arange(1, L), size=10, replace=False))
        return _FakeTS(L, pos, rng.integers(0, 2, size=(10, 2)))

    fake = types.ModuleType("stdpopsim")
    fake.get_species = lambda sid: species
    fake.get_engine = lambda name: SimpleNamespace(simulate=simulate)
    monkeypatch.setitem(sys.modules, "stdpopsim", fake)
    return model, simulate_log


def test_stdpopsim_dataset_engine_switch(tmp_path, monkeypatch):
    """Chromosome 1 (4*N0*r*L = 1.2e5 > 1e5) goes to scrm; chromosome 2
    (4e3) to msprime; X / haploid / non-recombining ids are filtered."""
    from phlash_tpu.data import RawContig, TreeSequenceContig
    from phlash_tpu.sim import stdpopsim_dataset

    _FakeDebugger.mean_coal_calls = 0
    _install_fake_demes(monkeypatch)
    monkeypatch.setenv("SCRM_PATH", str(_write_fake_scrm(tmp_path, _SCRM_BODY)))
    model, sim_log = _install_fake_stdpopsim(
        monkeypatch, {"1": 3_000_000, "2": 100_000}
    )
    out = stdpopsim_dataset("FakeSap", "SomeModel_1X00", {"pop0": 1}, seed=5)
    assert set(out["data"]) == {"1", "2"}
    assert isinstance(out["data"]["1"], RawContig)  # scrm tier
    assert isinstance(out["data"]["2"], TreeSequenceContig)  # msprime tier
    assert sim_log == [(100_000, 6)]  # seed + chromosome index
    assert _FakeDebugger.mean_coal_calls == 1  # N0 computed once, reused
    truth = out["truth"]
    assert float(truth.theta) == 1.3e-8
    np.testing.assert_allclose(np.asarray(truth.eta.c), 5e-5)
    # the binned scrm contig is usable downstream
    d = out["data"]["1"].get_data(window_size=100)
    assert d["het_matrix"].shape[0] == 1


def test_stdpopsim_dataset_scrm_failure_falls_back(tmp_path, monkeypatch, caplog):
    from phlash_tpu.data import TreeSequenceContig
    from phlash_tpu.sim import stdpopsim_dataset

    _install_fake_demes(monkeypatch)
    bad = _write_fake_scrm(tmp_path, ["not a transpose-segsites stream"])
    monkeypatch.setenv("SCRM_PATH", str(bad))
    _, sim_log = _install_fake_stdpopsim(monkeypatch, {"1": 3_000_000})
    with caplog.at_level("WARNING", logger="phlash_tpu.sim"):
        out = stdpopsim_dataset("FakeSap", "SomeModel_1X00", {"pop0": 1}, seed=5)
    assert isinstance(out["data"]["1"], TreeSequenceContig)
    assert sim_log == [(3_000_000, 5)]
    assert any("using msprime" in r.message for r in caplog.records)


def test_stdpopsim_dataset_forced_engine(monkeypatch):
    "options={'engine': 'msprime'} skips the N0 computation entirely."
    from phlash_tpu.sim import stdpopsim_dataset

    _FakeDebugger.mean_coal_calls = 0
    _, sim_log = _install_fake_stdpopsim(monkeypatch, {"1": 3_000_000})
    out = stdpopsim_dataset(
        "FakeSap", "SomeModel_1X00", {"pop0": 1}, seed=5,
        options={"engine": "msprime"},
    )
    assert _FakeDebugger.mean_coal_calls == 0
    assert sim_log == [(3_000_000, 5)]
    assert set(out["data"]) == {"1"}


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


def test_continuous_simulator_multi_sample():
    # n_samples > 1: independent diploid SMC' paths stacked as het rows —
    # the exact generative match for the composite likelihood (which sums
    # per-row HMM log-likelihoods as if rows were independent pairs)
    from phlash_tpu.sim import simulate_smc_continuous

    dm = constant_demography(theta=1e-2)
    c = simulate_smc_continuous(dm, 20_000, seed=5, n_samples=3)
    assert c.het_matrix.shape == (3, 20_000)
    assert c.afs is None  # pairwise paths cannot produce a 2N-haplotype AFS
    assert c.N == 6  # three diploid rows = six ploids
    # rows are independent draws, not copies
    assert (c.het_matrix[0] != c.het_matrix[1]).any()
    # loose sanity bound only: at L=20k the TMRCA-path correlation makes the
    # per-contig het rate noisy (the tight rate check lives in
    # test_continuous_simulator_het_rate_and_determinism at L=100k)
    assert 2e-3 < c.het_matrix.mean() < 3e-2


def test_multi_sample_fit_end_to_end():
    # the full driver on an N>1 contig with no AFS: init_mcmc_data must
    # return afs=None and the likelihood must drop its AFS term
    import phlash_tpu
    from phlash_tpu.sim import simulate_smc_continuous

    dm = constant_demography(theta=1e-2)
    contig = simulate_smc_continuous(dm, 30_000, seed=6, n_samples=2)
    post = phlash_tpu.fit(
        [contig],
        niter=3,
        num_particles=8,
        progress=False,
        theta=1e-4,
        num_workers=1,
        kernel_backend="dense",
    )
    assert len(post) == 8
