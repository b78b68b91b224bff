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
