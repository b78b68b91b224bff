"""Confidence-band MILP tests (the reference skips its own as 'too slow';
ours uses scipy/HiGHS on a small instance so it can actually run)."""

import numpy as np

from phlash_tpu.cband import confidence_band
from phlash_tpu.size_history import SizeHistory


def test_confidence_band_covers():
    rng = np.random.default_rng(0)
    # posterior-like cloud: constant histories with jittered levels
    samples = [
        SizeHistory(t=np.array([0.0, 1.0, 5.0]), c=np.exp(rng.normal(0, 0.2, 3)))
        for _ in range(20)
    ]
    lower, upper = confidence_band(samples, level=0.9, num_points=8)
    t = np.asarray(lower.t)
    lo = np.asarray(lower(t, Ne=True))
    hi = np.asarray(upper(t, Ne=True))
    assert (hi >= lo - 1e-9).all()
    # at least 90% of paths inside the band everywhere
    inside = 0
    for s in samples:
        f = np.asarray(s(t, Ne=True))
        inside += bool((f >= lo - 1e-6).all() and (f <= hi + 1e-6).all())
    assert inside >= int(np.ceil(0.9 * len(samples)))


def test_plot_posterior_runs(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from phlash_tpu.plot import plot_posterior
    from phlash_tpu.size_history import DemographicModel, SizeHistory

    rng = np.random.default_rng(0)
    dms = [
        DemographicModel(
            eta=SizeHistory(
                t=np.array([0.0, 0.5, 2.0]), c=np.exp(rng.normal(0, 0.3, 3))
            ),
            theta=1e-4,
            rho=1e-4,
        )
        for _ in range(10)
    ]
    fig, ax = plt.subplots()
    t, med, band = plot_posterior(dms, ax=ax)
    assert len(t) == len(med) == 200
    lo, hi = band
    assert (hi >= lo).all()
    fig.savefig(tmp_path / "p.png")
