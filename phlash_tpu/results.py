"""Posterior serialization: save/load lists of DemographicModel samples.

The reference returns plain named tuples and leaves persistence to the user;
here `save_posterior`/`load_posterior` give a stable npz container used by
the CLI and convenient for downstream analysis.
"""

from __future__ import annotations

import numpy as np

from phlash_tpu.size_history import DemographicModel, SizeHistory


def save_posterior(path: str, posterior: list[DemographicModel]) -> None:
    "Write posterior samples to an .npz file."
    t = np.stack([np.asarray(dm.eta.t) for dm in posterior])
    c = np.stack([np.asarray(dm.eta.c) for dm in posterior])
    theta = np.array([float(dm.theta) for dm in posterior])
    rho = np.array(
        [float(dm.rho) if dm.rho is not None else np.nan for dm in posterior]
    )
    np.savez_compressed(path, t=t, c=c, theta=theta, rho=rho)


def load_posterior(path: str) -> list[DemographicModel]:
    "Read posterior samples written by save_posterior."
    with np.load(path) as z:
        out = []
        for t, c, theta, rho in zip(z["t"], z["c"], z["theta"], z["rho"]):
            eta = SizeHistory(t=t, c=c)
            out.append(
                DemographicModel(
                    eta=eta, theta=float(theta), rho=None if np.isnan(rho) else float(rho)
                )
            )
        return out
