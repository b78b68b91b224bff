"""CLI + posterior serialization tests."""

import pytest
import subprocess
import sys

import numpy as np

from phlash_tpu.results import load_posterior, save_posterior
from phlash_tpu.size_history import DemographicModel, SizeHistory


def test_posterior_roundtrip(tmp_path):
    dms = [
        DemographicModel(
            eta=SizeHistory(t=np.array([0.0, 1.0]), c=np.array([1.0, 2.0])),
            theta=1e-3,
            rho=2e-3,
        ),
        DemographicModel(
            eta=SizeHistory(t=np.array([0.0, 2.0]), c=np.array([0.5, 1.5])),
            theta=1e-3,
            rho=None,
        ),
    ]
    path = str(tmp_path / "post.npz")
    save_posterior(path, dms)
    back = load_posterior(path)
    assert len(back) == 2
    np.testing.assert_allclose(np.asarray(back[0].eta.c), [1.0, 2.0])
    assert back[1].rho is None
    np.testing.assert_allclose(back[1].theta, 1e-3)


@pytest.mark.slow  # subprocess fit: fresh jax import + step compile (~30 s)
def test_cli_fit_psmcfa(tmp_path):
    "End-to-end CLI smoke test on a tiny psmcfa input (subprocess, CPU)."
    seq = "".join(np.random.default_rng(0).choice(list("TTTK"), size=3000))
    fa = tmp_path / "in.psmcfa"
    fa.write_text(f">chr1\n{seq}\n")
    out = tmp_path / "post.npz"
    plot = tmp_path / "post.png"
    env = dict(JAX_PLATFORMS="cpu")
    import os

    env = {**os.environ, **env}
    r = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import phlash_tpu.__main__ as m, sys; sys.exit(m.main(sys.argv[1:]))",
            "fit", str(fa), "--niter", "2", "--particles", "4",
            "--out", str(out), "--plot", str(plot),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and plot.exists()
    back = load_posterior(str(out))
    assert len(back) == 4
