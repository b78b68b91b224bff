"""The docs/example.py walkthrough must actually execute end to end.

Counterpart of the reference's notebooks/example.md, but continuously
verified: BCF write -> contig -> fit (mesh, checkpoint, steps_per_call,
held-out ELPD) -> plot -> confidence band.
"""

import os
import subprocess
import sys

import pytest

EXAMPLE = os.path.join(os.path.dirname(__file__), "..", "docs", "example.py")


@pytest.mark.heavy  # a full (small) fit compile + MILP (~3-4 min on one core)
def test_example_walkthrough(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, EXAMPLE, str(tmp_path)],
        env=env,
        capture_output=True,
        text=True,
        # ~6 min warm, but a cold XLA compile cache on one core can take
        # ~2x that (the fused fit graph on the virtual 8-device mesh)
        timeout=1800,
    )
    assert r.returncode == 0, f"example failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    assert "DONE" in r.stdout
    assert (tmp_path / "example.bcf").exists()
    assert (tmp_path / "fit_ckpt.npz").exists()
