"""phlash_tpu — TPU-native Bayesian inference of ancestral population size.

A ground-up, TPU-first framework with the capability surface of
jthlab/phlash (Bayesian PSMC via SVGD over a pair-coalescent HMM).  The
public API matches the reference package
(/root/reference/src/phlash/__init__.py:18-24): `fit`, `contig`, `psmc`,
`DemographicModel`, `SizeHistory`, `plot_posterior`.

TPU-first defaults: float32 end-to-end on device (no global x64 — the
reference's x64 default would be emulated and slow on TPU; long
log-likelihood sums use compensated accumulation instead), XLA never
preallocates the whole HBM, and the heavy compute paths are jitted,
mesh-shardable programs with no host callbacks.
"""

import os

# keep XLA from grabbing all device memory before the data tensors are sized
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax as _jax

# x64 stays enabled so f64 is *available* (quadrature oracles, the
# double_precision_params=True fallback, int64-safe host indexing), but
# the default parameter graph is float32: the assembly is
# cancellation-free (phlash_tpu.transition._expQ2), matmuls pin
# Precision.HIGHEST, and transcendentals use faithfully-rounded f32
# implementations (utils/accurate.py) — measured equal posterior
# recovery to f64 at 2.2x the fit speed (docs/DESIGN.md).  The reference
# instead requires f64 throughout (/root/reference/src/phlash/__init__.py:16).
_jax.config.update("jax_enable_x64", True)

# TPU kernel compiles are expensive (minutes); persist them across runs.
# Opt out with PHLASH_TPU_NO_COMPILE_CACHE=1 or by setting your own
# JAX_COMPILATION_CACHE_DIR.
if not os.environ.get("PHLASH_TPU_NO_COMPILE_CACHE"):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "phlash_tpu", "xla"),
    )

from phlash_tpu.data import contig
from phlash_tpu.mcmc import fit
from phlash_tpu.plot import plot_posterior
from phlash_tpu.psmc import psmc
from phlash_tpu.size_history import DemographicModel, SizeHistory

__all__ = [
    "fit",
    "contig",
    "psmc",
    "DemographicModel",
    "SizeHistory",
    "plot_posterior",
]

__version__ = "0.1.0"
