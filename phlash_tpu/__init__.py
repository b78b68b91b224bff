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

# x64 stays enabled: parameter assembly runs in float64 by default (the
# reference makes the same choice, /root/reference/src/phlash/__init__.py:16).
# The assembly VALUES are now cancellation-free in f32 too
# (phlash_tpu.transition._expQ2), and double_precision_params=False opts
# into a ~2.7x-faster all-f32 differentiated graph — experimental: its
# gradient path currently degrades posterior recovery (docs/DESIGN.md).
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
