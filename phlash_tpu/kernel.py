"""Likelihood-kernel dispatch: pick the fastest backend for this platform.

Mirrors the reference dispatch (/root/reference/src/phlash/kernel.py:7-24)
with TPU-first priorities: the fused MXU/Pallas kernel on TPU, the batched
dense-XLA kernel elsewhere, and the O(M) scan oracle always available for
testing.  All backends share the interface::

    kern.loglik(pp, index) -> float      # jittable, differentiable
    kern(pp, index, grad)  -> ll or (ll, grads)
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def get_kernel(M: int, data, double_precision: bool = False, backend: str = None):
    """Return a likelihood kernel for the int8 chunk tensor `data`.

    Args:
        M: number of TMRCA discretization intervals (16 is the tuned value).
        data: int8 array (num_chunks, chunk_len).
        double_precision: use float64 state (slow on TPU; CPU testing only).
        backend: force "scan" (O(M) oracle), "dense" (batched XLA), or
            "pallas" (TPU fused kernel); default picks per platform.
    """
    if backend is None:
        platform = jax.default_backend()
        backend = "pallas" if platform == "tpu" else "dense"
    if backend == "pallas":
        try:
            from phlash_tpu.ops.kernel_smc import SMCKernel

            return SMCKernel(M_=M, data=data, double_precision=double_precision)
        except Exception as e:  # pragma: no cover - platform dependent
            logger.warning("Pallas kernel unavailable (%s); using dense XLA kernel", e)
            backend = "dense"
    if backend == "pallas_mxu":  # kept for A/B benchmarking
        from phlash_tpu.ops.kernel_pallas import PallasKernel

        return PallasKernel(M_=M, data=data, double_precision=double_precision)
    if backend == "dense":
        from phlash_tpu.ops.kernel_dense import DenseKernel

        return DenseKernel(M=M, data=data, double_precision=double_precision)
    if backend == "scan":
        from phlash_tpu.hmm import PureXLAKernel

        return PureXLAKernel(M=M, data=data, double_precision=double_precision)
    raise ValueError(f"unknown kernel backend: {backend}")
