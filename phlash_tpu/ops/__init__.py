"""Optimized HMM compute kernels.

Backends (all sharing the interface defined in phlash_tpu.kernel):

* kernel_dense — batched dense-transition XLA implementation with
  segment-checkpointed autodiff; portable, and the correctness bridge
  between the O(M) scan oracle and the Pallas kernel.
* kernel_pallas — the TPU-native fused kernel: per-particle 16x16 transition
  matrices packed block-diagonally into 128-lane MXU tiles, observation
  chunks streamed from HBM, per-site rescaling, custom VJP.
"""

from phlash_tpu.ops.packing import dense_transition

__all__ = ["dense_transition"]
