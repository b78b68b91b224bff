"""Batched dense-transition HMM kernel in plain XLA.

The portable fast path (and the semantics oracle for the Pallas kernel):
the forward recursion is expressed with dense `alpha @ A` products so XLA
can vectorize the (particle, chunk) batch onto wide vector/matrix units, and
the site loop is a two-level scan — an outer scan over segments whose body
is `jax.checkpoint`ed — so reverse-mode autodiff stores only O(L / seg_len)
checkpointed states per sequence instead of O(L) (the sqrt-memory remat
schedule).  This replaces the reference's forward-mode CUDA derivative
propagation (O(7 M^2) per site, /root/reference/src/phlash/gpu.py:575-692)
with reverse mode at O(M) forward + O(M^2)-equivalent backward per site and
~37x fewer gradient FLOPs at M=16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from phlash_tpu.ops.packing import dense_transition
from phlash_tpu.params import PSMCParams
from phlash_tpu.size_history import DemographicModel
from phlash_tpu.utils.accurate import matmul_hi


def _pick_seg_len(L: int) -> int:
    "Segment length ~ sqrt(L), rounded to a multiple of 128 for tiling."
    target = int(np.sqrt(L))
    return int(np.clip(((target + 127) // 128) * 128, 128, 4096))


@partial(jax.jit, static_argnames=("seg_len",))
def forward_ll_dense(pp: PSMCParams, data: jax.Array, seg_len: int = 512):
    """Forward log-likelihood of one int8 sequence under dense transitions.

    Returns (final filtered distribution, log-likelihood).  `data` is padded
    to a multiple of seg_len with the sentinel -2, which makes padded sites
    exact no-ops (unlike -1/"missing", which still advances the HMM state
    and therefore carries transition-matrix gradient).
    """
    A = dense_transition(pp)
    # emission row per obs; obs -1 indexes the trailing ones-row (missing)
    emis = jnp.stack([pp.emis0, pp.emis1, jnp.ones_like(pp.emis0)])  # (3, M)
    L = data.shape[-1]
    n_seg = -(-L // seg_len)
    pad = n_seg * seg_len - L
    data = jnp.pad(data, (0, pad), constant_values=-2)
    segs = data.reshape(n_seg, seg_len)

    @jax.checkpoint
    def segment(carry, obs_seg):
        alpha, ll = carry

        def site(c, ob):
            a, l = c
            live = ob >= -1
            a2 = matmul_hi(a, A) * emis[
                jnp.clip(ob, -1, 1)
            ]
            norm = jnp.maximum(a2.sum(), 1e-35)
            a = jnp.where(live, a2 / norm, a)
            l = l + jnp.where(live, jnp.log(norm), 0.0)
            return (a, l), None

        (alpha, ll_seg), _ = lax.scan(site, (alpha, jnp.zeros_like(ll)), obs_seg)
        return (alpha, ll + ll_seg), None

    init = (pp.pi, jnp.zeros((), pp.pi.dtype))
    (alpha, ll), _ = lax.scan(segment, init, segs)
    return alpha, ll


class DenseKernel:
    """Likelihood kernel over a device-resident int8 chunk tensor.

    `loglik` is pure and differentiable; batching over chunks and particles
    happens through vmap (XLA turns the per-site dense products into batched
    matmuls).  See kernel_pallas.PallasKernel for the hand-tiled TPU variant.
    """

    def __init__(self, M: int, data, double_precision: bool = False, seg_len: int = None):
        self.M = M
        self.data = jnp.asarray(data, dtype=jnp.int8)
        self.double_precision = double_precision
        self.seg_len = seg_len or _pick_seg_len(self.data.shape[-1])

    @property
    def float_type(self):
        return jnp.float64 if self.double_precision else jnp.float32

    def loglik(self, pp, index):
        "Log-likelihood of chunk `index` under parameters `pp`."
        if isinstance(pp, DemographicModel):
            pp = PSMCParams.from_dm(pp)
        pp = jax.tree.map(lambda a: a.astype(self.float_type), pp)
        return forward_ll_dense(pp, self.data[index], seg_len=self.seg_len)[1]

    def loglik_batched(self, pps, inds):
        """Explicitly batched entry: pps has leading (B, S) axes, inds (S,).

        Returns (B, S) log-likelihoods.  Overridden by the Pallas kernel with
        a packed implementation; here it is a double vmap.
        """
        per_chunk = jax.vmap(self.loglik, in_axes=(0, 0))  # over S
        return jax.vmap(per_chunk, in_axes=(0, None))(pps, inds)  # over B

    def filter_batched(self, pps, warmup):
        """Filtered state over warmup prefixes: (B, S, M), differentiable.

        pps leaves: (B, M) (or (B, S, M), chunk-invariant); warmup (S, L0).
        """
        def one(pp_leaf_sel, w):
            return forward_ll_dense(pp_leaf_sel, w, seg_len=self.seg_len)[0]

        def per_particle(pp):
            pp = jax.tree.map(lambda a: a[0] if a.ndim == 2 else a, pp)
            pp = jax.tree.map(lambda a: a.astype(self.float_type), pp)
            return jax.vmap(lambda w: one(pp, w))(jnp.asarray(warmup))

        return jax.vmap(per_particle)(pps)

    def __call__(self, pp, index, grad: bool):
        index = jnp.asarray(index)
        assert index.ndim in (0, 1)
        f = self.loglik
        if grad:
            f = jax.value_and_grad(f)
        if index.ndim == 1:
            f = jax.vmap(f, in_axes=(None, 0))
        return f(pp, index)
