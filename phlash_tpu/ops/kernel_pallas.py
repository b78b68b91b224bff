"""TPU likelihood kernel: packing wrapper + custom VJP around the Pallas op.

Packs (B particles x S chunks) HMMs into the MXU layout described in
pallas_hmm.py, exposes `loglik_batched(pps, inds) -> (B, S)` with full
reverse-mode differentiability: gradients w.r.t. the dense transition
matrix, emissions, and per-chunk initial distributions come from the Pallas
backward kernel; the chain rule back to demographic-model parameters runs
in XLA through ops.packing.dense_transition (so `jax.grad` through
phlash_tpu.model.log_density just works, with no host callbacks — contrast
/root/reference/src/phlash/gpu.py:441-472's pure_callback design).

Contract: transition/emission parameters must be chunk-invariant (only pi
may vary across chunks), which is how the model constructs them
(model.log_density replaces pi per chunk with the warmup-filtered state).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phlash_tpu.ops import pallas_hmm
from phlash_tpu.ops.pallas_hmm import DEFAULT_SEG, G_LANE, M, ROWS
from phlash_tpu.ops.packing import dense_transition
from phlash_tpu.params import PSMCParams
from phlash_tpu.size_history import DemographicModel


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_A(A: jnp.ndarray) -> jnp.ndarray:
    "(B_pad, 16, 16) -> (G, 128, 128) block-diagonal tiles."
    B_pad = A.shape[0]
    G = B_pad // G_LANE
    Ag = A.reshape(G, G_LANE, M, M)
    eye = jnp.eye(G_LANE, dtype=A.dtype)
    out = jnp.einsum("gpab,pq->gpaqb", Ag, eye)
    return out.reshape(G, G_LANE * M, G_LANE * M)


def _pack_rowvec(x: jnp.ndarray) -> jnp.ndarray:
    "(B_pad, 16) -> (G, 8, 128), broadcast over chunk rows."
    G = x.shape[0] // G_LANE
    lanes = x.reshape(G, 1, G_LANE * M)
    return jnp.broadcast_to(lanes, (G, ROWS, G_LANE * M))


def _pack_pi(pi: jnp.ndarray) -> jnp.ndarray:
    "(B_pad, S_pad, 16) -> (G, 8, 128): lanes = particle-in-group x state."
    B_pad, S_pad, _ = pi.shape
    G = B_pad // G_LANE
    # [g, s, p*16+m] = pi[g*8+p, s, m]
    return pi.reshape(G, G_LANE, S_pad, M).transpose(0, 2, 1, 3).reshape(G, S_pad, G_LANE * M)


def _unpack_ll(ll: jnp.ndarray) -> jnp.ndarray:
    "(G, 8, 128) lane-redundant -> (B_pad, S_pad)."
    G = ll.shape[0]
    per_particle = ll.reshape(G, ROWS, G_LANE, M)[..., 0]  # (G, S_pad, G_LANE)
    return per_particle.transpose(0, 2, 1).reshape(G * G_LANE, ROWS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _packed_ll(A, emis0, emis1, pi, obs, seg_len):
    """ll (B_pad, S_pad) from padded dense params.

    A (B_pad, 16, 16); emis0/1 (B_pad, 16); pi (B_pad, S_pad=8, 16);
    obs: (n_seg, seg_len) int32 packed codes (see pallas_hmm.pack_obs).
    """
    ll, _ = pallas_hmm.forward_packed(
        _pack_A(A), _pack_rowvec(emis0), _pack_rowvec(emis1), _pack_pi(pi), obs,
        seg_len=seg_len,
    )
    return _unpack_ll(ll)


def _packed_ll_fwd(A, emis0, emis1, pi, obs, seg_len):
    Ablk = _pack_A(A)
    ll, ckpt = pallas_hmm.forward_packed(
        Ablk, _pack_rowvec(emis0), _pack_rowvec(emis1), _pack_pi(pi), obs,
        seg_len=seg_len,
    )
    return _unpack_ll(ll), (Ablk, emis0, emis1, obs, ckpt)


def _packed_ll_bwd(seg_len, res, g):
    from phlash_tpu.ops.pallas_hmm_vjp import backward_packed

    Ablk, emis0, emis1, obs, ckpt = res
    B_pad = emis0.shape[0]
    G = B_pad // G_LANE
    # broadcast the (B_pad, S_pad) cotangent to every lane of each group
    gb = g.reshape(G, G_LANE, ROWS).transpose(0, 2, 1)  # (G, S_pad, G_LANE)
    gbar = jnp.repeat(gb, M, axis=2)  # (G, 8, 128)
    e0b = _pack_rowvec(emis0)
    e1b = _pack_rowvec(emis1)
    dAblk, de0, de1, dpi = backward_packed(Ablk, e0b, e1b, obs, ckpt, gbar, seg_len=seg_len)
    # unpack: block-diagonal 16x16 blocks -> (B_pad, 16, 16)
    dA = dAblk.reshape(G, G_LANE, M, G_LANE, M)
    idx = jnp.arange(G_LANE)
    dA = dA[:, idx, :, idx, :].transpose(1, 0, 2, 3).reshape(B_pad, M, M)
    # emission grads: sum over chunk rows, extract each particle's lanes
    de0 = de0.sum(1).reshape(G, G_LANE, M).reshape(B_pad, M)
    de1 = de1.sum(1).reshape(G, G_LANE, M).reshape(B_pad, M)
    dpi_u = dpi.reshape(G, ROWS, G_LANE, M).transpose(0, 2, 1, 3).reshape(B_pad, ROWS, M)
    return dA, de0, de1, dpi_u, None


_packed_ll.defvjp(_packed_ll_fwd, _packed_ll_bwd)


class PallasKernel:
    """MXU-packed likelihood kernel over a device-resident chunk tensor."""

    def __init__(self, M_: int = None, data=None, double_precision: bool = False,
                 seg_len: int = DEFAULT_SEG, **kw):
        M_ = M_ or kw.pop("M", 16)
        if M_ != M:
            raise ValueError(f"the TPU kernel requires M={M}, got {M_}")
        if double_precision:
            raise ValueError("the TPU kernel is float32-only; use backend='dense'")
        data = np.asarray(data)
        self.L = data.shape[-1]
        self.seg_len = seg_len
        L_pad = _ceil_to(self.L, seg_len)
        self.data = jnp.asarray(
            np.pad(data, [(0, 0), (0, L_pad - self.L)], constant_values=-2),
            dtype=jnp.int8,
        )
        self.M = M

    @property
    def float_type(self):
        return jnp.float32

    def loglik_batched(self, pps: PSMCParams, inds) -> jnp.ndarray:
        """(B, S) log-likelihoods.

        pps leaves: pi (B, S, M); all others (B, S, M) chunk-invariant (or
        (B, M)).  inds: (S,) chunk indices into the data tensor.
        """
        pi = pps.pi
        B, S = pi.shape[:2]
        first = lambda a: a[:, 0] if a.ndim == 3 else a  # noqa: E731
        pp0 = PSMCParams(*[first(a).astype(jnp.float32) for a in pps])
        A = jax.vmap(dense_transition)(pp0)

        B_pad = _ceil_to(max(B, G_LANE), G_LANE)
        S_pad = ROWS
        assert S <= ROWS, f"minibatch size {S} exceeds kernel tile rows {ROWS}"

        def pad_particles(x, fill):
            pad = [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad, constant_values=fill)

        # identity-HMM padding: A=I, emis=1, pi=uniform -> ll contribution 0
        A_p = pad_particles(A, 0.0) + jnp.concatenate(
            [jnp.zeros((B, M, M)), jnp.broadcast_to(jnp.eye(M), (B_pad - B, M, M))]
        )
        e0_p = pad_particles(pp0.emis0, 1.0)
        e1_p = pad_particles(pp0.emis1, 1.0)
        pi_p = jnp.pad(
            pi.astype(jnp.float32),
            [(0, B_pad - B), (0, S_pad - S), (0, 0)],
            constant_values=1.0 / M,
        )
        rows = jnp.pad(self.data[inds], [(0, S_pad - S), (0, 0)], constant_values=-2)
        obs = pallas_hmm.pack_obs(rows, self.seg_len)
        ll = _packed_ll(A_p, e0_p, e1_p, pi_p, obs, self.seg_len)
        return ll[:B, :S]

    def loglik(self, pp, index):
        "Single-HMM convenience (oracle tests); pp unbatched, index scalar."
        if isinstance(pp, DemographicModel):
            pp = PSMCParams.from_dm(pp)
        pps = jax.tree.map(lambda a: a[None, None], pp)
        return self.loglik_batched(pps, jnp.asarray(index)[None])[0, 0]

    def __call__(self, pp, index, grad: bool):
        index = jnp.asarray(index)
        assert index.ndim in (0, 1)
        f = self.loglik
        if grad:
            f = jax.value_and_grad(f)
        if index.ndim == 1:
            f = jax.vmap(f, in_axes=(None, 0))
        return f(pp, index)
