"""Fused TPU (Pallas/Mosaic) kernel for the batched PSMC forward algorithm.

This replaces the reference's CUDA forward+forward-mode-gradient kernel
(/root/reference/src/phlash/gpu.py:504-693) with a TPU-first design:

* **MXU block-diagonal packing.**  With M = 16 HMM states, a single
  transition matrix wastes the 128x128 systolic array.  We pack G_LANE = 8
  particles' transition matrices into one block-diagonal (128, 128) tile and
  lay HMM states out as lanes[p * 16 + m]; rows of a tile are the S
  minibatch chunks.  One `dot_general` then advances 8 particles x 8 chunks
  by one site, batched over all particle groups so the MXU pipeline stays
  full (the site loop is the only sequential dependence).

* **Per-site rescaling** identical to the reference: alpha is renormalized
  by its per-HMM sum (computed with a second matmul against a block-diagonal
  ones matrix — a lane-segment reduction the VPU cannot do natively), and
  log-norms accumulate into the log-likelihood.

* **Reverse-mode gradient** (see pallas_hmm_vjp.py) instead of the CUDA
  kernel's O(7 M^2 L) forward-mode derivative propagation: the forward saves
  an alpha checkpoint per segment; the backward re-runs each segment
  forward storing per-site alphas in VMEM, then propagates the adjoint with
  the transposed block-diagonal matrices, accumulating gradients w.r.t. the
  dense transition matrix, emissions and the initial distribution.  This is
  ~5x fewer FLOPs than forward-mode at M=16 even counting recomputation.

* **SMEM-packed observations.**  Each site's 8 chunk observations are
  2-bit-packed into one int32 (0 = hom, 1 = het, 2 = missing, 3 = padding)
  and streamed through SMEM, where dynamic per-site indexing is free (vector
  memory requires 128-lane-aligned slices).  The kernel decodes with a
  per-row shift-and-mask against a sublane iota.  Missing sites get emission
  factor 1 but still advance the HMM (reference semantics); padding sites
  are exact no-ops for state, likelihood and gradients.

Shapes (all padded by the wrapper in kernel_pallas.py):
    Ablk  (G, 128, 128) f32   block-diagonal transition tiles
    emis0 (G, 8, 128)   f32   P(ob=0|state), row-broadcast
    emis1 (G, 8, 128)   f32
    pi    (G, 8, 128)   f32   per-(particle, chunk) initial distributions
    obs   (n_seg, seg_len) i32   2-bit-packed observation codes
outputs
    ll    (G, 8, 128)   f32   log-likelihood, lane-redundant per 16-group
    ckpt  (n_seg, G, 8, 128)  alpha at each segment start (VJP residual)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 16  # HMM states; the kernel is tuned for (and asserts) M = 16
G_LANE = 128 // M  # particles per lane group
ROWS = 8  # chunk rows per tile (f32 sublane tile)
DEFAULT_SEG = 256  # sites per grid step (checkpoint spacing)


def _ones_block() -> jnp.ndarray:
    "(128, 128) block-diagonal ones: matmul by it = per-16-lane-group sum."
    i = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return ((i // M) == (j // M)).astype(jnp.float32)


def decode_obs(code):
    """Scalar packed code -> (1, ROWS, 1) int32 observation values.

    2 bits per chunk row: 0 = hom, 1 = het, 2 = missing, 3 = padding.
    """
    shifts = 2 * lax.broadcasted_iota(jnp.int32, (1, ROWS, 1), 1)
    code32 = jnp.broadcast_to(code, (1, ROWS, 1)).astype(jnp.int32)
    return lax.shift_right_logical(code32, shifts) & 3


def _advance(alpha, Ablk, e0, e1, ones_blk, ob):
    """One HMM site update for all groups (ob: decoded (1, ROWS, 1) codes).

    Returns (new alpha, v, c, live): v the pre-emission transition product,
    c the lane-redundant per-HMM normalizer.
    """
    # transition: (G, 8, 128) @ (G, 128, 128), batched over groups
    v = lax.dot_general(
        alpha,
        Ablk,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # emission factor by observation code (2 = missing -> 1.0)
    f = jnp.where(ob == 0, e0, jnp.where(ob == 1, e1, 1.0))
    u = v * f
    # per-HMM normalizer, broadcast back to every lane of the group
    c = lax.dot_general(
        u,
        ones_blk,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    live = ob < 3  # 3 = padding: freeze state entirely
    new_alpha = jnp.where(live, u / c, alpha)
    return new_alpha, v, c, live


def _fwd_kernel(Ablk_ref, e0_ref, e1_ref, pi_ref, obs_ref, ll_ref, ckpt_ref, alpha):
    seg = pl.program_id(0)

    @pl.when(seg == 0)
    def _init():
        alpha[...] = pi_ref[...]
        ll_ref[...] = jnp.zeros_like(ll_ref)

    ckpt_ref[0] = alpha[...]

    Ablk = Ablk_ref[...]
    e0 = e0_ref[...]
    e1 = e1_ref[...]
    ones_blk = _ones_block()
    W = obs_ref.shape[2]
    seg_len = obs_ref.shape[1] * W

    def site(t, carry):
        a, ll = carry
        ob = decode_obs(obs_ref[0, t // W, t % W])
        a, _v, c, live = _advance(a, Ablk, e0, e1, ones_blk, ob)
        ll = ll + jnp.where(live, jnp.log(c), 0.0)
        return a, ll

    a, ll = lax.fori_loop(
        0, seg_len, site, (alpha[...], ll_ref[...]), unroll=1
    )
    alpha[...] = a
    ll_ref[...] = ll


def pack_obs(obs: jnp.ndarray, seg_len: int) -> jnp.ndarray:
    """(ROWS, L) observations -> (n_seg, ROWS, seg_len // ROWS) int32 codes.

    Values {0, 1, -1 missing, -2 padding} map to 2-bit codes {0, 1, 2, 3};
    the 8 chunk rows of each site pack into one int32.  The trailing two
    axes exist only to satisfy SMEM block-shape rules: within a segment,
    site t lives at [t // W, t %% W] with W = seg_len // ROWS.
    """
    enc = jnp.where(obs == 0, 0, jnp.where(obs == 1, 1, jnp.where(obs == -1, 2, 3)))
    shifts = 2 * jnp.arange(ROWS, dtype=jnp.int32)[:, None]
    code = (enc.astype(jnp.int32) << shifts).sum(0)
    return code.reshape(-1, ROWS, seg_len // ROWS)


@functools.partial(jax.jit, static_argnames=("seg_len",))
def forward_packed(Ablk, emis0, emis1, pi, obs_packed, seg_len: int = DEFAULT_SEG):
    """Run the packed forward pass.  Returns (ll, ckpt).

    obs_packed: (n_seg, ROWS, seg_len // ROWS) int32 from pack_obs.
    """
    G = Ablk.shape[0]
    n_seg = obs_packed.shape[0]
    assert obs_packed.shape[1] * obs_packed.shape[2] == seg_len
    grid = (n_seg,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, 128, 128), lambda s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ROWS, 128), lambda s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ROWS, 128), lambda s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ROWS, 128), lambda s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ROWS, seg_len // ROWS), lambda s: (s, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((G, ROWS, 128), lambda s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, ROWS, 128), lambda s: (s, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_seg, G, ROWS, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((G, ROWS, 128), jnp.float32)],
    )(Ablk, emis0, emis1, pi, obs_packed)
