"""Reverse-mode Pallas kernel for the packed PSMC forward algorithm.

Given the per-segment alpha checkpoints saved by pallas_hmm.forward_packed,
each grid step re-runs one segment forward (storing per-site states in
VMEM), then sweeps it backward propagating the adjoint `abar` of the
filtered distribution and accumulating cotangents for the block-diagonal
transition tiles, the emission vectors, and the initial distribution.

Adjoint math for one site (per HMM, with per-site rescaling):
    u = (a_prev @ A) * f         f = emission factor for the observation
    c = sum(u);  a = u / c;  ll += log c
Given abar = dL/da and g = dL/dll:
    ubar   = (abar - <abar, a> + g) / c
    abar'  = (ubar * f) @ A^T
    dA    += a_prev^T (ubar * f)
    df     = v * ubar            routed to emis0/emis1 by the observation
    (for padding sites, everything passes through untouched)

The group-local inner products <abar, a> and sums ride the MXU via the
block-diagonal ones matrix, like the forward normalizer.

Grid: (group tiles, segments), segments innermost and iterated in reverse
via the BlockSpec index maps, so the gradient accumulators for one group
tile stay resident in VMEM across the whole genome sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phlash_tpu.ops.pallas_hmm import ROWS, _ones_block, decode_obs

GT = 4  # particle-group tile per grid step (VMEM-bounded by the site history)


def _bwd_kernel(
    Ablk_ref, e0_ref, e1_ref, obs_ref, ckpt_ref, gbar_ref,
    dA_ref, de0_ref, de1_ref, dpi_ref,
    abar, a_hist, v_hist,
):
    s = pl.program_id(1)  # 0 .. n_seg-1, but refs are mapped to segment n_seg-1-s
    n_seg = pl.num_programs(1)

    @pl.when(s == 0)
    def _init():
        abar[...] = jnp.zeros_like(abar)
        dA_ref[...] = jnp.zeros_like(dA_ref)
        de0_ref[...] = jnp.zeros_like(de0_ref)
        de1_ref[...] = jnp.zeros_like(de1_ref)
        dpi_ref[...] = jnp.zeros_like(dpi_ref)

    Ablk = Ablk_ref[...]
    e0 = e0_ref[...]
    e1 = e1_ref[...]
    gbar = gbar_ref[...]
    ones_blk = _ones_block()
    # obs block: (1, ROWS, seg_len // ROWS) packed codes in SMEM
    W = obs_ref.shape[2]
    seg_len = obs_ref.shape[1] * W

    def batched_mm(x, B, transpose=False):
        "(Gt, 8, 128) @ (Gt, 128, 128) (optionally with B^T), batched over groups."
        contract = 2 if transpose else 1
        return lax.dot_general(
            x, B,
            dimension_numbers=(((2,), (contract,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def group_sum(x):
        "(Gt, 8, 128) -> per-16-lane-group sums, lane-broadcast."
        return lax.dot_general(
            x, ones_blk,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def emis_factor(ob):
        return jnp.where(ob == 0, e0, jnp.where(ob == 1, e1, 1.0))

    # ---- forward rebuild of this segment, storing a_prev and v per site ----
    def fwd_site(t, a):
        a_hist[t] = a
        ob = decode_obs(obs_ref[0, t // W, t % W])  # (1, 8, 1) codes
        v = batched_mm(a, Ablk)
        v_hist[t] = v
        u = v * emis_factor(ob)
        c = group_sum(u)
        return jnp.where(ob < 3, u / c, a)

    lax.fori_loop(0, seg_len, fwd_site, ckpt_ref[0], unroll=1)

    # ---- reverse sweep ----
    def bwd_site(i, carry):
        ab, dA, de0, de1 = carry
        t = seg_len - 1 - i
        ob = decode_obs(obs_ref[0, t // W, t % W])
        live = ob < 3
        a_prev = a_hist[t]
        v = v_hist[t]
        f = emis_factor(ob)
        u = v * f
        c = group_sum(u)
        a = u / c
        ubar = (ab - group_sum(ab * a) + gbar) / c
        w = jnp.where(live, ubar * f, 0.0)
        ab_new = batched_mm(w, Ablk, transpose=True)
        ab = jnp.where(live, ab_new, ab)
        dA = dA + lax.dot_general(
            a_prev, w,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dfull = v * ubar
        de0 = de0 + jnp.where(live & (ob == 0), dfull, 0.0)
        de1 = de1 + jnp.where(live & (ob == 1), dfull, 0.0)
        return ab, dA, de0, de1

    ab, dA, de0, de1 = lax.fori_loop(
        0, seg_len, bwd_site,
        (abar[...], dA_ref[...], de0_ref[...], de1_ref[...]),
        unroll=1,
    )
    abar[...] = ab
    dA_ref[...] = dA
    de0_ref[...] = de0
    de1_ref[...] = de1

    @pl.when(s == n_seg - 1)
    def _final():
        dpi_ref[...] = abar[...]


@functools.partial(jax.jit, static_argnames=("seg_len",))
def backward_packed(Ablk, e0b, e1b, obs, ckpt, gbar, seg_len: int):
    """Adjoint pass.  Returns (dAblk, de0, de1, dpi) in packed layout.

    Shapes: Ablk (G, 128, 128); e0b/e1b/gbar (G, 8, 128);
    obs (n_seg, ROWS, seg_len // ROWS) int32 packed codes;
    ckpt (n_seg, G, 8, 128).
    """
    G = Ablk.shape[0]
    n_seg = ckpt.shape[0]
    assert obs.shape == (n_seg, ROWS, seg_len // ROWS)
    gt = GT if G % GT == 0 else 1
    grid = (G // gt, n_seg)
    rev = lambda g, s: n_seg - 1 - s  # noqa: E731
    tile3 = lambda g, s: (g, 0, 0)  # noqa: E731
    dAblk, de0, de1, dpi = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gt, 128, 128), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, ROWS, 128), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, ROWS, 128), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ROWS, seg_len // ROWS),
                lambda g, s: (rev(g, s), 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, gt, ROWS, 128), lambda g, s: (rev(g, s), g, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((gt, ROWS, 128), tile3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gt, 128, 128), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, ROWS, 128), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, ROWS, 128), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, ROWS, 128), tile3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, ROWS, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, ROWS, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((GT if G % GT == 0 else 1, ROWS, 128), jnp.float32),  # abar
            pltpu.VMEM((seg_len, GT if G % GT == 0 else 1, ROWS, 128), jnp.float32),
            pltpu.VMEM((seg_len, GT if G % GT == 0 else 1, ROWS, 128), jnp.float32),
        ],
    )(Ablk, e0b, e1b, obs, ckpt, gbar)
    return dAblk, de0, de1, dpi
