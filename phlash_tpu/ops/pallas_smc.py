"""Structured SMC' Pallas kernel: VPU lane-parallel forward + adjoint.

The production TPU kernel.  Rationale: at M = 16 states a transition matmul
offers only 8 rows of work per 128x128 weight load and the weights differ
per particle, so an MXU path (ops/pallas_hmm.py, kept for comparison) is
latency-bound on weight streaming and fights bf16 input casting.  The SMC'
transition has O(M) structure

    (x @ A)[j] = b[j] * S(x)[j] + d[j] * x[j] + vv[j] * P(u * x)[j]

with S = strict suffix sum and P = strict prefix sum over states — which
maps onto the VPU exactly in float32: the M states live on the sublane
axis (any power-of-two multiple of 8 — SUPPORTED_M; 16 is the tuned
production value), each of the 128 lanes is an independent HMM
(particle x chunk), and the scans are log2(M) rounds of masked sublane
rolls.  The adjoint emits
gradients directly for the compressed natural parameters (b, d, u, v,
emis0, emis1, pi); no dense transition matrix is ever materialized (the
CUDA reference propagates 7*M^2 forward-mode derivatives instead,
/root/reference/src/phlash/gpu.py:575-692).

Performance notes (measured on v5e):
* Tiles are processed in blocks of TILE_BLOCK via a grid dimension — keeping
  all tiles resident made the parameter arrays' live ranges exceed the
  vector register file and every op spilled to VMEM.
* Rescaling is periodic (every NORM_EVERY = 8 sites), not per-site: the
  per-HMM normalizer needs a masked-roll reduction plus log + divide, and
  8 unnormalized steps cannot underflow float32 (per-site scale >= ~1e-4 in
  the worst case => >= 1e-32 per period).
* Observations are 2-bit-packed, one int32 per site for up to 16 chunks,
  streamed through SMEM (vector memory requires 128-lane-aligned slices;
  scalar memory indexes freely).

Layout:
    lanes   instance i = s * B_row + p (chunk-major) packed into 128-lane
            tiles; B_row = B ("dense", per-lane chunk shifts) or B padded
            to a lane multiple ("aligned", chunk-uniform tiles with cheap
            per-tile shifts) — see kernel_smc._layout for the choice rule
    arrays  (n_t, M, 128) f32: [tile, state, instance-lane]
    obs     (n_seg, ROWS, seg_len // ROWS) int32 packed codes

Forward: grid (tile blocks, segments); emits the filtered state at every
NORM_EVERY-site period boundary (a cheap HBM stream — NORM_EVERY x less
data than per-site history).
Backward: grid (tile blocks, segments reversed); for each period
(reversed) it rebuilds just that period's NORM_EVERY sites from the
streamed boundary state into a tiny VMEM scratch, then sweeps them
backward accumulating parameter cotangents in resident output blocks.
Storing only a period, not the whole segment, keeps VMEM pressure low
enough to run the same tile block as the forward pass (an earlier design
held a (seg_len, tb, M, 128) per-site history in VMEM, which halved the
backward tile block and required a full-segment rebuild per grid step).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Experimental cross-site pipelining schedule (docs/DESIGN.md "Roofline",
# recurrence-latency levers): hoists each period's observation decodes /
# emission factors out of the serial per-site chain and interleaves the
# suffix/prefix scan rounds so the issue pipeline always has two independent
# dependence chains in flight.  Numerically identical to the default
# schedule (same op set and per-chain order).  Enable per process:
# PHLASH_TPU_PIPELINE_V2=1 (read at trace time; A/B in separate processes).
PIPELINE_V2 = os.environ.get("PHLASH_TPU_PIPELINE_V2", "") == "1"

M = 16  # default/tuned HMM state count (the kernels themselves read the
# state count off the packed arrays' middle axis and support any
# power-of-two multiple of 8 — see SUPPORTED_M)
SUPPORTED_M = (8, 16, 32, 64)  # power-of-two sublane blocks the scans tile
TINY_NORM = 1e-30  # normalizer clamp: keeps extreme particles finite (their
# density is then ~-inf and the model-level guard zeroes their gradient)
LANES = 128  # HMMs per tile
ROWS = 8  # obs packing rows (see pack_obs)
DEFAULT_SEG = 256  # sites per grid step / checkpoint spacing
FWD_TILE_BLOCK = 4  # forward tiles per grid step (measured optimum)
BWD_TILE_BLOCK = 4  # per-period rebuild keeps VMEM small enough to match
NORM_EVERY = 8  # sites between rescalings (must divide seg_len)
MAX_CHUNKS = 16  # 2-bit codes per int32


def pack_obs(obs: jnp.ndarray, seg_len: int) -> jnp.ndarray:
    """(S<=16, L) observations -> (n_seg, ROWS, seg_len // ROWS) int32 codes.

    Values {0, 1, -1 missing, -2 padding} -> 2-bit codes {0, 1, 2, 3}; chunk
    s occupies bits [2s, 2s+2).  The trailing axes only satisfy SMEM block
    rules; site t of a segment lives at [t // W, t % W], W = seg_len // ROWS.
    """
    assert obs.shape[0] <= MAX_CHUNKS
    enc = jnp.where(obs == 0, 0, jnp.where(obs == 1, 1, jnp.where(obs == -1, 2, 3)))
    shifts = 2 * jnp.arange(obs.shape[0], dtype=jnp.int32)[:, None]
    # keep int32 end-to-end: under x64 the sum would promote to int64, which
    # Mosaic cannot lower (and recurses trying)
    code = (enc.astype(jnp.int32) << shifts).sum(0, dtype=jnp.int32)
    return code.astype(jnp.int32).reshape(-1, ROWS, seg_len // ROWS)


def _iota(tb: int, m: int = M) -> jnp.ndarray:
    return lax.broadcasted_iota(jnp.int32, (tb, m, LANES), 1)


def _scan_shifts(m: int):
    "Powers of two below m: the log2(m) rounds of a sublane scan."
    s, out = 1, []
    while s < m:
        out.append(s)
        s *= 2
    return tuple(out)


def _shift_up(x, s, iota):
    "y[j] = x[j + s] (0 beyond the end) along the state axis."
    # pltpu.roll requires non-negative shifts; m - s == -s on a length-m axis.
    # shift passed as int32 array: a python int traces as i64 under x64,
    # which Mosaic's dynamic_rotate cannot take.
    m = x.shape[1]
    return jnp.where(iota < m - s, pltpu.roll(x, jnp.int32(m - s), 1), 0.0)


def _shift_down(x, s, iota):
    "y[j] = x[j - s] (0 before the start) along the state axis."
    return jnp.where(iota >= s, pltpu.roll(x, jnp.int32(s), 1), 0.0)


def suffix_strict(x, iota):
    "S(x)[j] = sum_{k > j} x[k] along states."
    for s in _scan_shifts(x.shape[1]):
        x = x + _shift_up(x, s, iota)
    return _shift_up(x, 1, iota)


def prefix_strict(x, iota):
    "P(x)[j] = sum_{k < j} x[k] along states."
    for s in _scan_shifts(x.shape[1]):
        x = x + _shift_down(x, s, iota)
    return _shift_down(x, 1, iota)


def state_sum(x, iota):
    "Total over states, broadcast to every state row."
    shifts = _scan_shifts(x.shape[1])
    for s in shifts:
        x = x + _shift_up(x, s, iota)
    for s in shifts:
        x = jnp.where(iota >= s, pltpu.roll(x, jnp.int32(s), 1), x)
    return x


def _emis_factor(ob, e0, e1):
    "ob: decoded (tb, 1, 128) codes; 2 = missing -> 1, 3 = padding (frozen)."
    return jnp.where(ob == 0, e0, jnp.where(ob == 1, e1, 1.0))


def _dual_scan(xs, xp, iota):
    """suffix_strict(xs) and prefix_strict(xp) with their rounds interleaved.

    The two scans are independent dependence chains; alternating their
    roll+add rounds in program order offers the scheduler one chain to issue
    while the other's roll latency drains (PIPELINE_V2 experiment)."""
    for s in _scan_shifts(xs.shape[1]):
        xs = xs + _shift_up(xs, s, iota)
        xp = xp + _shift_down(xp, s, iota)
    return _shift_up(xs, 1, iota), _shift_down(xp, 1, iota)


def _transition(x, b, d, u, vv, iota):
    "v = x @ A via the structured form; also returns the scans for the VJP."
    if PIPELINE_V2:
        sv, pv = _dual_scan(x, u * x, iota)
    else:
        sv = suffix_strict(x, iota)
        pv = prefix_strict(u * x, iota)
    return b * sv + d * x + vv * pv, sv, pv


def _decode(code, chunk_shift):
    """Packed int32 code -> observation codes shaped like chunk_shift.

    chunk_shift: int32, 2x the chunk index of each lane's HMM instance.
    Two layouts (see kernel_smc._pack_instances): (tb, 1, 128) when lanes
    within a tile may belong to different chunks (dense packing), or
    (tb, 1, 1) when every lane of a tile shares one chunk (aligned packing)
    — the latter keeps the per-site shift/and/compare work at scalar-row
    width, which is worth ~8% of forward throughput at the production shape.
    """
    c = jnp.broadcast_to(code, chunk_shift.shape).astype(jnp.int32)
    return lax.shift_right_logical(c, chunk_shift) & 3


# Mosaic's scoped-VMEM stack limit is 16 MiB on v5e; a kernel whose scratch +
# double-buffered streamed blocks exceed it fails AT COMPILE TIME ("Scoped
# allocation ... exceeded scoped vmem limit", observed at M=64 x tb=4 at the
# production shape: 17.44M > 16.00M in the backward).  Budget kept below the
# limit because the row estimate is approximate (it OVERcounts the observed
# backward case 19.9M-est vs 17.44M-actual, so 14 MiB est keeps real usage
# comfortably under 16).
_VMEM_TB_BUDGET = 14 * 2**20


def _pick_tb_vmem(n_t: int, want: int, m: int, scratch_rows: float,
                  stream_rows: float, io_rows: float) -> int:
    """Largest tile block that divides n_t AND fits the scoped-VMEM budget.

    Rows are counted in (tb, m, 128) block units: `scratch_rows` VMEM scratch
    allocations, `stream_rows` grid-streamed blocks (double-buffered by the
    pipeline, so pass 2x the block rows), `io_rows` parameter/output blocks
    (also double-buffered).  At M <= 32 every production shape stays at the
    measured-optimal tb=4; M=64 at the production shape picks tb=2.
    """
    for tb in (want, 4, 2, 1):
        if tb > want or n_t % tb:
            continue
        est = tb * m * LANES * 4 * (scratch_rows + stream_rows + io_rows)
        if tb == 1 or est <= _VMEM_TB_BUDGET:
            return tb
    return 1


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _make_fwd_kernel(tb: int, with_residuals: bool):
    def kernel(b_ref, d_ref, u_ref, vv_ref, e0_ref, e1_ref, pi_ref, shift_ref,
               obs_ref, ll_ref, alpha_ref, *rest):
        if with_residuals:
            pst_ref, alpha, pst_acc = rest
        else:
            (alpha,) = rest
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _init():
            alpha[...] = pi_ref[...]
            ll_ref[...] = jnp.zeros_like(ll_ref)

        iota = _iota(tb, b_ref.shape[1])
        shift = shift_ref[...]
        W = obs_ref.shape[2]
        W32 = jnp.int32(W)
        n_per = (obs_ref.shape[1] * W) // NORM_EVERY

        def period(p, carry):
            a, ll = carry
            if with_residuals:
                # period-start state: the adjoint's residual.  Staged in
                # scratch and copied to the output block once (dynamic
                # single-row writes to a grid-streamed output ref deadlock
                # interpret mode's buffer machinery under shard_map).
                pst_acc[p] = a
            t0 = p * jnp.int32(NORM_EVERY)
            if PIPELINE_V2:
                # hoist the period's decodes + emission factors + live masks
                # out of the serial state chain: independent work the issue
                # pipeline can overlap with the recurrence
                obs_j = []
                for j in range(NORM_EVERY):
                    t = t0 + jnp.int32(j)
                    obs_j.append(
                        _decode(obs_ref[0, lax.div(t, W32), lax.rem(t, W32)], shift)
                    )
                fs = [_emis_factor(ob, e0_ref[...], e1_ref[...]) for ob in obs_j]
                lives = [ob < 3 for ob in obs_j]
                for j in range(NORM_EVERY):  # unrolled; no rescaling inside
                    v, _sv, _pv = _transition(
                        a, b_ref[...], d_ref[...], u_ref[...], vv_ref[...], iota
                    )
                    a = jnp.where(lives[j], v * fs[j], a)
            else:
                for j in range(NORM_EVERY):  # unrolled; no rescaling inside
                    t = t0 + jnp.int32(j)
                    ob = _decode(obs_ref[0, lax.div(t, W32), lax.rem(t, W32)], shift)
                    v, _sv, _pv = _transition(
                        a, b_ref[...], d_ref[...], u_ref[...], vv_ref[...], iota
                    )
                    w = v * _emis_factor(ob, e0_ref[...], e1_ref[...])
                    a = jnp.where(ob < 3, w, a)
            c = jnp.maximum(state_sum(a, iota), TINY_NORM)
            return a / c, ll + jnp.log(c)

        a, ll = lax.fori_loop(
            jnp.int32(0), jnp.int32(n_per), period, (alpha[...], ll_ref[...]), unroll=1
        )
        alpha[...] = a
        alpha_ref[...] = a
        ll_ref[...] = ll
        if with_residuals:
            pst_ref[0] = pst_acc[...]

    return kernel


import numpy as _np

_Z = _np.int32(0)  # index-map literal: python 0 would trace as i64 under x64
# (a numpy scalar: jax arrays may not be captured by index-map closures)


def _i32(x):
    return lax.convert_element_type(x, jnp.int32)


@functools.partial(jax.jit, static_argnames=("seg_len", "with_residuals"))
def forward_structured(params, pi, shifts, obs_packed, seg_len: int = DEFAULT_SEG,
                       with_residuals: bool = True):
    """params: tuple/list of 6 (n_t, M, 128) arrays b, d, u, vv, e0, e1;
    pi (n_t, M, 128); shifts int32 = 2x the chunk index, either per-lane
    (n_t, 1, 128) or per-tile (n_t, 1, 1) — see _decode; obs_packed
    (n_seg, ROWS, seg_len//ROWS).

    Returns (ll (n_t, M, 128) state-redundant, final filtered state
    alpha (n_t, M, 128), pstates (n_seg, n_per, n_t, M, 128) — the filtered
    state at every NORM_EVERY-site period boundary, the adjoint's residual).
    With with_residuals=False (the primal/no-grad path) pstates is not
    computed or written at all and None is returned in its place.
    """
    assert seg_len % NORM_EVERY == 0
    n_t, m = params[0].shape[0], params[0].shape[1]
    assert m in SUPPORTED_M, f"state count {m} not in {SUPPORTED_M}"
    n_seg = obs_packed.shape[0]
    n_per = seg_len // NORM_EVERY
    tb = _pick_tb_vmem(
        n_t, FWD_TILE_BLOCK, m,
        scratch_rows=1 + (n_per if with_residuals else 0),
        stream_rows=2 * n_per if with_residuals else 0,
        io_rows=20,
    )
    tile3 = lambda g, s: (_i32(g), _Z, _Z)  # noqa: E731
    p_spec = pl.BlockSpec((tb, m, LANES), tile3, memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tb, 1, shifts.shape[-1]), tile3, memory_space=pltpu.VMEM)
    out_specs = [p_spec, p_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n_t, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_t, m, LANES), jnp.float32),
    ]
    scratch = [pltpu.VMEM((tb, m, LANES), jnp.float32)]  # alpha carry
    if with_residuals:
        out_specs.append(
            pl.BlockSpec(
                (1, n_per, tb, m, LANES),
                lambda g, s: (_i32(s), _Z, _i32(g), _Z, _Z),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((n_seg, n_per, n_t, m, LANES), jnp.float32)
        )
        scratch.append(pltpu.VMEM((n_per, tb, m, LANES), jnp.float32))
    outs = pl.pallas_call(
        _make_fwd_kernel(tb, with_residuals),
        grid=(n_t // tb, n_seg),
        in_specs=[p_spec] * 7 + [s_spec] + [
            pl.BlockSpec(
                (1, ROWS, seg_len // ROWS),
                lambda g, s: (_i32(s), _Z, _Z),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*params, pi, shifts, obs_packed)
    if with_residuals:
        return outs[0], outs[1], outs[2]
    return outs[0], outs[1], None


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _make_bwd_kernel(tb: int):
    def kernel(b_ref, d_ref, u_ref, vv_ref, e0_ref, e1_ref, shift_ref,
               obs_ref, pst_ref, gbar_ref, abar0_ref,
               db_ref, dd_ref, du_ref, dvv_ref, de0_ref, de1_ref, dpi_ref,
               abar, ph_x, ph_sv, ph_pv, ph_v, pstk):
        s = pl.program_id(1)
        n_seg = pl.num_programs(1)

        @pl.when(s == 0)
        def _init():
            abar[...] = abar0_ref[...]
            for r in (db_ref, dd_ref, du_ref, dvv_ref, de0_ref, de1_ref, dpi_ref):
                r[...] = jnp.zeros_like(r)

        iota = _iota(tb, b_ref.shape[1])
        shift = shift_ref[...]
        W = obs_ref.shape[2]
        W32 = jnp.int32(W)
        seg_len = obs_ref.shape[1] * W
        n_per = seg_len // NORM_EVERY
        # one static copy; dynamic per-period reads then hit scratch (see
        # the forward kernel's note on interpret-mode buffer deadlocks)
        pstk[...] = pst_ref[0]

        def bwd_period(q, carry):
            ab, db, dd, du, dvv, de0, de1 = carry
            p = jnp.int32(n_per - 1) - q
            t0 = p * jnp.int32(NORM_EVERY)
            # ---- rebuild just this period's sites from its streamed
            # boundary state (tiny scratch: NORM_EVERY, not seg_len).  The
            # transition's scans (sv, pv) and its output v are stored so the
            # reverse sweep below never recomputes them: the sweep then
            # needs only its own two adjoint scans per site instead of four.
            a = pstk[p]
            if PIPELINE_V2:
                # decode the period's sites once, outside both sweeps
                obs_j = []
                for j in range(NORM_EVERY):
                    t = t0 + jnp.int32(j)
                    obs_j.append(
                        _decode(obs_ref[0, lax.div(t, W32), lax.rem(t, W32)], shift)
                    )
            for j in range(NORM_EVERY):
                ph_x[jnp.int32(j)] = a
                if PIPELINE_V2:
                    ob = obs_j[j]
                else:
                    t = t0 + jnp.int32(j)
                    ob = _decode(obs_ref[0, lax.div(t, W32), lax.rem(t, W32)], shift)
                v, sv, pv = _transition(
                    a, b_ref[...], d_ref[...], u_ref[...], vv_ref[...], iota
                )
                ph_sv[jnp.int32(j)] = sv
                ph_pv[jnp.int32(j)] = pv
                ph_v[jnp.int32(j)] = v
                w = v * _emis_factor(ob, e0_ref[...], e1_ref[...])
                a = jnp.where(ob < 3, w, a)
            c = jnp.maximum(state_sum(a, iota), TINY_NORM)
            # normalization adjoint at the period boundary: the normalized
            # state a/c is the next period's start (or the segment output)
            ybar = (ab - state_sum(ab * (a / c), iota) + gbar_ref[...]) / c
            # interior sites, reversed (unnormalized linear recursion)
            for j in reversed(range(NORM_EVERY)):
                if PIPELINE_V2:
                    ob = obs_j[j]
                else:
                    t = t0 + jnp.int32(j)
                    ob = _decode(obs_ref[0, lax.div(t, W32), lax.rem(t, W32)], shift)
                live = ob < 3
                x = ph_x[jnp.int32(j)]
                sv = ph_sv[jnp.int32(j)]
                pv = ph_pv[jnp.int32(j)]
                v = ph_v[jnp.int32(j)]
                f = _emis_factor(ob, e0_ref[...], e1_ref[...])
                yb = jnp.where(live, ybar, 0.0)
                dfull = v * yb
                de0 = de0 + jnp.where(ob == 0, dfull, 0.0)
                de1 = de1 + jnp.where(ob == 1, dfull, 0.0)
                vbar = f * yb
                db = db + sv * vbar
                dd = dd + x * vbar
                dvv = dvv + pv * vbar
                if PIPELINE_V2:  # the two adjoint scans are independent chains
                    t1, pb = _dual_scan(vv_ref[...] * vbar, b_ref[...] * vbar, iota)
                else:
                    t1 = suffix_strict(vv_ref[...] * vbar, iota)
                    pb = prefix_strict(b_ref[...] * vbar, iota)
                du = du + x * t1
                xbar = pb + d_ref[...] * vbar + u_ref[...] * t1
                ybar = jnp.where(live, xbar, ybar)
            return ybar, db, dd, du, dvv, de0, de1

        init = (abar[...], db_ref[...], dd_ref[...], du_ref[...], dvv_ref[...],
                de0_ref[...], de1_ref[...])
        out = lax.fori_loop(jnp.int32(0), jnp.int32(n_per), bwd_period, init, unroll=1)
        abar[...] = out[0]
        for r, val in zip((db_ref, dd_ref, du_ref, dvv_ref, de0_ref, de1_ref), out[1:]):
            r[...] = val

        @pl.when(s == n_seg - 1)
        def _final():
            dpi_ref[...] = abar[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("seg_len",))
def backward_structured(params, shifts, obs_packed, pstates, gbar, abar0, seg_len: int):
    """Adjoint pass.  Returns (dparams tuple of 6, dpi), packed layout.

    shifts: (n_t, 1, 128) int32 per-lane chunk shifts (as in the forward);
    pstates: (n_seg, n_per, n_t, M, 128) period-boundary states from the
    forward pass; gbar: (n_t, M, 128) cotangent of ll (state-redundant
    broadcast); abar0: (n_t, M, 128) cotangent of the final filtered state.
    """
    n_t, m = params[0].shape[0], params[0].shape[1]
    assert m in SUPPORTED_M, f"state count {m} not in {SUPPORTED_M}"
    n_seg = pstates.shape[0]
    n_per = seg_len // NORM_EVERY
    tb = _pick_tb_vmem(
        n_t, BWD_TILE_BLOCK, m,
        scratch_rows=1 + 4 * NORM_EVERY + n_per,
        stream_rows=2 * n_per,
        io_rows=30,
    )
    tile3 = lambda g, s: (_i32(g), _Z, _Z)  # noqa: E731
    rev = lambda s: _np.int32(n_seg - 1) - _i32(s)  # noqa: E731
    p_spec = pl.BlockSpec((tb, m, LANES), tile3, memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tb, 1, shifts.shape[-1]), tile3, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_bwd_kernel(tb),
        grid=(n_t // tb, n_seg),
        in_specs=[p_spec] * 6 + [s_spec] + [
            pl.BlockSpec(
                (1, ROWS, seg_len // ROWS),
                lambda g, s: (rev(s), _Z, _Z),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_per, tb, m, LANES),
                lambda g, s: (rev(s), _Z, _i32(g), _Z, _Z),
                memory_space=pltpu.VMEM,
            ),
            p_spec,
            p_spec,
        ],
        out_specs=[p_spec] * 7,
        out_shape=[jax.ShapeDtypeStruct((n_t, m, LANES), jnp.float32)] * 7,
        scratch_shapes=[
            pltpu.VMEM((tb, m, LANES), jnp.float32),  # abar
            pltpu.VMEM((NORM_EVERY, tb, m, LANES), jnp.float32),  # x per site
            pltpu.VMEM((NORM_EVERY, tb, m, LANES), jnp.float32),  # sv per site
            pltpu.VMEM((NORM_EVERY, tb, m, LANES), jnp.float32),  # pv per site
            pltpu.VMEM((NORM_EVERY, tb, m, LANES), jnp.float32),  # v per site
            pltpu.VMEM((n_per, tb, m, LANES), jnp.float32),  # boundary states
        ],
    )(*params, shifts, obs_packed, pstates, gbar, abar0)
    return tuple(outs[:6]), outs[6]
