"""Structured-SMC' TPU kernel: packing wrapper, custom VJP, kernel class.

The production likelihood backend on TPU.  Wraps the VPU lane-parallel
Pallas kernels (ops/pallas_smc.py) behind the common kernel interface:

    loglik_batched(pps, inds) -> (B, S)   differentiable w.r.t. every
                                          PSMCParams leaf (incl. per-chunk pi)
    filter_batched(pps, warmup) -> (B, S, M)  final filtered state over the
                                          overlap prefixes (feeds the
                                          sequence-parallel pi correction)

Gradients for the compressed natural parameters come straight from the
adjoint kernel — no dense transition matrix is ever materialized, and the
whole thing composes with jit/vmap-free batched SVGD steps with zero host
callbacks (the reference needs pure_callback + CUDA,
/root/reference/src/phlash/gpu.py:441-472).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from phlash_tpu.ops import pallas_smc
from phlash_tpu.ops.pallas_smc import DEFAULT_SEG, LANES, MAX_CHUNKS, SUPPORTED_M
from phlash_tpu.params import PSMCParams
from phlash_tpu.size_history import DemographicModel


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# identity-HMM padding values per leaf: d=1 transition keeps state, unit
# emissions -> ll contribution exactly 0 for padded lanes (pi pads with
# the uniform 1/M, computed where the state count is known)
_PAD_VALUES = dict(b=0.0, d=1.0, u=0.0, v=0.0, emis0=1.0, emis1=1.0)
_PARAM_ORDER = ("b", "d", "u", "v", "emis0", "emis1")


def _pack_rows(x: jnp.ndarray, n_t: int, fill: float) -> jnp.ndarray:
    "(N_inst, M) instance-major -> (n_t, M, 128), tail lanes filled."
    m = x.shape[1]
    pad = n_t * LANES - x.shape[0]
    x = jnp.pad(x, [(0, pad), (0, 0)], constant_values=fill)
    return x.reshape(n_t, LANES, m).transpose(0, 2, 1)


def _unpack_ll(ll_row: jnp.ndarray, S: int, B: int, B_row: int) -> jnp.ndarray:
    """(n_t, 128) -> (B, S); instance i = s * B_row + p.

    B_row is the per-chunk instance stride: B for the dense layout,
    ceil(B, 128) for the aligned layout (whose per-chunk padding lanes are
    dropped here)."""
    return ll_row.reshape(-1)[: S * B_row].reshape(S, B_row)[:, :B].T


def _unpack_state(alpha: jnp.ndarray, S: int, B: int, B_row: int) -> jnp.ndarray:
    "(n_t, M, 128) -> (B, S, M); B_row as in _unpack_ll."
    m = alpha.shape[1]
    x = alpha.transpose(0, 2, 1).reshape(-1, m)[: S * B_row]
    return x.reshape(S, B_row, m)[:, :B].transpose(1, 0, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _structured_fwd_op(params, pi, shifts, obs, seg_len):
    """(ll (n_t, 128), final filtered state (n_t, M, 128)) from packed params.

    Differentiable in params and pi; the VJP runs the adjoint Pallas kernel
    with the state cotangent seeding the adjoint, so both the likelihood and
    the warmup-filtering use cases share one kernel pair.
    """
    ll, alpha, _ = pallas_smc.forward_structured(
        params, pi, shifts, obs, seg_len, with_residuals=False
    )
    return ll[:, 0, :], alpha


def _structured_fwd_op_fwd(params, pi, shifts, obs, seg_len):
    ll, alpha, pstates = pallas_smc.forward_structured(params, pi, shifts, obs, seg_len)
    return (ll[:, 0, :], alpha), (params, shifts, obs, pstates)


def _structured_fwd_op_bwd(seg_len, res, cot):
    params, shifts, obs, pstates = res
    g, abar0 = cot
    m = params[0].shape[1]
    gbar = jnp.broadcast_to(g[:, None, :], (g.shape[0], m, g.shape[1]))
    dparams, dpi = pallas_smc.backward_structured(
        params, shifts, obs, pstates, gbar, abar0, seg_len
    )
    return dparams, dpi, None, None


_structured_fwd_op.defvjp(_structured_fwd_op_fwd, _structured_fwd_op_bwd)


class SMCKernel:
    """Structured VPU likelihood kernel over a device-resident chunk tensor.

    With `mesh=` the kernel is multi-chip: the chunk tensor is sharded over
    the mesh's chunk axis ("d", HBM capacity scaling), the minibatch gather
    produces a small replicated (S, L) tile, and the Pallas forward/adjoint
    run under `shard_map` over the *packed lane-tile axis*: all (particle x
    chunk) instances are packed densely into 128-lane tiles (ops/packing)
    and the tile axis — padded to a multiple of the device count — is what
    splits across every mesh device, so lane occupancy stays ~full even
    when B/n_devices < 128.  This is the TPU-native counterpart of the
    reference's per-GPU host threads + replicated data
    (/root/reference/src/phlash/gpu.py:397-429), except the heavy work axis
    is the one distributed and no host synchronization exists at all.
    """

    def __init__(self, M_: int = None, data=None, double_precision: bool = False,
                 seg_len: int = DEFAULT_SEG, mesh=None, **kw):
        M_ = M_ or kw.pop("M", 16)
        if M_ not in SUPPORTED_M:
            raise ValueError(
                f"the TPU kernel supports M in {SUPPORTED_M} (power-of-two "
                f"sublane blocks), got {M_}; use backend='dense' for other M"
            )
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
        self.M = M_
        self.mesh = mesh
        if mesh is not None:
            from phlash_tpu.parallel.mesh import CHUNK_AXIS

            self.data = jax.device_put(
                self.data, NamedSharding(mesh, P(CHUNK_AXIS))
            )

    @property
    def float_type(self):
        return jnp.float32

    def _mesh_tiles(self, n_t: int) -> int:
        "Round a tile count up to the mesh's device count if present."
        if self.mesh is not None:
            n_t = _ceil_to(n_t, self.mesh.devices.size)
        return max(1, n_t)

    def _layout(self, B: int, S: int):
        """Choose the instance layout: ("aligned"|"dense", n_tiles, B_row).

        aligned: each chunk's particle block is padded to a lane multiple so
        every tile is chunk-uniform — the kernel's per-site observation
        decode then runs at scalar-row width ((tb,1,1) shifts), which is
        worth ~4% of fwd+grad throughput at the production shape.  Chosen
        whenever it needs no more tiles than dense packing (e.g. B=500, S=5:
        both need 20 tiles).

        dense: instances packed back-to-back (i = s*B + p) with per-lane
        (tb,1,128) chunk shifts — full lane occupancy for shapes where
        aligned padding would cost extra tiles (e.g. B < 128 with many
        chunks, or mesh-split tile counts)."""
        n_aligned = self._mesh_tiles(S * (_ceil_to(B, LANES) // LANES))
        n_dense = self._mesh_tiles(_ceil_to(B * S, LANES) // LANES)
        if n_aligned <= n_dense:
            return "aligned", n_aligned, _ceil_to(B, LANES)
        return "dense", n_dense, B

    def _pack_instances(self, pps: PSMCParams, S: int):
        """Pack the (B, S) HMM instances into 128-lane tiles.

        Instance i = s * B_row + p (chunk-major) with B_row the layout's
        per-chunk stride (see _layout).  All padding lanes are identity
        HMMs (d=1, unit emissions): their ll contribution is exactly 0.
        Per-lane (dense) or per-tile (aligned) chunk identities travel in a
        `shifts` array the kernel streams alongside the parameters.

        Returns (params6, pi, shifts, B, B_row).
        """
        m = self.M
        pi = pps.pi
        if pi.ndim == 2:  # chunk-invariant initial distribution
            pi = jnp.broadcast_to(pi[:, None, :], (pi.shape[0], S, m))
        B = pi.shape[0]
        first = lambda a: a[:, 0] if a.ndim == 3 else a  # noqa: E731
        layout, n_t, B_row = self._layout(B, S)

        def chunk_rows(leaf2d, fill):
            "(B, M) -> (S * B_row, M): per-chunk pad, then repeat per chunk."
            padded = jnp.pad(leaf2d, [(0, B_row - B), (0, 0)], constant_values=fill)
            return jnp.tile(padded, (S, 1))

        params = tuple(
            _pack_rows(
                chunk_rows(first(getattr(pps, name)).astype(jnp.float32), _PAD_VALUES[name]),
                n_t,
                _PAD_VALUES[name],
            )
            for name in _PARAM_ORDER
        )
        pi_fill = 1.0 / m  # uniform pi for the identity padding HMMs
        pi_rows = jnp.pad(
            pi.astype(jnp.float32).transpose(1, 0, 2),  # (S, B, M)
            [(0, 0), (0, B_row - B), (0, 0)],
            constant_values=pi_fill,
        ).reshape(S * B_row, m)
        pi_p = _pack_rows(pi_rows, n_t, pi_fill)

        # 2 x chunk index; static (numpy) so it folds at trace time.
        # Padding lanes/tiles get shift 0: they read chunk 0's code, but
        # identity emissions (e0 = e1 = 1) make any observation a no-op.
        if layout == "aligned":
            pb = B_row // LANES
            shifts = np.zeros(n_t, dtype=np.int32)
            used = S * pb
            shifts[:used] = 2 * (np.arange(used, dtype=np.int32) // pb)
            shifts = jnp.asarray(shifts.reshape(n_t, 1, 1))
        else:
            chunk_of = np.repeat(np.arange(S, dtype=np.int32), B)
            shifts = np.zeros(n_t * LANES, dtype=np.int32)
            shifts[: S * B] = 2 * chunk_of
            shifts = jnp.asarray(shifts.reshape(n_t, 1, LANES))
        return params, pi_p, shifts, B, B_row

    def _run_op(self, params, pi, shifts, obs):
        """_structured_fwd_op, shard-mapped over the tile axis if meshed.

        Tiles already divide the device count (see _n_tiles); every device
        gets full 128-lane tiles of (particle x chunk) instances, so lane
        occupancy does not degrade as devices are added (the r02 layout
        split the particle axis instead, leaving e.g. 63/128 lanes live at
        B=500 on 8 devices)."""
        if self.mesh is None:
            return _structured_fwd_op(params, pi, shifts, obs, self.seg_len)
        axes = tuple(self.mesh.axis_names)
        tile_sharded = P(axes)
        sharded = jax.shard_map(
            functools.partial(_structured_fwd_op, seg_len=self.seg_len),
            mesh=self.mesh,
            in_specs=(
                (tile_sharded,) * 6,
                tile_sharded,
                tile_sharded,
                P(),
            ),
            out_specs=(tile_sharded, tile_sharded),
            # pallas_call out_shapes carry no varying-manual-axes metadata
            check_vma=False,
        )
        return sharded(params, pi, shifts, obs)

    def _pad_rows(self, rows: jnp.ndarray) -> jnp.ndarray:
        "Pad raw int8 observation rows (S, L) to a seg_len multiple."
        L = rows.shape[-1]
        L_pad = _ceil_to(L, self.seg_len)
        return jnp.pad(rows, [(0, 0), (0, L_pad - L)], constant_values=-2)

    def _replicate(self, rows: jnp.ndarray) -> jnp.ndarray:
        "Constrain a small minibatch tile to be replicated across the mesh."
        if self.mesh is None:
            return rows
        return jax.lax.with_sharding_constraint(rows, NamedSharding(self.mesh, P()))

    def _loglik_impl(self, pps: PSMCParams, rows: jnp.ndarray) -> jnp.ndarray:
        "(B, S) lls from particles + replicated raw obs rows (S, L)."
        S = pps.pi.shape[1]
        if S > MAX_CHUNKS:  # split minibatches wider than the packing limit
            parts = []
            for lo in range(0, S, MAX_CHUNKS):
                hi = min(lo + MAX_CHUNKS, S)
                sub = jax.tree.map(lambda a: a[:, lo:hi] if a.ndim == 3 else a, pps)
                parts.append(self._loglik_impl(sub, rows[lo:hi]))
            return jnp.concatenate(parts, axis=1)
        params, pi, shifts, B, B_row = self._pack_instances(pps, S)
        obs = pallas_smc.pack_obs(rows, self.seg_len)
        ll, _ = self._run_op(params, pi, shifts, obs)
        return _unpack_ll(ll, S, B, B_row)

    def _filter_impl(self, pps: PSMCParams, rows: jnp.ndarray) -> jnp.ndarray:
        "(B, S, M) filtered states from particles + replicated prefix rows."
        S = rows.shape[0]
        if S > MAX_CHUNKS:
            parts = []
            for lo in range(0, S, MAX_CHUNKS):
                hi = min(lo + MAX_CHUNKS, S)
                sub = jax.tree.map(lambda a: a[:, lo:hi] if a.ndim == 3 else a, pps)
                parts.append(self._filter_impl(sub, rows[lo:hi]))
            return jnp.concatenate(parts, axis=1)
        params, pi, shifts, B, B_row = self._pack_instances(pps, S)
        obs = pallas_smc.pack_obs(rows, self.seg_len)
        _ll, alpha = self._run_op(params, pi, shifts, obs)
        return _unpack_state(alpha, S, B, B_row)

    def loglik_batched(self, pps: PSMCParams, inds) -> jnp.ndarray:
        """(B, S) log-likelihoods; pps leaves (B, S, M) (non-pi leaves must be
        chunk-invariant), inds (S,) chunk indices.

        Minibatches wider than the 16-chunk packing limit are split into
        multiple kernel invocations transparently.  Under a mesh, the gather
        pulls S rows out of the 'd'-sharded chunk tensor into a replicated
        tile and the packed (particle x chunk) lane tiles shard over all
        mesh devices.
        """
        rows = self._replicate(self.data[jnp.asarray(inds, dtype=jnp.int32)])
        return self._loglik_impl(pps, rows)

    def filter_batched(self, pps: PSMCParams, warmup: jnp.ndarray) -> jnp.ndarray:
        """Filtered state after the warmup prefixes: (B, S, M), differentiable.

        warmup: (S, overlap) int8 observations (shared across particles).
        """
        rows = self._replicate(self._pad_rows(jnp.asarray(warmup, dtype=jnp.int8)))
        return self._filter_impl(pps, rows)

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
