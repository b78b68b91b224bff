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
from phlash_tpu.ops.pallas_smc import DEFAULT_SEG, LANES, M, MAX_CHUNKS
from phlash_tpu.params import PSMCParams
from phlash_tpu.size_history import DemographicModel


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# identity-HMM padding values per leaf: d=1 transition keeps state, unit
# emissions, uniform pi -> ll contribution exactly 0 for padded lanes
_PAD_VALUES = dict(b=0.0, d=1.0, u=0.0, v=0.0, emis0=1.0, emis1=1.0, pi=1.0 / M)


def _pack_param(x: jnp.ndarray, S: int, pb: int) -> jnp.ndarray:
    "(B_pad, M) -> (n_t, M, 128), replicated across the S chunk tiles."
    per_block = x.reshape(pb, LANES, M).transpose(0, 2, 1)  # (pb, M, 128)
    return jnp.broadcast_to(per_block[None], (S, pb, M, LANES)).reshape(-1, M, LANES)


def _pack_pi(pi: jnp.ndarray, pb: int) -> jnp.ndarray:
    "(B_pad, S, M) -> (n_t, M, 128) with tiles chunk-major."
    B_pad, S, _ = pi.shape
    x = pi.transpose(1, 0, 2).reshape(S, pb, LANES, M)
    return x.transpose(0, 1, 3, 2).reshape(-1, M, LANES)


def _unpack_ll(ll_row: jnp.ndarray, S: int, pb: int) -> jnp.ndarray:
    "(n_t, 128) -> (B_pad, S)."
    return ll_row.reshape(S, pb * LANES).T


def _unpack_state(alpha: jnp.ndarray, S: int, pb: int) -> jnp.ndarray:
    "(n_t, M, 128) -> (B_pad, S, M)."
    x = alpha.reshape(S, pb, M, LANES).transpose(0, 1, 3, 2)  # (S, pb, 128, M)
    return x.reshape(S, pb * LANES, M).transpose(1, 0, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _structured_fwd_op(params, pi, obs, pb, seg_len):
    """(ll (n_t, 128), final filtered state (n_t, M, 128)) from packed params.

    Differentiable in params and pi; the VJP runs the adjoint Pallas kernel
    with the state cotangent seeding the adjoint, so both the likelihood and
    the warmup-filtering use cases share one kernel pair.
    """
    ll, alpha, _ = pallas_smc.forward_structured(
        params, pi, obs, pb, seg_len, with_residuals=False
    )
    return ll[:, 0, :], alpha


def _structured_fwd_op_fwd(params, pi, obs, pb, seg_len):
    ll, alpha, pstates = pallas_smc.forward_structured(params, pi, obs, pb, seg_len)
    return (ll[:, 0, :], alpha), (params, obs, pstates)


def _structured_fwd_op_bwd(pb, seg_len, res, cot):
    params, obs, pstates = res
    g, abar0 = cot
    gbar = jnp.broadcast_to(g[:, None, :], (g.shape[0], M, g.shape[1]))
    dparams, dpi = pallas_smc.backward_structured(
        params, obs, pstates, gbar, abar0, pb, seg_len
    )
    return dparams, dpi, None


_structured_fwd_op.defvjp(_structured_fwd_op_fwd, _structured_fwd_op_bwd)


class SMCKernel:
    """Structured VPU likelihood kernel over a device-resident chunk tensor.

    With `mesh=` the kernel is multi-chip: the chunk tensor is sharded over
    the mesh's chunk axis ("d", HBM capacity scaling), the minibatch gather
    produces a small replicated (S, L) tile, and the Pallas forward/adjoint
    run under `shard_map` with the particle axis split over *all* mesh
    devices — the TPU-native counterpart of the reference's per-GPU host
    threads + replicated data (/root/reference/src/phlash/gpu.py:397-429),
    except the heavy axis (particles, not chunk indices) is the one
    distributed and no host synchronization exists at all.
    """

    def __init__(self, M_: int = None, data=None, double_precision: bool = False,
                 seg_len: int = DEFAULT_SEG, mesh=None, **kw):
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
        self.mesh = mesh
        if mesh is not None:
            from phlash_tpu.parallel.mesh import CHUNK_AXIS

            self.data = jax.device_put(
                self.data, NamedSharding(mesh, P(CHUNK_AXIS))
            )

    def _shard_particles(self, fn, pps: PSMCParams, *args):
        """Run `fn(pps, *args)` with pps' particle axis split over the mesh.

        `args` are replicated (small observation tiles).  The particle axis
        is padded with identity-HMM constants to a multiple of the device
        count; outputs (leading axis = particles) are unpadded afterwards.
        """
        if self.mesh is None:
            return fn(pps, *args)
        n_dev = self.mesh.devices.size
        axes = tuple(self.mesh.axis_names)
        B = pps.pi.shape[0]
        B_pad = _ceil_to(B, n_dev)
        padded = PSMCParams(
            *[
                jnp.pad(
                    leaf,
                    [(0, B_pad - B)] + [(0, 0)] * (leaf.ndim - 1),
                    constant_values=_PAD_VALUES[name],
                )
                for name, leaf in zip(PSMCParams._fields, pps)
            ]
        )
        pspec = jax.tree.map(lambda _: P(axes), padded)
        sharded = jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(pspec,) + (P(),) * len(args),
            out_specs=P(axes),
            # pallas_call out_shapes carry no varying-manual-axes metadata
            check_vma=False,
        )
        return sharded(padded, *args)[:B]

    @property
    def float_type(self):
        return jnp.float32

    def _pack_all(self, pps: PSMCParams, S: int):
        "Pad particles, pack parameters; returns (params6, pi, pb, B)."
        pi = pps.pi
        if pi.ndim == 2:  # chunk-invariant initial distribution
            pi = jnp.broadcast_to(pi[:, None, :], (pi.shape[0], S, M))
        B = pi.shape[0]
        first = lambda a: a[:, 0] if a.ndim == 3 else a  # noqa: E731
        pb = max(1, _ceil_to(B, LANES) // LANES)
        B_pad = pb * LANES

        params = []
        for name in ("b", "d", "u", "v", "emis0", "emis1"):
            leaf = first(getattr(pps, name)).astype(jnp.float32)
            leaf = jnp.pad(leaf, [(0, B_pad - B), (0, 0)], constant_values=_PAD_VALUES[name])
            params.append(_pack_param(leaf, S, pb))
        params = tuple(params)
        pi_p = jnp.pad(
            pi.astype(jnp.float32), [(0, B_pad - B), (0, 0), (0, 0)],
            constant_values=_PAD_VALUES["pi"],
        )
        return params, _pack_pi(pi_p, pb), pb, B

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

    def _loglik_local(self, pps: PSMCParams, rows: jnp.ndarray) -> jnp.ndarray:
        "(B, S) lls from (local) particles + replicated raw obs rows (S, L)."
        S = pps.pi.shape[1]
        if S > MAX_CHUNKS:  # split minibatches wider than the packing limit
            parts = []
            for lo in range(0, S, MAX_CHUNKS):
                hi = min(lo + MAX_CHUNKS, S)
                sub = jax.tree.map(lambda a: a[:, lo:hi] if a.ndim == 3 else a, pps)
                parts.append(self._loglik_local(sub, rows[lo:hi]))
            return jnp.concatenate(parts, axis=1)
        params, pi, pb, B = self._pack_all(pps, S)
        obs = pallas_smc.pack_obs(rows, self.seg_len)
        ll, _ = _structured_fwd_op(params, pi, obs, pb, self.seg_len)
        return _unpack_ll(ll, S, pb)[:B]

    def _filter_local(self, pps: PSMCParams, rows: jnp.ndarray) -> jnp.ndarray:
        "(B, S, M) filtered states from particles + replicated prefix rows."
        S = rows.shape[0]
        if S > MAX_CHUNKS:
            parts = []
            for lo in range(0, S, MAX_CHUNKS):
                hi = min(lo + MAX_CHUNKS, S)
                sub = jax.tree.map(lambda a: a[:, lo:hi] if a.ndim == 3 else a, pps)
                parts.append(self._filter_local(sub, rows[lo:hi]))
            return jnp.concatenate(parts, axis=1)
        params, pi, pb, B = self._pack_all(pps, S)
        obs = pallas_smc.pack_obs(rows, self.seg_len)
        _ll, alpha = _structured_fwd_op(params, pi, obs, pb, self.seg_len)
        return _unpack_state(alpha, S, pb)[:B]

    def loglik_batched(self, pps: PSMCParams, inds) -> jnp.ndarray:
        """(B, S) log-likelihoods; pps leaves (B, S, M) (non-pi leaves must be
        chunk-invariant), inds (S,) chunk indices.

        Minibatches wider than the 16-chunk packing limit are split into
        multiple kernel invocations transparently.  Under a mesh, the gather
        pulls S rows out of the 'd'-sharded chunk tensor into a replicated
        tile and the kernel runs particle-sharded.
        """
        rows = self._replicate(self.data[jnp.asarray(inds, dtype=jnp.int32)])
        return self._shard_particles(self._loglik_local, pps, rows)

    def filter_batched(self, pps: PSMCParams, warmup: jnp.ndarray) -> jnp.ndarray:
        """Filtered state after the warmup prefixes: (B, S, M), differentiable.

        warmup: (S, overlap) int8 observations (shared across particles).
        """
        rows = self._replicate(self._pad_rows(jnp.asarray(warmup, dtype=jnp.int8)))
        return self._shard_particles(self._filter_local, pps, rows)

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
