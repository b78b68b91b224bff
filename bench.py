"""Benchmark: HMM forward+gradient throughput at the reference workload.

Workload (from BASELINE.json / SURVEY.md §6): M=16 TMRCA states, B=500 SVGD
particles, minibatch of S=5 chunks, float32 — the shape of one SVGD
gradient step's dominant term.  Metric: Msites/sec/chip for the
value-and-gradient pass (sites = B * S * L observation columns); the
forward-only throughput is reported alongside in "extra".

Baseline: the reference's portable kernel semantics — the per-site
rematerialized O(M) `lax.scan` forward (reference src/phlash/hmm.py:68-82,
its fallback on any non-CUDA hardware) differentiated by JAX — measured on
the SAME chip.  (The reference publishes no numbers and its CUDA kernel
cannot run here; BASELINE.md directs that baselines be measured, not
copied.)

Timing note: the TPU here is reached through a remote tunnel whose
dispatch/sync latency (~10-20 ms) would swamp a per-call measurement, and
`block_until_ready` is not a reliable fence on it.  Production SVGD steps
chain back-to-back with no host sync, so the representative number is the
amortized per-call time: dispatch `inner` calls, sync once on a scalar
transfer, divide.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "Msites/sec", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _device_reachable(timeout_s: float = 240.0) -> bool:
    """Probe the backend with a tiny op in a subprocess.

    The tunneled TPU backend can wedge (first device op of EVERY process
    hangs, e.g. after repeated mid-compile kills); a subprocess probe
    with a timeout converts a would-be indefinite hang of this benchmark
    into a fast, explained failure line.
    """
    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))",
            ],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _measure(fn, arg, sites: int, reps: int = 3, inner: int = 10):
    """Amortized per-call throughput (see timing note in the module docstring).

    Returns (best Msites/sec, [per-rep Msites/sec]) — the per-rep list is
    reported so a degraded device/tunnel self-identifies as dispersion in
    the record instead of masquerading as a code regression (r3 verdict
    weak item 1)."""

    def sync(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:8]))

    sync(fn(arg))  # compile + warm
    per_rep = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn(arg)
        sync(out)
        per_rep.append(sites / ((time.perf_counter() - t0) / inner) / 1e6)
    return max(per_rep), per_rep


def main():
    # The tunnel's wedged mode is often transient/flapping (observed in r5:
    # recovered within minutes of a failed probe), so probe a few times with
    # waits before declaring the device unreachable — a single failed probe
    # must not null the round's number of record.
    for attempt in range(3):
        if _device_reachable():
            break
        if attempt < 2:
            time.sleep(180)
    else:
        print(
            json.dumps(
                {
                    "metric": "HMM fwd+grad throughput (M=16, B=500, S=5, f32)",
                    "value": None,
                    "unit": "Msites/sec",
                    "vs_baseline": None,
                    "extra": {
                        "error": "device backend unreachable: 3 probe "
                        "attempts over ~18 min, each a tiny device op with "
                        "a 240 s timeout (wedged TPU tunnel?); benchmark "
                        "skipped instead of hanging"
                    },
                }
            )
        )
        return

    from phlash_tpu.hmm import PureXLAKernel
    from phlash_tpu.kernel import get_kernel
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    B, S, L = 500, 5, 20_000
    L_base = 1_000  # the scan baseline is slow; measure it on fewer sites
    rng = np.random.default_rng(0)
    data = rng.binomial(1, 0.05, size=(max(8, S), L)).astype(np.int8)
    data[:, 1000:1100] = -1  # a missing stretch, so that path is in the timing
    dm = DemographicModel.default(pattern="16*1", theta=1e-2, rho=1e-2)
    pp = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm))
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.arange(S)

    # --- our kernel (auto-selected for the platform) ---
    kern = get_kernel(M=16, data=data)

    def loss(p):
        return kern.loglik_batched(p, inds).sum()

    # device-health indicator: per-rep dispersion of the primary metric.
    # A healthy chip repeats within a few %; a degraded tunnel/device shows
    # large spread.  When a window comes back noisy, wait and re-measure
    # (bounded retries) so the number of record reflects a healthy window
    # rather than whatever the tunnel gives that minute (r4 verdict weak
    # item 2); the best window wins and the retry count is recorded.
    # Two degraded-window signatures are retried (not just one): high per-rep
    # spread, and a *consistently* slow window — the tunnel's post-wedge mode
    # measured in r5 ran the same binary at 1/20th speed with low spread, so
    # a spread test alone would have recorded it as "ok".  1000 Msites/s is
    # ~0.55x the slowest healthy-window fwd+grad ever measured on this chip
    # (1801, r2 tree re-run) — far above the degraded mode (~90), far below
    # any healthy one.
    DEGRADED_FLOOR = 1000.0
    jit_loss, jit_grad = jax.jit(loss), jax.jit(jax.grad(loss))
    retries = 0
    ours_fwd, fwd_reps = _measure(jit_loss, pps, B * S * L)
    ours, grad_reps = _measure(jit_grad, pps, B * S * L)
    spread = (max(grad_reps) - min(grad_reps)) / max(grad_reps)
    while (spread >= 0.10 or ours < DEGRADED_FLOOR) and retries < 2:
        retries += 1
        time.sleep(60 * retries)
        f2, fr2 = _measure(jit_loss, pps, B * S * L)
        g2, gr2 = _measure(jit_grad, pps, B * S * L)
        s2 = (max(gr2) - min(gr2)) / max(gr2)
        # adopt the cleaner window wholesale: higher throughput wins unless
        # it comes with worse dispersion and the old window was healthy
        if g2 > ours and (s2 < 0.10 or s2 < spread):
            ours_fwd, fwd_reps, ours, grad_reps, spread = f2, fr2, g2, gr2, s2
        elif s2 < spread and g2 >= DEGRADED_FLOOR:
            ours_fwd, fwd_reps, ours, grad_reps, spread = f2, fr2, g2, gr2, s2
    health = "ok" if spread < 0.10 else "noisy"
    if ours < DEGRADED_FLOOR:
        health = "degraded"

    # --- reference-equivalent scan kernel, same chip ---
    base_kern = PureXLAKernel(M=16, data=data[:, :L_base])

    def base_loss(p):
        per = jax.vmap(base_kern.loglik, (0, 0))
        return jax.vmap(per, (0, None))(p, inds).sum()

    base, _ = _measure(jax.jit(jax.grad(base_loss)), pps, B * S * L_base, inner=3)

    # roofline accounting (docs/DESIGN.md "Roofline"): counted block-ops per
    # site per 128-instance tile, x2 native (8,128) instrs per (16,128) op,
    # against the v5e VPU 4-port issue ceiling.  The clock is derived from
    # the chip's published 197 bf16 TFLOP/s and its 4 128x128 MXUs:
    # 197.4e12 / (4*128*128*2) = 1.51 GHz, so 4 ports x 1.51 GHz = 6.02e9
    # native instr/s.  (r3 used 940 MHz — a v4-era figure — which put the
    # measured kernel at >100% of "peak"; see DESIGN.md for the full
    # reconciliation incl. the tools/vpu_peak.py measured lower bound.)
    OPS_FWD, OPS_BWD, ISSUE_PEAK = 41.375, 94.0, 6.02e9
    instr_fwd = ours_fwd * 1e6 / 128 * OPS_FWD * 2
    instr_grad = ours * 1e6 / 128 * (OPS_FWD + OPS_BWD) * 2

    # --- M=32 structured kernel (r3 verdict item 7: a documented number for
    # M != 16, where the reference's CUDA kernel compiles any M with a perf
    # warning).  Additive: failures land in extras, not the primary metric.
    m32_extra = {}
    for m_alt in (32, 64):  # r4 directive 6 adds the M=64 number
        try:
            dm_a = DemographicModel.default(pattern=f"{m_alt}*1", theta=1e-2, rho=1e-2)
            pp_a = jax.tree.map(lambda a: a.astype(jnp.float32), PSMCParams.from_dm(dm_a))
            pps_a = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp_a)
            kern_a = get_kernel(M=m_alt, data=data)

            def loss_a(p, kern_a=kern_a):
                return kern_a.loglik_batched(p, inds).sum()

            ma_grad, _ = _measure(jax.jit(jax.grad(loss_a)), pps_a, B * S * L, reps=2)
            ma_fwd, _ = _measure(jax.jit(loss_a), pps_a, B * S * L, reps=2)
            m32_extra.update({
                f"m{m_alt}_fwd_grad_Msites_per_sec": round(ma_grad, 1),
                f"m{m_alt}_fwd_only_Msites_per_sec": round(ma_fwd, 1),
                f"m{m_alt}_backend": type(kern_a).__name__,
            })
        except Exception as e:  # pragma: no cover - additive diagnostics only
            m32_extra[f"m{m_alt}_error"] = str(e)[:200]

    # --- full SVGD step rate (the BASELINE.md north-star "SVGD iters/sec"):
    # the production-shaped training program (500 particles, S=5, 2.5 kb
    # chunks, default steps_per_call) timed end to end.  Additive: any
    # failure is recorded in extras without touching the primary metric.
    step_extra = {}
    try:
        from phlash_tpu.training import build_training

        rng2 = np.random.default_rng(1)
        chunks = rng2.binomial(1, 0.05, size=(2000, 2500)).astype(np.int8)
        afs_arr = rng2.integers(100, 1000, size=9).astype(np.int64)
        prog = build_training(
            chunks,
            afs_arr,
            window_size=100,
            overlap=500,
            key=jax.random.PRNGKey(0),
            options=dict(num_particles=500, minibatch_size=5, niter=1000),
        )
        step = jax.jit(prog.step)
        key = jax.random.PRNGKey(1)
        s = step(prog.state, key)
        float(jax.tree.leaves(s.particles)[0].ravel()[0])  # compile + fence
        spc = prog.steps_per_call
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = prog.state
            for _ in range(3):
                s = step(s, key)
            float(jax.tree.leaves(s.particles)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / (3 * spc))
        step_extra = {
            "svgd_step_ms_per_iter": round(best * 1e3, 2),
            "svgd_iters_per_sec": round(1.0 / best, 1),
            "svgd_steps_per_call": spc,
        }
    except Exception as e:  # pragma: no cover - additive diagnostics only
        step_extra = {"svgd_step_error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "HMM fwd+grad throughput (M=16, B=500, S=5, f32)",
                "value": round(ours, 1),
                "unit": "Msites/sec",
                "vs_baseline": round(ours / base, 2),
                "extra": {
                    "fwd_only_Msites_per_sec": round(ours_fwd, 1),
                    "baseline_fwd_grad_Msites_per_sec": round(base, 1),
                    # the scan baseline is too slow to time at the full
                    # production length; each kernel's L is recorded so the
                    # ratio's asymmetry is self-describing
                    "ours_L": L,
                    "baseline_L": L_base,
                    "fwd_grad_per_rep_Msites_per_sec": [round(x, 1) for x in grad_reps],
                    "fwd_per_rep_Msites_per_sec": [round(x, 1) for x in fwd_reps],
                    "rep_spread": round(spread, 3),
                    "device_health": health,
                    "noisy_window_retries": retries,
                    "vpu_issue_peak_fraction_fwd": round(instr_fwd / ISSUE_PEAK, 2),
                    "vpu_issue_peak_fraction_fwd_grad": round(instr_grad / ISSUE_PEAK, 2),
                    **m32_extra,
                    **step_extra,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
