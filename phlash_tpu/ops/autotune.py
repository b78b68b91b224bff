"""One-shot seg_len autotune for the structured Pallas kernel.

The Pallas SMC' kernels stream observations in segments of ``seg_len``
sites per grid step; the best value trades VMEM residency against grid
overhead and depends on the chunk length and the packed tile count.  The
shipped default (ops/pallas_smc.DEFAULT_SEG) is tuned for the reference
workload (L=20k), but other chunk lengths can prefer a different segment.

``autotune_seg_len`` times the full fwd+grad path at the caller's real
(B, S, L) shape once per (device kind, shape) and persists the winner in a
small JSON cache, so the compile+measure cost (~1-2 min cold, seconds when
the XLA compile cache is warm) is paid once per machine.  Opt in with
``fit(..., kernel_seg_len="auto")``.
"""

from __future__ import annotations

import json
import logging
import os
import time

logger = logging.getLogger(__name__)

CANDIDATES = (128, 256, 512)


def _cache_path() -> str:
    return os.environ.get("PHLASH_TPU_AUTOTUNE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "phlash_tpu", "autotune.json"
    )


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _store_cache(cache: dict) -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(cache, fh, indent=0, sort_keys=True)
    except OSError:  # read-only home: tune every run, never crash
        logger.warning("could not persist autotune cache at %s", path)


def _time_grad(kern, pps, inds, reps: int = 2, inner: int = 5) -> float:
    """Best per-call wall time of grad(loglik_batched.sum) at this shape.

    Same amortized-sync scheme as tools/kernel_bench.py: dispatch `inner`
    async calls and fence once with a tiny scalar transfer, so the remote
    tunnel's round-trip latency divides out.
    """
    import jax
    import jax.numpy as jnp

    g = jax.jit(jax.grad(lambda p: kern.loglik_batched(p, inds).sum()))

    def sync(out):
        return float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:8]))

    sync(g(pps))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(inner):
            o = g(pps)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def autotune_seg_len(
    L: int,
    B: int,
    S: int,
    M: int = 16,
    double_precision: bool = False,
    mesh=None,
    candidates: tuple[int, ...] = CANDIDATES,
) -> int:
    """Pick the fastest Pallas seg_len for chunks of length L at (B, S).

    Returns the cached winner when this exact configuration — device kind
    and count, mesh shape, L, B, S, M, precision — was tuned before;
    otherwise builds a synthetic-data kernel per candidate at the caller's
    real configuration, times the fwd+grad path, persists and returns the
    fastest.  Falls back to the shipped default on ANY failure (setup or
    per-candidate), so a broken tune can never abort fit().
    """
    from phlash_tpu.ops.pallas_smc import DEFAULT_SEG

    try:
        return _autotune_seg_len(L, B, S, M, double_precision, mesh, candidates)
    except Exception as e:  # pragma: no cover - platform dependent
        logger.warning("seg_len autotune failed (%s); using default %d", e, DEFAULT_SEG)
        return DEFAULT_SEG


def _autotune_seg_len(L, B, S, M, double_precision, mesh, candidates) -> int:
    import jax

    from phlash_tpu.ops.pallas_smc import DEFAULT_SEG

    dev = jax.devices()[0]
    mesh_tag = "x".join(map(str, mesh.devices.shape)) if mesh is not None else "1"
    key = (
        f"{dev.device_kind}|n={len(jax.devices())}|mesh={mesh_tag}"
        f"|L={L}|B={B}|S={S}|M={M}|f64={int(bool(double_precision))}"
    )
    cache = _load_cache()
    if key in cache:
        logger.debug("autotune cache hit: %s -> seg_len=%d", key, cache[key])
        return int(cache[key])

    import jax.numpy as jnp
    import numpy as np

    from phlash_tpu.ops.kernel_smc import SMCKernel
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    rng = np.random.default_rng(0)
    data = rng.binomial(1, 0.05, size=(max(S, 1), L)).astype(np.int8)
    dm = DemographicModel.default(pattern=f"{M}*1", theta=1e-2, rho=1e-2)
    ftype = jnp.float64 if double_precision else jnp.float32
    pp = jax.tree.map(lambda a: a.astype(ftype), PSMCParams.from_dm(dm))
    pps = jax.tree.map(lambda a: jnp.broadcast_to(a, (B, S) + a.shape), pp)
    inds = jnp.arange(S)

    results: dict[int, float] = {}
    for seg in candidates:
        try:
            kern = SMCKernel(
                M_=M, data=data, double_precision=double_precision, mesh=mesh, seg_len=seg
            )
            results[seg] = _time_grad(kern, pps, inds)
            logger.info("autotune seg_len=%d: %.2f ms", seg, results[seg] * 1e3)
        except Exception as e:  # pragma: no cover - platform dependent
            logger.warning("autotune seg_len=%d failed (%s)", seg, e)
    if not results:
        return DEFAULT_SEG
    winner = min(results, key=results.get)
    cache[key] = winner
    _store_cache(cache)
    logger.info("autotuned seg_len=%d for %s", winner, key)
    return winner
