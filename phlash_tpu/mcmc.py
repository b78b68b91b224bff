"""SVGD posterior sampling driver: `fit(data, test_data, **options)`.

Capability parity with the reference driver
(/root/reference/src/phlash/mcmc.py:34-314) with a TPU-native execution
model: one jitted step performs minibatch-index sampling, the warmup-prefix
filtering, the (particles x chunks) likelihood + gradient, and the SVGD
update entirely on device — there is no host callback, no host-side
minibatch gather, and no per-step HtoD traffic.  Data is uploaded once; the
Python loop only advances the PRNG key, checks finiteness, and handles
early stopping / callbacks.

Options (same vocabulary as the reference): key, niter, window_size,
overlap, chunk_size, max_samples, num_workers, mutation_rate, truth,
elpd_cutoff, afs_transform, minibatch_size, init, theta, t1, tM,
rho_over_theta, alpha, beta, sigma, num_particles, learning_rate,
double_precision, callback, progress, kernel_backend, checkpoint_path.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from phlash_tpu.afs import default_afs_transform
from phlash_tpu.data import Contig, init_mcmc_data
from phlash_tpu.kernel import get_kernel
from phlash_tpu.model import log_density
from phlash_tpu.params import MCMCParams
from phlash_tpu.size_history import DemographicModel
from phlash_tpu.svgd import SVGD
from phlash_tpu.utils import Pattern, tree_unstack

logger = logging.getLogger(__name__)


def fit(data: list[Contig], test_data: Contig = None, **options) -> list[DemographicModel]:
    """Sample demographic models from the posterior.

    Args:
        data: list of Contig objects (training data).
        test_data: optional held-out Contig for ELPD-based early stopping.
        **options: see module docstring.

    Returns:
        A list of posterior DemographicModel samples (one per particle),
        rescaled to per-base-pair rates (and to generations when
        mutation_rate is given).
    """
    key = options.get("key", jax.random.PRNGKey(1))
    niter = options.get("niter", 1000)
    window_size = options.get("window_size", 100)
    # overlap: number of leading columns of each chunk used only to localize
    # the filtering distribution (sequence-parallelism correction)
    overlap = options.get("overlap", 500)
    chunk_size = options.get("chunk_size")
    max_samples = options.get("max_samples", 20)
    num_workers = options.get("num_workers")

    logger.info("loading data")
    afs, chunks = init_mcmc_data(
        data, window_size, overlap, chunk_size, max_samples, num_workers
    )
    del data

    mutation_rate = options.get("mutation_rate")
    if options.get("truth"):
        if mutation_rate:
            raise ValueError("mutation rate is already known from truth")
        mutation_rate = options["truth"].theta
    elpd_cutoff = options.get("elpd_cutoff", 100)

    if options.get("afs_transform") is not None:
        afs_transform = options["afs_transform"]
    else:
        afs_transform = default_afs_transform(afs) if afs is not None else None
    if afs_transform is not None:
        afs_transform = jnp.asarray(afs_transform, dtype=jnp.float32)
    if afs is not None:
        afs = jnp.asarray(afs)

    # minibatch size: aim to visit each chunk about once over the run
    S = options.get("minibatch_size") or max(1, min(5, int(len(chunks) / niter)))
    logger.debug("minibatch size: %d", S)

    # cap device-resident data at what the run can actually visit
    if len(chunks) > 5 * S * niter:
        key, sub = jax.random.split(key)
        rng = np.random.default_rng(np.asarray(jax.random.key_data(sub)))
        sel = rng.choice(len(chunks), size=5 * S * niter, replace=False)
        logger.debug("downsampling chunks %d -> %d", len(chunks), len(sel))
        chunks = chunks[sel]
    N = len(chunks)

    # Watterson-style estimate of the scaled mutation rate
    body = chunks[:, overlap:]
    observed = body[body > -1]
    if observed.size == 0 or observed.sum() == 0:
        raise ValueError(
            "the data contain no observed heterozygous sites (all columns "
            "missing or homozygous); cannot estimate theta — pass theta= "
            "explicitly if this is intended"
        )
    watterson = observed.mean() / window_size
    theta = options.get("theta", watterson)
    logger.info("scaled mutation rate theta=%.4g", theta)

    init = options.get("init")
    if init is None:
        if mutation_rate is not None:
            N0 = theta / mutation_rate
            options.setdefault("t1", 1e1 / 2 / N0)
            options.setdefault("tM", 1e6 / 2 / N0)
        t1 = options.get("t1", 1e-4)
        tM = options.get("tM", 15.0)
        rho = options.get("rho_over_theta", 1.0) * theta
        pattern = options.get("pattern", "14*1+1*2")
        init = MCMCParams.from_linear(
            pattern=pattern,
            rho=rho * window_size,
            t1=t1,
            tM=tM,
            c=jnp.ones(len(Pattern(pattern))),
            theta=theta * window_size,
            alpha=options.get("alpha", 0.0),
            beta=options.get("beta", 0.0),
        )
    assert isinstance(init, MCMCParams)

    # particle cloud: Gaussian around the init in flattened coordinates
    num_particles = options.get("num_particles", 500)
    x0, unravel = ravel_pytree(init)
    key, k_init = jax.random.split(key)
    cov = options.get("sigma", 1.0) * jnp.eye(len(x0))
    draws = jax.random.multivariate_normal(k_init, x0, cov, shape=(num_particles,))
    particles = jax.vmap(unravel)(draws)

    opt = optax.amsgrad(learning_rate=options.get("learning_rate", 0.1))
    svgd = SVGD(jax.grad(log_density), opt)
    state = svgd.init(particles)

    # device-resident data: warmup prefixes + likelihood chunks, uploaded once
    warmup_host, data_host = np.split(chunks, [overlap], axis=1)
    warmup_dev = jnp.asarray(np.ascontiguousarray(warmup_host), dtype=jnp.int8)
    train_kern = get_kernel(
        M=init.M,
        data=np.ascontiguousarray(data_host),
        double_precision=options.get("double_precision", False),
        backend=options.get("kernel_backend"),
    )

    # unbiased minibatch gradients: HMM term scaled by N / S
    weights = jnp.array([1.0, N / S, 1.0])

    def one_step(state, key):
        "Sample a minibatch and take one SVGD step — fully on device."
        inds = jax.random.choice(key, N, shape=(S,))
        return svgd.step(
            state,
            c=weights,
            inds=inds,
            warmup=warmup_dev[inds],
            kern=train_kern,
            afs=afs,
            afs_transform=afs_transform,
        )

    step = jax.jit(one_step)

    if test_data is not None:
        d = test_data.get_data(window_size)
        test_afs = jnp.asarray(d["afs"]) if d["afs"] is not None else None
        het = d["het_matrix"][:max_samples]
        N_test = het.shape[0]
        test_kern = get_kernel(
            M=init.M,
            data=np.ascontiguousarray(het),
            double_precision=False,
            backend=options.get("kernel_backend"),
        )
        test_T = None
        if test_afs is not None:
            test_T = (
                afs_transform
                if afs_transform is not None and afs_transform.shape[1] == len(test_afs)
                else None
            )

        @jax.jit
        def elpd(particles):
            def one(mcp):
                return log_density(
                    mcp,
                    c=jnp.array([0.0, 1.0, 1.0]),
                    inds=jnp.arange(N_test),
                    warmup=jnp.full([N_test, 1], -1, dtype=jnp.int8),
                    kern=test_kern,
                    afs=test_afs,
                    afs_transform=test_T,
                )

            return jax.vmap(one)(particles).mean()

    def dms():
        "Current particles as demographic models in per-bp units."
        ret = jax.vmap(MCMCParams.to_dm)(state.particles)
        ret = ret._replace(theta=ret.theta / window_size, rho=ret.rho / window_size)
        if mutation_rate:
            ret = jax.vmap(DemographicModel.rescale, (0, None))(ret, mutation_rate)
        return ret

    cb = options.get("callback")
    if cb is None:
        try:
            from phlash_tpu.liveplot import liveplot_cb

            cb = liveplot_cb(truth=options.get("truth"))
        except Exception:
            cb = lambda *_a, **_k: None  # noqa: E731

    progress = options.get("progress", True)
    try:
        import tqdm.auto as tqdm

        pbar = tqdm.trange(niter, disable=not progress, desc="fitting model")
    except ImportError:  # pragma: no cover
        pbar = range(niter)

    ema = best_elpd = None
    patience = 0
    for i in pbar:
        key, sub = jax.random.split(key)
        new_state = step(state, sub)
        flat, _ = ravel_pytree(new_state.particles)
        if not bool(jnp.isfinite(flat).all()):
            raise RuntimeError(f"non-finite particles at iteration {i}")
        state = new_state
        if test_data is not None and i % 10 == 0:
            e = float(elpd(state.particles))
            ema = e if ema is None else 0.9 * ema + 0.1 * e
            if best_elpd is None or ema > best_elpd[1]:
                patience = 0
                best_elpd = (i, ema, state)
            else:
                patience += 1
            if i - best_elpd[0] > elpd_cutoff:
                logger.info(
                    "ELPD has not improved in %d iterations; stopping early", elpd_cutoff
                )
                break
            if hasattr(pbar, "set_description"):
                pbar.set_description(f"elpd={ema:.2f} patience={patience}")
        cb(dms())
    logger.info("fit finished")
    return tree_unstack(dms())
