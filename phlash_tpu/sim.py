"""Simulation harness for validation and benchmarking.

Two tiers (capability parity with /root/reference/src/phlash/sim.py:28-308):

* `simulate_hmm` — a self-contained, jit-compiled simulator that draws
  observation sequences directly from the discretized SMC' HMM implied by a
  DemographicModel.  No external dependencies; runs as a lax.scan so even
  chromosome-scale sequences (10^7+ windows) simulate in seconds.  This is
  the primary source of validation data and exercises exactly the generative
  model the likelihood assumes.

* `stdpopsim_dataset` / `compute_truth` — published-catalog simulations via
  stdpopsim/msprime when those optional packages are installed (they are not
  required; an informative ImportError is raised otherwise).
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from phlash_tpu.data import RawContig
from phlash_tpu.params import PSMCParams
from phlash_tpu.size_history import DemographicModel, SizeHistory
from phlash_tpu.transition import transition_matrix

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("L",))
def _simulate_path(key: jax.Array, A: jax.Array, pi: jax.Array, emis1: jax.Array, L: int):
    "Sample (hidden states, observations) of length L from the discrete HMM."
    k_init, k_scan = jax.random.split(key)
    logA = jnp.log(A)
    s0 = jax.random.categorical(k_init, jnp.log(pi))

    def step(s, k):
        k1, k2 = jax.random.split(k)
        s_next = jax.random.categorical(k1, logA[s])
        ob = jax.random.bernoulli(k2, emis1[s_next]).astype(jnp.int8)
        return s_next, (s_next, ob)

    keys = jax.random.split(k_scan, L)
    _, (states, obs) = jax.lax.scan(step, s0, keys)
    return states, obs


def simulate_hmm(
    dm: DemographicModel,
    L: int,
    key: jax.Array | int = 0,
    window_size: int = 100,
    missing_frac: float = 0.0,
) -> RawContig:
    """Simulate one diploid binned het sequence of L windows from `dm`.

    Args:
        dm: demographic model in window-scaled units (theta/rho per window).
        L: number of windows to emit.
        key: jax PRNG key or integer seed.
        window_size: recorded on the contig (bp per window).
        missing_frac: fraction of windows masked to -1.

    Returns:
        RawContig with a (1, L) int8 het matrix and a trivial AFS.
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    pp = PSMCParams.from_dm(dm)
    # float32 assembly can leave ~1e-8-negative entries from cancellation;
    # log of those is NaN, which silently wrecks categorical sampling
    A = transition_matrix(dm).clip(1e-20, 1.0)
    A = A / A.sum(1, keepdims=True)
    key, k_miss = jax.random.split(key)
    _, obs = _simulate_path(key, A, pp.pi, pp.emis1, L)
    obs = np.asarray(obs)
    if missing_frac > 0:
        miss = np.asarray(jax.random.bernoulli(k_miss, missing_frac, (L,)))
        obs = np.where(miss, np.int8(-1), obs)
    return RawContig(het_matrix=obs[None], afs=np.ones(1), window_size=window_size)


def simulate_dataset(
    dm: DemographicModel,
    n_contigs: int = 2,
    L: int = 100_000,
    seed: int = 0,
    window_size: int = 100,
) -> tuple[list[RawContig], RawContig]:
    "Simulate (train contigs, test contig) from one demographic model."
    keys = jax.random.split(jax.random.PRNGKey(seed), n_contigs + 1)
    contigs = [simulate_hmm(dm, L, k, window_size) for k in keys[:-1]]
    test = simulate_hmm(dm, L, keys[-1], window_size)
    return contigs, test


# -- demography presets used in tests/benchmarks ----------------------------


def constant_demography(theta: float = 1e-2, rho: float = None, M: int = 16) -> DemographicModel:
    return DemographicModel.default(pattern=f"{M}*1", theta=theta, rho=rho)


def zigzag_demography(theta: float = 1e-2, M: int = 16) -> DemographicModel:
    "A zigzag-style size history exercising sharp rate changes."
    base = DemographicModel.default(pattern=f"{M}*1", theta=theta)
    t = base.eta.t
    c = jnp.exp(jnp.sin(jnp.linspace(0.0, 3.0 * jnp.pi, M)) * 1.5)
    return base._replace(eta=SizeHistory(t=t, c=c))


def bottleneck_demography(theta: float = 1e-2, M: int = 16) -> DemographicModel:
    base = DemographicModel.default(pattern=f"{M}*1", theta=theta)
    t = base.eta.t
    c = jnp.ones(M).at[M // 3 : M // 2].set(10.0)  # 10x higher coalescence = crash
    return base._replace(eta=SizeHistory(t=t, c=c))


# -- optional stdpopsim/msprime tier -----------------------------------------


def _find_stdpopsim_model(species_id: str, model_id: str):
    import stdpopsim

    species = stdpopsim.get_species(species_id)
    if model_id == "Constant":
        return species, stdpopsim.PiecewiseConstantSize(species.population_size)
    return species, species.get_demographic_model(model_id)


def stdpopsim_dataset(
    species_id: str,
    model_id: str,
    populations: dict[str, int],
    contigs: list[str] = None,
    seed: int = 1,
    options: dict = None,
) -> dict:
    """Simulate a published stdpopsim catalog model into Contigs.

    Capability parity with the reference harness
    (/root/reference/src/phlash/sim.py:28-102), msprime engine only (the
    reference also shells out to scrm for very large scaled recombination
    rates; msprime handles the catalog models used in the phlash paper).
    Requires the optional `stdpopsim` package.

    Args:
        species_id: e.g. "HomSap".
        model_id: catalog model id (e.g. "Zigzag_1S14") or "Constant".
        populations: {population name: number of diploid samples}.
        contigs: chromosome ids to simulate (default: diploid, recombining,
            numeric-id chromosomes).
        seed: RNG seed.
        options: length_multiplier, num_threads.

    Returns:
        {"data": {chrom: TreeSequenceContig}, "truth": DemographicModel}
        — the same contract as the reference, so notebooks written against
        it run unchanged.
    """
    import re as _re

    import stdpopsim

    from phlash_tpu.data import TreeSequenceContig

    options = options or {}
    species, model = _find_stdpopsim_model(species_id, model_id)
    engine = stdpopsim.get_engine("msprime")
    mu = species.genome.chromosomes[0].mutation_rate
    if contigs is None:
        keep = [
            c.id
            for c in species.genome.chromosomes
            if c.ploidy == 2 and c.recombination_rate > 0 and _re.match(r"\d+", c.id)
        ]
    else:
        keep = list(contigs)
    pop_dict = {pop.name: 0 for pop in model.populations}
    pop_dict.update(populations)
    samples = {p: n for p, n in pop_dict.items() if n > 0}
    data = {}
    for i, chrom in enumerate(keep):
        spec = species.get_contig(
            chrom,
            mutation_rate=mu,
            length_multiplier=options.get("length_multiplier", 1.0),
        )
        ts = engine.simulate(model, spec, samples, seed=seed + i)
        nodes = [tuple(ind.nodes) for ind in ts.individuals()]
        data[chrom] = TreeSequenceContig(ts, nodes=nodes)
    truth_eta = compute_truth_msprime(model.model, list(populations))
    truth = DemographicModel(eta=truth_eta, theta=mu, rho=None)
    return {"data": data, "truth": truth}


def compute_truth_msprime(
    demography, populations: list[str], t_min: float = 1e1, t_max: float = None
) -> SizeHistory:
    """Exact pairwise coalescence-rate trajectory from an msprime demography.

    (reference: sim.py:105-124 — the DemographyDebugger's coalescence-rate
    trajectory on a geometric time grid.)  Requires optional `msprime`.
    """
    dbg = demography.debug()
    if t_max is None:
        t_max = max(1e5, float(dbg.epoch_start_time.max()) + 1.0)
    t = np.geomspace(t_min, t_max, 1000)
    if len(populations) == 1:
        lineages = {populations[0]: 2}
    else:
        assert len(populations) == 2
        lineages = {p: 1 for p in populations}
    rates, _ = dbg.coalescence_rate_trajectory(t, lineages)
    return SizeHistory(t=jnp.asarray(t), c=jnp.asarray(rates))


def compute_truth(dm: DemographicModel, t_grid=None) -> SizeHistory:
    "Exact pairwise coalescence-rate trajectory of a model on a time grid."
    if t_grid is None:
        t_grid = np.geomspace(1e-4, 4 * float(dm.eta.t[-1]), 1000)
    return SizeHistory(t=jnp.asarray(t_grid), c=dm.eta(jnp.asarray(t_grid)))
