"""Simulation harness for validation and benchmarking.

Three tiers (capability parity with /root/reference/src/phlash/sim.py:28-308):

* `simulate_hmm` — a self-contained, jit-compiled simulator that draws
  observation sequences directly from the discretized SMC' HMM implied by a
  DemographicModel.  No external dependencies; runs as a lax.scan so even
  chromosome-scale sequences (10^7+ windows) simulate in seconds.  This is
  the primary source of validation data and exercises exactly the generative
  model the likelihood assumes.

* `stdpopsim_dataset` / `compute_truth` — published-catalog simulations via
  stdpopsim/msprime when those optional packages are installed (they are not
  required; an informative ImportError is raised otherwise).

* `simulate_scrm` — coalescent simulation through an external `scrm`
  executable for chromosomes whose scaled recombination rate 4*N0*r*L
  exceeds what msprime handles comfortably (the reference switches engines
  at 1e5, sim.py:165-173).  The transposed-segsites stream is parsed
  straight into a binned RawContig — no intermediate synthetic VCF.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Iterable

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


# -- exact continuous-time SMC' simulator ------------------------------------


def _inv_hazard(
    t_grid: np.ndarray,
    c: np.ndarray,
    t0: float,
    E: float,
    mult: float = 1.0,
    cap: float = np.inf,
) -> float:
    """Solve int_{t0}^{h} mult*c(s) ds = E for h, c piecewise constant.

    t_grid: (K,) epoch starts (t_grid[0] == 0), last epoch open.  Exact
    inversion of the piecewise-linear cumulative hazard; used for every
    waiting-time draw in the continuous simulator.  If the solution would
    exceed `cap`, returns `cap` with the remaining hazard unspent (the
    caller reads h >= cap as "escaped past the cap" — the below-TMRCA
    re-coalescence draw).
    """
    k = int(np.searchsorted(t_grid, t0, side="right") - 1)
    h = t0
    while h < cap:
        end = min(t_grid[k + 1] if k + 1 < len(t_grid) else np.inf, cap)
        rate = mult * c[k]
        step = (end - h) * rate
        if E <= step or not np.isfinite(end):
            return min(h + E / rate, cap)
        E -= step
        h = end
        if h < cap:
            k += 1
    return cap


def simulate_smc_continuous(
    dm: DemographicModel,
    L: int,
    seed: int = 0,
    window_size: int = 100,
    n_samples: int = 1,
) -> RawContig:
    """Simulate a diploid het sequence from the *continuous* SMC' process.

    Unlike `simulate_hmm` — which draws from the discretized HMM implied by
    `transition_matrix`, i.e. from the very object the likelihood assumes —
    this samples the exact pair-coalescent SMC' process along the genome:

    * the TMRCA path is piecewise constant between recombination events,
      which arrive at genome-distance rate 2*rho*s (rho per window, both
      branches of height s);
    * each recombination detaches a lineage at height Uniform(0, s); it
      re-coalesces against hazard 2*c(h) below s (half of those rejoin the
      original branch, leaving the TMRCA unchanged — the SMC' "invisible"
      events) and c(h) above s;
    * heterozygous sites are a Poisson process at rate theta*s per window,
      binned to windows (>= 1 mutation -> het, matching the binomial
      emission model).

    No transition matrix, no time discretization, no JAX: just exponential
    draws against the piecewise-constant coalescent hazard.  This is the
    independent generative process the reference gets from msprime/scrm
    (/root/reference/src/phlash/sim.py:105-124); a shared bug between
    `transition_matrix` and the likelihood cannot cancel here.

    Args:
        dm: demographic model in window-scaled units (theta/rho per window).
        L: number of windows to emit.
        seed: numpy seed.
        window_size: recorded on the contig (bp per window).
        n_samples: number of diploid samples; each is an independent SMC'
            TMRCA path, stacked as one row of the het matrix.  This matches
            the composite-likelihood assumption exactly (the model treats
            rows as independent pairs, /root/reference/src/phlash/model.py
            sums the per-row HMM log-likelihoods), so it is the right
            generative match for validating the N>1 path.  With
            n_samples > 1 no AFS is emitted: the pairwise paths cannot
            produce the joint 2N-haplotype spectrum.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_samples):
        starts, tmrca = _segments_smc_continuous(dm, L, rng)
        lengths = np.diff(starts)

        # Poisson mutations at rate theta * s per window of genome distance
        n_mut = rng.poisson(float(dm.theta) * tmrca * lengths)
        total = int(n_mut.sum())
        obs = np.zeros(L, dtype=np.int8)
        if total:
            seg_of = np.repeat(np.arange(len(lengths)), n_mut)
            pos = starts[seg_of] + rng.random(total) * lengths[seg_of]
            obs[np.minimum(pos.astype(np.int64), L - 1)] = 1
        rows.append(obs)
    afs = np.ones(1) if n_samples == 1 else None
    return RawContig(het_matrix=np.stack(rows), afs=afs, window_size=window_size)


def _segments_smc_continuous(dm, L, rng) -> tuple[np.ndarray, np.ndarray]:
    """The TMRCA path of the continuous SMC' process over [0, L] windows.

    Returns (starts, tmrca): len(starts) == len(tmrca) + 1, the path is
    tmrca[i] on [starts[i], starts[i+1]).  rng: np.random.Generator.
    """
    if isinstance(rng, int):
        rng = np.random.default_rng(rng)
    t_grid = np.asarray(dm.eta.t, dtype=np.float64)
    c = np.asarray(dm.eta.c, dtype=np.float64)
    rho = float(dm.rho if dm.rho is not None else dm.theta)

    s = _inv_hazard(t_grid, c, 0.0, rng.standard_exponential())  # TMRCA ~ pi
    x = 0.0
    seg_starts, seg_tmrca = [0.0], [s]
    while True:
        # recombination events arrive at genome-distance rate 2*rho*s
        x += rng.standard_exponential() / (2.0 * rho * s)
        if x >= L:
            break
        # detach a lineage at height Uniform(0, s); float it upward against
        # hazard 2c below s (two available partners), capping the draw at s
        u = rng.uniform(0.0, s)
        h = _inv_hazard(t_grid, c, u, rng.standard_exponential(), mult=2.0, cap=s)
        if h < s:
            # coalesced below s: half the events rejoin the original branch
            # (invisible: TMRCA unchanged), half hit the other branch
            if rng.random() < 0.5:
                s = h
            else:
                continue
        else:
            # floating above s: single partner left, hazard c(h)
            s = _inv_hazard(t_grid, c, s, rng.standard_exponential())
        seg_starts.append(x)
        seg_tmrca.append(s)
    seg_starts.append(float(L))
    return np.asarray(seg_starts), np.asarray(seg_tmrca)


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


# -- scrm subprocess tier -----------------------------------------------------

# above this scaled recombination rate (4 N0 r L) msprime's exact ARG sampler
# becomes impractically slow and the SMC-approximating scrm takes over
# (engine-switch parity with /root/reference/src/phlash/sim.py:165-173)
SCRM_RHO_THRESHOLD = 1e5


def mean_coal_N0(model, populations: list[str]) -> float:
    """Effective N0 = (mean pairwise coalescence time) / 2 for the sampled
    populations (reference sim.py:127-132).  Requires msprime."""
    dbg = model.model.debug()
    if len(populations) == 1:
        lineages = {populations[0]: 2}
    else:
        assert len(populations) == 2
        lineages = {p: 1 for p in populations}
    return float(dbg.mean_coalescence_time(lineages)) / 2.0


def build_scrm_command(
    graph,
    samples_per_deme: list[int],
    N0: float,
    theta: float,
    rho: float,
    L: int,
    seed: int,
) -> list[str]:
    """Assemble the scrm argv for one chromosome.

    `graph` is a demes.Graph; demes.to_ms renders the demography flags.
    Emits --transpose-segsites (site-major output, parsed by
    parse_scrm_stream) and -oSFS; very large samples get the `-l 100r`
    window approximation, as in the reference (sim.py:191-233).
    """
    import os
    import shlex

    import demes

    n_hap = sum(samples_per_deme)
    demo_flags = shlex.split(demes.to_ms(graph, N0=N0, samples=samples_per_deme))
    argv = [os.environ.get("SCRM_PATH", "scrm"), str(n_hap), "1"]
    argv += demo_flags
    argv += ["-t", str(theta), "-r", str(rho), str(int(L))]
    argv += ["--transpose-segsites", "-SC", "abs", "-p", "14", "-oSFS", "-seed", str(seed)]
    if n_hap > 200:
        argv += ["-l", "100r"]
    return argv


def parse_scrm_stream(lines: Iterable[str], window_size: int = 100) -> RawContig:
    """Parse `scrm ... --transpose-segsites` output into a binned RawContig.

    The stream layout: an echoed command line (from which the sequence
    length L and haplotype count are recovered), assorted preamble, a
    header line starting with "position", then one line per segregating
    site: `position time hap0 hap1 ...`.  Haplotypes 2i and 2i+1 form
    diploid individual i; a window is heterozygous-counted when the pair
    differs, and the derived-allele total feeds the AFS.  (The reference
    instead renders a synthetic VCF and re-parses it, sim.py:255-293; going
    straight to the binned matrix skips that round trip.)
    """
    it = iter(lines)
    argv = next(it).split()
    if not argv or "scrm" not in argv[0]:
        raise ValueError(f"not an scrm stream (first line: {' '.join(argv[:4])!r})")
    n_hap = int(argv[1])
    if n_hap % 2:
        raise ValueError("scrm output must have an even haplotype count")
    L = int(float(argv[argv.index("-r") + 2]))
    n_dip = n_hap // 2

    for line in it:
        if line.startswith("position"):
            break
    else:
        raise ValueError("no transposed-segsites section found in scrm output")

    W = -(-L // window_size)
    het = np.zeros((n_dip, W), dtype=np.int32)
    afs = np.zeros(max(n_hap - 1, 1), dtype=np.int64)
    for line in it:
        if not line.strip() or line.startswith(("SFS:", "//")):
            continue
        fields = line.split()
        pos = min(int(float(fields[0])), L - 1)
        alleles = np.frombuffer(
            " ".join(fields[2:]).replace(" ", "").encode(), dtype=np.uint8
        ) - ord("0")
        if alleles.size != n_hap:
            raise ValueError(
                f"variant row has {alleles.size} haplotypes, expected {n_hap}"
            )
        pairs = alleles.reshape(n_dip, 2)
        het[:, pos // window_size] += pairs[:, 0] != pairs[:, 1]
        k = int(alleles.sum())
        if 0 < k < n_hap:
            afs[k - 1] += 1
    return RawContig(
        het_matrix=het.clip(-1, 127).astype(np.int8), afs=afs, window_size=window_size
    )


def simulate_scrm(
    model,
    chrom,
    populations: dict[str, int],
    N0: float,
    seed: int,
    window_size: int = 100,
) -> RawContig:
    """Simulate one stdpopsim contig through an external scrm process.

    model/chrom: stdpopsim DemographicModel / Contig.  Raises if the scrm
    executable (env SCRM_PATH, default "scrm") is unavailable.
    """
    import subprocess

    (interval,) = chrom.interval_list[0]
    assert interval[0] == 0.0
    L = int(interval[1])
    theta = 4 * N0 * chrom.mutation_rate * L
    rho = 4 * N0 * float(chrom.recombination_map.rate[0]) * L
    graph = model.model.to_demes()
    samples = [0] * len(graph.demes)
    names = [d.name for d in graph.demes]
    for pop, n in populations.items():
        samples[names.index(pop)] += 2 * n
    argv = build_scrm_command(graph, samples, N0, theta, rho, L, seed)
    logger.debug("running %s", " ".join(argv))
    with subprocess.Popen(
        argv, stdout=subprocess.PIPE, text=True, bufsize=1
    ) as proc:
        contig = parse_scrm_stream(proc.stdout, window_size)
    if proc.returncode:
        raise RuntimeError(f"scrm exited with status {proc.returncode}")
    return contig


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
    (/root/reference/src/phlash/sim.py:28-102): chromosomes whose scaled
    recombination rate 4*N0*r*L exceeds SCRM_RHO_THRESHOLD are simulated
    through an external scrm process (with automatic msprime fallback);
    everything else uses msprime.  `options={"engine": "scrm"|"msprime"}`
    forces a choice.  Requires the optional `stdpopsim` package.

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
    engine_opt = options.get("engine")  # None = auto, "msprime", "scrm"
    N0 = None
    data = {}
    for i, chrom in enumerate(keep):
        spec = species.get_contig(
            chrom,
            mutation_rate=mu,
            length_multiplier=options.get("length_multiplier", 1.0),
        )
        choice = engine_opt
        if choice is None:
            if N0 is None:
                N0 = mean_coal_N0(model, list(samples))
            L_c = float(spec.interval_list[0][0, 1])
            rho_scaled = 4 * N0 * float(spec.recombination_map.rate[0]) * L_c
            choice = "scrm" if rho_scaled > SCRM_RHO_THRESHOLD else "msprime"
        if choice == "scrm":
            if N0 is None:
                N0 = mean_coal_N0(model, list(samples))
            try:
                data[chrom] = simulate_scrm(model, spec, samples, N0, seed + i)
                continue
            except Exception as e:
                logger.warning("scrm failed for %s (%s); using msprime", chrom, e)
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
