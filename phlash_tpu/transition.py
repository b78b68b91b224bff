"""SMC' discretized transition matrix over TMRCA intervals.

Builds the M×M transition matrix of the discretized pair-coalescent HMM from
a demographic model, using the closed-form matrix exponential of the 3-state
(no-event / floating-lineage / recoalesced) SMC' generator composed across
time intervals with an associative scan.  Math contract identical to the
reference (/root/reference/src/phlash/transition.py:9-121); the oracle tests
check `expQ` against scipy.linalg.expm and the continuous transition density
`q_s` against quadrature.

The assembled matrix has the compressed structure exploited by the HMM
kernels (see phlash_tpu.params.PSMCParams):
    A[i, j] = b[j]           for i > j   (column-constant lower triangle)
    A[j, j] = d[j]                       (diagonal)
    A[i, j] = u[i] * v[j]    for i < j   (rank-one upper triangle)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phlash_tpu.size_history import DemographicModel


def expQ(r, c, n):
    """e^Q for the SMC' rate generator over one interval, in closed form.

    Q generates a 3-state chain: state 0 = lineages coalesced (no
    recombination event separating the two loci yet), state 1 = a floating
    (recombined, not yet re-coalesced) lineage, state 2 = re-coalesced at a
    different time (absorbing).  `r` is the scaled recombination distance and
    `c` the scaled coalescence intensity over the interval; `n` is the sample
    size (n=2 for the pairwise HMM).

    The 2x2 top-left block has eigen-decomposition expressible through
    cosh/sinh; the sinh(u)/u factor is series-expanded for small u so float32
    gradients stay finite.  (reference: transition.py:9-34)
    """
    u = jnp.sqrt((c * n) ** 2 - 2.0 * c * (n - 2) * r + r**2) / 2.0
    v = (r + c * n) / 2.0
    w = (r - c * n) / 2.0
    # e^{-v} cosh(u) and e^{-v} sinh(u)/u, overflow-safe via exp(u-v)
    ch = (jnp.exp(u - v) + jnp.exp(-(u + v))) / 2.0
    tiny = u < 1e-6
    u_ok = jnp.where(tiny, 1.0, u)
    sh_over_u = jnp.where(
        tiny,
        jnp.exp(-v) * (1.0 + u_ok**2 / 6.0),
        (jnp.exp(u - v) - jnp.exp(-(u + v))) / (2.0 * u_ok),
    )
    p00 = ch - w * sh_over_u
    p01 = r * sh_over_u
    p10 = c * sh_over_u
    p11 = ch + w * sh_over_u
    return jnp.array(
        [
            [p00, p01, 1.0 - p00 - p01],
            [p10, p11, 1.0 - p10 - p11],
            [0.0, 0.0, 1.0],
        ]
    )


def transition_matrix(dm: DemographicModel, n: int = 2) -> jax.Array:
    """M×M SMC' transition matrix between discretized TMRCA intervals.

    Strategy (reference: transition.py:37-85): augment the time grid with the
    per-interval expected coalescence times, propagate the 3-state chain
    across all 2M+1 sub-intervals with an associative matmul scan, and read
    off lower / diagonal / upper entries from the cumulative products.
    """
    eta = dm.eta
    c_adj = eta.c * (n - 1)
    t = eta.t
    dt = jnp.diff(t)
    ect = eta.ect()

    # interleave breakpoints and expected coal times: t0, e0, t1, e1, ...
    grid = jnp.stack([t, ect], axis=1).reshape(-1)
    dgrid = jnp.diff(grid)
    degenerate = jnp.isclose(dgrid, 0.0)
    dgrid_ok = jnp.where(degenerate, 1.0, dgrid)
    c_rep = jnp.repeat(eta.c, 2)[:-1]
    P = jax.vmap(expQ, (0, 0, None))(2.0 * dgrid_ok * dm.rho, dgrid_ok * c_rep, n)
    P = jnp.where(degenerate[:, None, None], jnp.eye(3)[None], P)
    absorbing = jnp.full((3, 3), 0.0).at[:, 2].set(1.0)
    P = jnp.concatenate([jnp.eye(3)[None], P, absorbing[None]], axis=0)
    cum = jax.lax.associative_scan(jnp.matmul, P)
    at_t = cum[::2]  # chain state at each breakpoint t_k
    at_e = cum[1::2]  # chain state at each expected coal time e_k

    i, j = jnp.ogrid[: dm.M, : dm.M]

    # lower triangle: recombined lineage re-coalesces in an earlier interval j
    lower = jnp.diff(at_t[:, 0, 2])[jnp.broadcast_to(j, (dm.M, dm.M))] * (i > j)

    # diagonal: no recombination by e_i, or floating at e_i but re-coalescing
    # before t_{i+1}, or already re-coalesced within the interval
    p_back = jnp.append(-jnp.expm1(-(t[1:] - ect[:-1]) * c_adj[:-1]), 1.0)
    diag = at_e[:, 0, 0] + at_e[:, 0, 1] * p_back + (at_e[:, 0, 2] - at_t[:-1, 0, 2])

    # upper triangle: floating at e_i, survives to t_{i+1}, then survives each
    # intermediate interval l and finally coalesces in interval j
    esc = jnp.append(jnp.exp(-(t[1:] - ect[:-1]) * c_adj[:-1]), 0.0)
    p_float_out = (at_e[:, 0, 1] * esc).clip(1e-8, 1.0 - 1e-8)  # leaves interval i
    p_surv = jnp.append(jnp.exp(-dt * c_adj[:-1]), 0.0).clip(1e-8, 1.0 - 1e-8)
    p_coal = jnp.append(-jnp.expm1(-dt * c_adj[:-1]), 1.0).clip(1e-8, 1.0 - 1e-8)
    # prod_{i < l < j} p_surv[l] via cumulative log sums (exclusive prefix)
    cls = jnp.concatenate([jnp.zeros(1), jnp.cumsum(jnp.log(p_surv))])
    log_span = cls[jnp.maximum(j, i + 1)] - cls[i + 1]  # sum over l in (i, j)
    upper = p_float_out[i] * jnp.exp(log_span) * p_coal[j] * (j > i)

    return lower + jnp.diagflat(diag) + upper


def q_s(*, eta, s, r):
    """Continuous SMC' transition density from TMRCA=s to TMRCA=t at scaled
    recombination distance r.  Test oracle only (integrates to 1; checked by
    quadrature).  Returns (density q(t), atom weight P(stay at s)).

    Note: this is the *exact* density — for t < s the 3-state chain product
    is cut at t, so q(t<s) = eta(t) * P_{0->t}[0, 1].  The reference's
    version (transition.py:88-121) cuts at s instead, which is only correct
    in the r -> 0 limit (its own test uses r=1e-6); ours integrates to 1 for
    any r.
    """

    def chain_at(x):
        "3-state chain state after evolving over branch heights [0, x]."
        grid = jnp.sort(jnp.append(eta.t, x))
        k = jnp.searchsorted(grid, x, side="right")
        rates = eta(grid)
        dg = jnp.diff(grid)
        P = jax.vmap(expQ, (0, 0, None))(dg * r, dg * rates[:-1], 2)
        # Pcum[i] = product over intervals 0..i; intervals ending at x are
        # 0..k-2 (grid[k-1] == x after insertion)
        return jax.lax.associative_scan(jnp.matmul, P)[k - 2]

    R = eta.R
    P_s = chain_at(s)

    def q(t):
        return eta(t) * jnp.where(
            t < s,
            chain_at(t)[0, 1],
            P_s[0, 1] * jnp.exp(-(R(t) - R(s))),
        )

    return q, P_s[0, 0]
