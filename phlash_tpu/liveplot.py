"""Live monitoring of the posterior during fitting.

The reference injects plotly JS into Jupyter
(/root/reference/src/phlash/liveplot.py:13-133); here the default live view
is dependency-light: inside IPython with plotly installed we update a
FigureWidget, otherwise we fall back to a no-op (the `fit` progress bar
already reports ELPD).  The quantile computation is jitted and shared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _posterior_quantiles(batched_dms, t):
    "Median and 95% band of Ne(t) over the particle batch at times t."
    Ne = jax.vmap(lambda dm: dm.eta(t, Ne=True))(batched_dms)
    return jnp.quantile(Ne, jnp.array([0.025, 0.5, 0.975]), axis=0)


def _in_notebook() -> bool:
    try:
        from IPython import get_ipython

        shell = get_ipython()
        return shell is not None and "IPKernelApp" in shell.config
    except Exception:
        return False


def liveplot_cb(truth=None, num_points: int = 200):
    """Return a callback(dms_batched) that live-updates a posterior plot.

    Raises ImportError when no live-plot backend is available, which `fit`
    treats as "use a silent callback".
    """
    if not _in_notebook():
        raise ImportError("live plotting requires a Jupyter environment")
    import plotly.graph_objects as go  # optional dependency
    from IPython.display import display

    fig = go.FigureWidget()
    fig.update_xaxes(type="log", title="Time")
    fig.update_yaxes(type="log", title="Ne")
    if truth is not None:
        tt = np.geomspace(max(float(truth.eta.t[1]), 1e-6), float(truth.eta.t[-1]) * 2, 200)
        fig.add_scatter(x=tt, y=np.asarray(truth.eta(tt, Ne=True)), name="truth")
    lower = fig.add_scatter(x=[], y=[], line=dict(width=0), showlegend=False).data[-1]
    upper = fig.add_scatter(
        x=[], y=[], fill="tonexty", line=dict(width=0), name="95% band"
    ).data[-1]
    median = fig.add_scatter(x=[], y=[], name="median").data[-1]
    display(fig)

    def cb(dms_batched):
        t1 = float(jnp.quantile(dms_batched.eta.t[:, 1], 0.025))
        tM = float(jnp.quantile(dms_batched.eta.t[:, -1], 0.975))
        t = jnp.geomspace(max(t1, 1e-8), tM, num_points)
        lo, med, hi = np.asarray(_posterior_quantiles(dms_batched, t))
        with fig.batch_update():
            for trace, y in [(lower, lo), (upper, hi), (median, med)]:
                trace.x = np.asarray(t)
                trace.y = y

    return cb
