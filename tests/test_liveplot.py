"""Live-plot callback via fake IPython/plotly (both absent here).

Exercises the notebook detection, figure construction, and the per-
iteration quantile update — the only members of either package the module
touches are duck-typed below.  (cf. reference liveplot.py:13-133, whose
plotly path is likewise notebook-only.)
"""

import sys
import types
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phlash_tpu.size_history import DemographicModel, SizeHistory


class _FakeTrace:
    def __init__(self, **kw):
        self.__dict__.update(kw)
        self.x = kw.get("x")
        self.y = kw.get("y")


class _FakeFigureWidget:
    def __init__(self):
        self.data = []
        self.displayed = False

    def update_xaxes(self, **kw):
        pass

    def update_yaxes(self, **kw):
        pass

    def add_scatter(self, **kw):
        self.data.append(_FakeTrace(**kw))
        return self

    def batch_update(self):
        import contextlib

        return contextlib.nullcontext()


def _install_fakes(monkeypatch):
    shell = SimpleNamespace(config={"IPKernelApp": {}})
    ipython = types.ModuleType("IPython")
    ipython.get_ipython = lambda: shell
    display_mod = types.ModuleType("IPython.display")
    shown = []
    display_mod.display = shown.append
    ipython.display = display_mod
    monkeypatch.setitem(sys.modules, "IPython", ipython)
    monkeypatch.setitem(sys.modules, "IPython.display", display_mod)

    plotly = types.ModuleType("plotly")
    go = types.ModuleType("plotly.graph_objects")
    go.FigureWidget = _FakeFigureWidget
    plotly.graph_objects = go
    monkeypatch.setitem(sys.modules, "plotly", plotly)
    monkeypatch.setitem(sys.modules, "plotly.graph_objects", go)
    return shown


def _batched_dms(n=4):
    eta = SizeHistory(
        t=jnp.asarray(np.r_[0.0, np.geomspace(1e-3, 10.0, 7)], jnp.float32),
        c=jnp.ones(8, jnp.float32),
    )
    dm = DemographicModel(eta=eta, theta=1e-2, rho=1e-2)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (n,) + jnp.shape(a)), dm
    )


def test_liveplot_updates_traces(monkeypatch):
    from phlash_tpu.liveplot import liveplot_cb

    shown = _install_fakes(monkeypatch)
    truth = jax.tree.map(lambda a: a[0], _batched_dms(1))
    cb = liveplot_cb(truth=truth, num_points=16)
    (fig,) = shown
    # truth trace plus the three band/median traces
    assert len(fig.data) == 4
    cb(_batched_dms(4))
    lower, upper, median = fig.data[1:]
    for tr in (lower, upper, median):
        assert len(tr.x) == 16 and len(tr.y) == 16
    # identical particles: the band collapses onto the median
    np.testing.assert_allclose(np.asarray(lower.y), np.asarray(median.y), rtol=1e-6)
    # Ne = 1/(2c) = 0.5 everywhere for the unit history
    np.testing.assert_allclose(np.asarray(median.y), 0.5, rtol=1e-5)


def test_liveplot_requires_notebook(monkeypatch):
    from phlash_tpu.liveplot import liveplot_cb

    ipython = types.ModuleType("IPython")
    ipython.get_ipython = lambda: None
    monkeypatch.setitem(sys.modules, "IPython", ipython)
    with pytest.raises(ImportError, match="Jupyter"):
        liveplot_cb()
