"""seg_len autotune: winner selection, cache persistence, dispatch fallback."""

import jax.numpy as jnp
import numpy as np
import pytest

import phlash_tpu.ops.autotune as autotune
from phlash_tpu.kernel import get_kernel


@pytest.fixture
def tune_cache(tmp_path, monkeypatch):
    path = tmp_path / "autotune.json"
    monkeypatch.setenv("PHLASH_TPU_AUTOTUNE_CACHE", str(path))
    return path


def _default_pp():
    from phlash_tpu.params import PSMCParams
    from phlash_tpu.size_history import DemographicModel

    dm = DemographicModel.default(pattern="16*1", theta=1e-2, rho=1e-2)
    return PSMCParams.from_dm(dm)


def test_autotune_picks_fastest_and_caches(tune_cache, monkeypatch):
    fake = {128: 3.0, 256: 1.0, 512: 2.0}
    calls = []

    def fake_time(kern, pps, inds, **kw):
        calls.append(kern.seg_len)
        return fake[kern.seg_len]

    monkeypatch.setattr(autotune, "_time_grad", fake_time)
    seg = autotune.autotune_seg_len(L=1000, B=4, S=2)
    assert seg == 256
    assert sorted(calls) == [128, 256, 512]
    assert tune_cache.exists()

    # second call must come from the cache: timing any candidate is an error
    def boom(*a, **kw):
        raise AssertionError("timed a candidate on a cache hit")

    monkeypatch.setattr(autotune, "_time_grad", boom)
    assert autotune.autotune_seg_len(L=1000, B=4, S=2) == 256
    # a different shape is a different key and re-tunes
    monkeypatch.setattr(autotune, "_time_grad", fake_time)
    assert autotune.autotune_seg_len(L=2000, B=4, S=2) == 256


def test_autotune_failure_falls_back_to_default(tune_cache, monkeypatch):
    from phlash_tpu.ops.pallas_smc import DEFAULT_SEG

    def fail(*a, **kw):
        raise RuntimeError("no device")

    monkeypatch.setattr(autotune, "_time_grad", fail)
    assert autotune.autotune_seg_len(L=1000, B=4, S=2) == DEFAULT_SEG


def test_autotune_setup_failure_falls_back_to_default(tune_cache, monkeypatch):
    # an exception BEFORE candidate timing (device query, data synthesis)
    # must also resolve to the default instead of propagating into fit()
    from phlash_tpu.ops.pallas_smc import DEFAULT_SEG

    import jax

    def boom(*a, **kw):
        raise RuntimeError("no backend")

    monkeypatch.setattr(jax, "devices", boom)
    assert autotune.autotune_seg_len(L=1000, B=4, S=2) == DEFAULT_SEG


def test_autotune_cache_key_includes_m_and_precision(tune_cache, monkeypatch):
    # a winner tuned at M=16/f32 must not be reused for M=32 or f64 runs
    fake = {128: 3.0, 256: 1.0, 512: 2.0}
    timed = []

    def fake_time(kern, pps, inds, **kw):
        timed.append(kern.seg_len)
        return fake[kern.seg_len]

    monkeypatch.setattr(autotune, "_time_grad", fake_time)
    assert autotune.autotune_seg_len(L=1000, B=4, S=2) == 256
    assert len(timed) > 0
    # f64 is a different cache key; the structured kernel is f32-only, so
    # every candidate fails to build and the default is returned instead of
    # the cached f32 winner being (wrongly) reused
    from phlash_tpu.ops.pallas_smc import DEFAULT_SEG

    assert autotune.autotune_seg_len(L=1000, B=4, S=2, double_precision=True) == DEFAULT_SEG


def test_get_kernel_auto_on_cpu_uses_dense_default(tune_cache):
    # on CPU the default backend is dense; "auto" must not invoke the
    # Pallas autotune and must not leak the string into seg_len
    data = np.zeros((2, 64), dtype=np.int8)
    kern = get_kernel(M=16, data=data, seg_len="auto")
    assert type(kern).__name__ == "DenseKernel"
    ll = kern.loglik(_default_pp(), 0)  # usable, not just constructed
    assert jnp.isfinite(ll)


def test_get_kernel_auto_pallas_uses_tuned_value(tune_cache, monkeypatch):
    # force the pallas backend and a fake tuner: the kernel must be built
    # with the tuned seg_len at the caller's tune_shape
    seen = {}

    def fake_tune(L, B, S, **kw):
        seen.update(L=L, B=B, S=S)
        return 128

    monkeypatch.setattr(
        "phlash_tpu.ops.autotune.autotune_seg_len", fake_tune
    )
    data = np.zeros((2, 300), dtype=np.int8)
    kern = get_kernel(M=16, data=data, backend="pallas", seg_len="auto",
                      tune_shape=(8, 2))
    assert seen == dict(L=300, B=8, S=2)
    assert kern.seg_len == 128
    assert kern.data.shape[-1] == 384  # padded to the tuned segment
