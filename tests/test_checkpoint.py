"""Checkpoint/resume and profiling-counter tests (new vs the reference)."""

import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from phlash_tpu.checkpoint import TrainCheckpoint, load_checkpoint, save_checkpoint
from phlash_tpu.profiling import StepMeter
from phlash_tpu.svgd import SVGD


def _toy_state():
    svgd = SVGD(jax.grad(lambda x: -0.5 * jnp.sum(x**2)), optax.adam(0.1))
    particles = jnp.arange(12.0).reshape(4, 3)
    return svgd, svgd.init(particles)


def test_checkpoint_roundtrip(tmp_path):
    _, state = _toy_state()
    path = str(tmp_path / "ckpt.npz")
    key = jax.random.PRNGKey(7)
    save_checkpoint(
        path, TrainCheckpoint(step=42, state=state, key=key, ema=-1.5, best_step=40), {}
    )
    back = load_checkpoint(path, state)
    assert back.step == 42
    assert back.best_step == 40
    np.testing.assert_allclose(back.ema, -1.5)
    np.testing.assert_array_equal(
        jax.random.key_data(back.key), jax.random.key_data(key)
    )
    for a, b in zip(jax.tree.leaves(back.state), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_best_state_sidecar_dedup(tmp_path):
    """best_state lives in a sidecar rewritten only when it changes, and a
    best-== -current checkpoint stores one state, not two."""
    _, state = _toy_state()
    best = jax.tree.map(lambda a: a + 1.0, state)
    path = str(tmp_path / "ckpt.npz")
    side = path + ".best.npz"
    key = jax.random.PRNGKey(0)
    cache = {}

    save_checkpoint(
        path,
        TrainCheckpoint(step=10, state=state, key=key, ema=-1.0, best_step=6,
                        best_ema=-0.5, best_state=best),
        cache,
    )
    assert os.path.exists(side)
    mtime = os.path.getmtime(side)
    back = load_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(back.best_state), jax.tree.leaves(best)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # same best iterate again: the sidecar must NOT be rewritten
    save_checkpoint(
        path,
        TrainCheckpoint(step=20, state=state, key=key, ema=-1.0, best_step=6,
                        best_ema=-0.5, best_state=best),
        cache,
    )
    assert os.path.getmtime(side) == mtime

    # best == current: recorded by flag, no best arrays duplicated anywhere
    save_checkpoint(
        path,
        TrainCheckpoint(step=30, state=state, key=key, ema=-1.0, best_step=30,
                        best_ema=-0.2, best_state=state),
        cache,
    )
    with np.load(path) as z:
        assert not any(k.startswith("best_") for k in z.files)
    back = load_checkpoint(path, state)
    assert back.best_step == 30
    for a, b in zip(jax.tree.leaves(back.best_state), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_missing(tmp_path):
    _, state = _toy_state()
    assert load_checkpoint(str(tmp_path / "nope.npz"), state) is None


def test_checkpoint_shape_mismatch(tmp_path):
    import pytest

    _, state = _toy_state()
    path = str(tmp_path / "c.npz")
    save_checkpoint(
        path,
        TrainCheckpoint(step=1, state=state, key=jax.random.PRNGKey(0), ema=None, best_step=0),
        {},
    )
    bad = jax.tree.map(lambda a: jnp.zeros((2,) + a.shape, a.dtype), state)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_checkpoint(path, bad)


@pytest.mark.slow  # two full fit() compiles (~30 s); unit round-trips above stay fast
def test_fit_resume(tmp_path):
    "A fit interrupted and restarted must continue from the checkpoint."
    from phlash_tpu.data import RawContig
    from phlash_tpu.mcmc import fit

    het = np.random.default_rng(0).integers(0, 2, size=(1, 3000)).astype(np.int8)
    c = RawContig(het_matrix=het, afs=np.array([4, 2, 1]), window_size=100)
    path = str(tmp_path / "fit.npz")
    kw = dict(
        num_particles=4, overlap=10, chunk_size=300, num_workers=1,
        progress=False, kernel_backend="dense", checkpoint_path=path, save_every=2,
        key=jax.random.PRNGKey(3),
    )
    fit([c], niter=4, **kw)
    # restart with more iterations: resumes from step 4 and completes
    res = fit([c], niter=6, **kw)
    assert len(res) == 4


@pytest.mark.slow  # two fit() compiles
def test_fit_resume_steps_per_call(tmp_path):
    """Resume must also work under the strided loop: saves land at call
    boundaries (multiples of steps_per_call), and the restarted run
    fast-forwards to exactly the saved iteration."""
    from phlash_tpu.data import RawContig
    from phlash_tpu.mcmc import fit

    het = np.random.default_rng(1).integers(0, 2, size=(1, 3000)).astype(np.int8)
    c = RawContig(het_matrix=het, afs=np.array([4, 2, 1]), window_size=100)
    path = str(tmp_path / "fit_spc.npz")
    kw = dict(
        num_particles=4, overlap=10, chunk_size=300, num_workers=1,
        progress=False, kernel_backend="dense", checkpoint_path=path,
        save_every=3, steps_per_call=3, key=jax.random.PRNGKey(5),
    )
    fit([c], niter=6, **kw)
    # the save cadence fires at call boundaries: step is a multiple of 3.
    # load via a template state built the same way fit builds it
    from phlash_tpu.data import init_mcmc_data
    from phlash_tpu.training import build_training

    afs, chunks = init_mcmc_data([c], 100, 10, 300, num_workers=1)
    prog = build_training(
        chunks, afs, window_size=100, overlap=10, key=jax.random.PRNGKey(5),
        options=dict(kw, niter=6),
    )
    back = load_checkpoint(path, prog.state)
    assert back is not None and back.step % 3 == 0 and back.step >= 3
    res = fit([c], niter=9, **kw)
    assert len(res) == 4


@pytest.mark.heavy  # three fit() compiles (~60 s)
def test_fit_resume_matches_uninterrupted(tmp_path):
    """Interrupted + resumed == uninterrupted, bit for bit, under the
    strided loop: a run killed after its step-3 save and restarted must
    produce exactly the posterior of a straight niter=6 run (the resumed
    key/minibatch/ELPD streams may not drift)."""
    from phlash_tpu.data import RawContig
    from phlash_tpu.mcmc import fit

    het = np.random.default_rng(2).integers(0, 2, size=(1, 3000)).astype(np.int8)
    c = RawContig(het_matrix=het, afs=np.array([4, 2, 1]), window_size=100)
    kw = dict(
        num_particles=4, overlap=10, chunk_size=300, num_workers=1,
        progress=False, kernel_backend="dense", steps_per_call=3,
        minibatch_size=2, key=jax.random.PRNGKey(11),
    )
    want = fit([c], niter=6, **kw)  # uninterrupted, no checkpointing

    path = str(tmp_path / "interrupted.npz")
    fit([c], niter=3, checkpoint_path=path, save_every=3, **kw)  # "killed" at 3
    got = fit([c], niter=6, checkpoint_path=path, save_every=3, **kw)  # resumes

    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g.eta.c), np.asarray(w.eta.c))
        np.testing.assert_array_equal(np.asarray(g.eta.t), np.asarray(w.eta.t))
        np.testing.assert_array_equal(np.asarray(g.theta), np.asarray(w.theta))


def test_step_meter():
    m = StepMeter(sites_per_step=1e6)
    for _ in range(5):
        m.tick()
    assert m.steps_per_sec > 0
    assert m.msites_per_sec > 0
    assert "steps" in m.summary()


def test_async_writer_orders_saves_and_surfaces_errors(tmp_path, monkeypatch):
    """AsyncCheckpointWriter: saves land in order and durable after wait();
    a worker exception re-raises on the training thread, not silently."""
    from phlash_tpu.checkpoint import AsyncCheckpointWriter

    _, state = _toy_state()
    path = str(tmp_path / "ckpt.npz")
    key = jax.random.PRNGKey(0)
    w = AsyncCheckpointWriter()
    for step in (10, 20, 30):
        w.save(path, TrainCheckpoint(step=step, state=state, key=key, ema=None, best_step=step))
    w.wait()
    assert load_checkpoint(path, state).step == 30

    import phlash_tpu.checkpoint as ckpt_mod

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", boom)
    w2 = AsyncCheckpointWriter()
    w2.save(path, TrainCheckpoint(step=40, state=state, key=key, ema=None, best_step=40))
    with pytest.raises(OSError, match="disk full"):
        w2.wait()
    # the failure is consumed: the writer is reusable afterwards
    w2.wait()
