"""Checkpoint/resume for SVGD training state.

The reference has no checkpointing (training is minutes-scale and early
stopping keeps the best state in memory only — SURVEY.md §5).  For
pod-scale runs this module persists the full sampler state — particles,
optimizer moments, PRNG key, iteration counter and ELPD tracker — as a
portable atomic .npz (the state is a few MB of arrays; a single
atomically-replaced flat file needs no directory/version machinery and
restores bit-exactly on any host).  `fit(..., checkpoint_path=...,
save_every=...)` wires it in; an interrupted run restarted with the same
arguments resumes from the last saved step.

The best-held-out-ELPD state is stored OUT of the periodic file, in a
sidecar ``<path>.best.npz`` rewritten only when the best iterate actually
changes: periodic saves then write one state, not two, and a best iterate
that stopped improving long ago is not re-serialized every ``save_every``
steps.  When the best iterate IS the current one, the main file just
records that and no sidecar write happens at all.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# best_state storage modes in the meta record
_BEST_NONE = 0  # no best state tracked
_BEST_SIDECAR = 1  # best state lives in <path>.best.npz
_BEST_IS_CURRENT = 2  # best state == the main file's state


@dataclass
class TrainCheckpoint:
    step: int
    state: Any  # SVGDState pytree
    key: jax.Array
    ema: float | None
    best_step: int
    best_ema: float | None = None
    best_state: Any = None  # best-held-out-ELPD SVGDState, if tracked


def _best_path(path: str) -> str:
    return path + ".best.npz"


def _write_npz_atomic(path: str, arrays: dict) -> None:
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def save_checkpoint(path: str, ckpt: TrainCheckpoint, cache: dict) -> None:
    """Persist a TrainCheckpoint atomically to `path` (.npz).

    `cache` is a caller-held dict that lets repeated saves from the same
    run skip rewriting the best-state sidecar while the best iterate is
    unchanged (it also keeps the state treedef).
    """
    leaves, treedef = jax.tree_util.tree_flatten(ckpt.state)
    cache["treedef"] = treedef
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__key"] = np.asarray(jax.random.key_data(ckpt.key))

    if ckpt.best_state is None:
        best_mode = _BEST_NONE
    elif ckpt.best_state is ckpt.state or ckpt.best_step == ckpt.step:
        best_mode = _BEST_IS_CURRENT
    else:
        best_mode = _BEST_SIDECAR
        # the sidecar changes only when a new best iterate appears; write
        # it BEFORE the main file so a crash in between leaves a readable
        # (older) main file rather than a main file pointing at nothing
        if cache.get("best_step_written") != ckpt.best_step:
            best_leaves, _ = jax.tree_util.tree_flatten(ckpt.best_state)
            best_arrays = {f"best_{i}": np.asarray(x) for i, x in enumerate(best_leaves)}
            best_arrays["__best_step"] = np.array(ckpt.best_step, dtype=np.int64)
            _write_npz_atomic(_best_path(path), best_arrays)
            cache["best_step_written"] = ckpt.best_step

    arrays["__meta"] = np.array(
        [
            ckpt.step,
            ckpt.best_step,
            1 if ckpt.ema is not None else 0,
            best_mode,
            1 if ckpt.best_ema is not None else 0,
        ],
        dtype=np.int64,
    )
    arrays["__ema"] = np.array(ckpt.ema if ckpt.ema is not None else 0.0)
    arrays["__best_ema"] = np.array(ckpt.best_ema if ckpt.best_ema is not None else 0.0)
    _write_npz_atomic(path, arrays)
    logger.debug("checkpoint saved at step %d -> %s", ckpt.step, path)


class AsyncCheckpointWriter:
    """Single-flight background saver: the training loop hands off a
    TrainCheckpoint and keeps dispatching device steps while the
    device->host transfer and the npz write happen on a worker thread.

    jax Arrays are immutable, so the snapshot taken by the worker is
    exactly the state at hand-off.  Saves are strictly ordered (a new save
    joins the previous one first — they are `save_every` iterations apart,
    so an actual wait means disk is slower than training and throttling is
    the right behavior).  A worker exception is re-raised on the next
    save()/wait() so failures surface on the training thread.
    """

    def __init__(self):
        self._thread = None
        self._cache: dict = {}
        self._err: BaseException | None = None

    def _join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def save(self, path: str, ckpt: TrainCheckpoint) -> None:
        import threading

        self._join()

        def work():
            try:
                save_checkpoint(path, ckpt, self._cache)
            except BaseException as e:  # surfaced on the training thread
                self._err = e

        self._thread = threading.Thread(target=work, name="ckpt-writer", daemon=True)
        self._thread.start()

    def wait(self) -> None:
        "Block until the in-flight save (if any) is durable."
        self._join()


def load_checkpoint(path: str, example_state) -> TrainCheckpoint | None:
    "Restore a TrainCheckpoint matching example_state's structure, or None."
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        leaves, treedef = jax.tree_util.tree_flatten(example_state)
        n = len(leaves)
        loaded = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
        for got, want in zip(loaded, leaves):
            if got.shape != jnp.shape(want):
                raise ValueError(
                    f"checkpoint shape mismatch: {got.shape} vs {jnp.shape(want)}; "
                    "was the run configured differently?"
                )
        state = jax.tree_util.tree_unflatten(treedef, loaded)
        key = jax.random.wrap_key_data(jnp.asarray(z["__key"]))
        meta = [int(v) for v in z["__meta"]]
        step, best_step, has_ema = meta[:3]
        best_mode, has_best_ema = (meta[3], meta[4]) if len(meta) >= 5 else (0, 0)
        ema = float(z["__ema"]) if has_ema else None
        best_ema = float(z["__best_ema"]) if has_best_ema else None

    best_state = None
    if best_mode == _BEST_IS_CURRENT:
        best_state = state
    elif best_mode == _BEST_SIDECAR:
        bp = _best_path(path)
        if os.path.exists(bp):
            with np.load(bp) as zb:
                if int(zb["__best_step"]) == best_step:
                    best_leaves = [jnp.asarray(zb[f"best_{i}"]) for i in range(n)]
                    best_state = jax.tree_util.tree_unflatten(treedef, best_leaves)
                else:  # crash between sidecar and main writes: stale sidecar
                    logger.warning(
                        "best-state sidecar %s is from step %d but the "
                        "checkpoint records best_step=%d; dropping the "
                        "best-state tracker (training state is unaffected)",
                        bp,
                        int(zb["__best_step"]),
                        best_step,
                    )
        else:
            logger.warning("best-state sidecar %s missing; dropping the tracker", bp)

    logger.info("resumed from checkpoint %s at step %d", path, step)
    return TrainCheckpoint(
        step=step,
        state=state,
        key=key,
        ema=ema,
        best_step=best_step,
        best_ema=best_ema,
        best_state=best_state,
    )
