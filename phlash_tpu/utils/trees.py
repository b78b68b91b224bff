"""Pytree batching helpers (reference: /root/reference/src/phlash/util.py:40-46)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_stack(trees):
    "Stack a list of identically-structured pytrees into one batched pytree."
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *trees)


def tree_unstack(tree):
    "Invert tree_stack: split a batched pytree into a list along axis 0."
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [treedef.unflatten(vals) for vals in zip(*leaves, strict=True)]
