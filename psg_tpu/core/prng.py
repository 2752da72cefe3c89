"""Explicit PRNG-key discipline.

The reference uses global torch RNG state (``torch.manual_seed``,
src/utils/helpers.py:25-32); here every random draw threads an explicit
``jax.random`` key so training state is checkpointable and sampling is
reproducible under jit/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_seq(key):
    """Infinite generator of fresh subkeys from a base key (host-side use)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def split_like(key, tree):
    """Split ``key`` into one subkey per leaf of ``tree`` (same structure)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))


def fold_step(key, step):
    """Derive a per-step key deterministically inside a jitted train step."""
    return jax.random.fold_in(key, jnp.asarray(step, dtype=jnp.uint32))
