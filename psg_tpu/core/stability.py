"""Structural numerical-stability utilities.

The reference defends against NaNs with host-side control flow: per-batch
isnan checks that ``continue`` the Python loop, input scrubbing, try/except
around attention (improved_diffusion_trainer.py:328-333,376-393;
diffusers_unet.py:392-448; unet.py:213-255).  None of that survives jit.

The jit-safe equivalent implemented here: compute the loss and grads
unconditionally, derive a scalar ``finite`` gate, scale the updates by it
(bad batch contributes *nothing*), and increment a skipped-batch counter in
the train state — identical semantics to "skip batch and count NaNs",
branchless and fully on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_finite(tree) -> jnp.ndarray:
    """Scalar bool: every element of every leaf is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.bool_(True)
    flags = [jnp.all(jnp.isfinite(l)) for l in leaves]
    return jnp.stack(flags).all()


def finite_gate(loss, grads):
    """-> (gate fp32 scalar in {0,1}, is_finite bool)."""
    ok = jnp.isfinite(loss) & tree_finite(grads)
    return ok.astype(jnp.float32), ok


def scale_tree(tree, scalar):
    return jax.tree_util.tree_map(lambda x: x * scalar.astype(x.dtype), tree)


def global_norm(tree) -> jnp.ndarray:
    """L2 norm over all leaves (the reference computes this manually to log
    gradient explosions, improved_diffusion_trainer.py:399-407)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.float32(0.0)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))
