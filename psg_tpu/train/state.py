"""Train state pytree: params / optimizer state / step / PRNG.

Everything a stage needs to resume is in this one pytree (checkpointed by
core.checkpoint; the reference saves the same fields via torch.save dicts,
vae_trainer.py:515-541)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp


class TrainState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Any
    rng: jnp.ndarray  # PRNG key

    @classmethod
    def create(cls, params, opt_state, rng):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=opt_state, rng=rng)
