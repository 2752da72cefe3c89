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
    # EMA of params for sampling/serving (fp32; () = disabled).  The r3
    # stage-2 stability plan samples from the EMA — the raw 655M-UNet
    # trajectory is spiky even when healthy.
    ema: Any = ()

    @classmethod
    def create(cls, params, opt_state, rng, ema=()):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=opt_state, rng=rng, ema=ema)

    @property
    def sample_params(self):
        """EMA params when tracked, else the live params."""
        return self.ema if isinstance(self.ema, dict) and self.ema else \
            self.params
