"""Seeding (src/utils/helpers.py:25-32 equivalent).

JAX randomness is already explicit via PRNG keys; this seeds the host-side
numpy/python RNGs used by the data pipeline and returns the base JAX key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
