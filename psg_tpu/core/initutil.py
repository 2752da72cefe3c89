"""Jitted parameter initialization.

Calling ``*_init`` functions eagerly dispatches one tiny XLA program per
leaf (~700 for the UNet) — negligible on local CPU, minutes through a
remote-compiled TPU tunnel.  ``jit_init`` compiles the whole init as ONE
program.
"""

from __future__ import annotations

import jax


def jit_init(init_fn, key, *args, **kwargs):
    """Run ``init_fn(key, *args, **kwargs)`` as a single compiled program.

    args/kwargs must be static (configs, ints, dtypes).
    """
    return jax.jit(lambda k: init_fn(k, *args, **kwargs))(key)
