"""Device mesh + batch sharding.

The comm backend of this framework is XLA collectives over ICI, driven by a
``jax.sharding.Mesh`` with axes ``('data', 'model')`` — replacing nothing
in the reference (it is strictly single-device, src/utils/helpers.py:35-42)
but required by the serving/scale targets (BASELINE.json config 5: batch
>= 64 sharded over a v5e-8 mesh).

- ``data``  : batch dimension (DP); gradients are psum'd by XLA under jit.
- ``model`` : channel/head dimension (TP) for the UNet's wide levels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh.  ``data=-1`` = all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on the mesh, batch-sharded over 'data'.

    Scalars / 0-d entries are replicated.  Multi-process (after
    ``parallel.multihost.initialize_distributed``): each process passes its
    PROCESS-LOCAL slice of the batch (``Loader(process_index=…)``) and the
    global array is assembled from the local shards — ``jax.device_put``
    of full arrays is a single-controller-only pattern.
    """
    multiproc = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        sharding = (replicated(mesh) if x.ndim == 0
                    else batch_sharding(mesh, x.ndim))
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
