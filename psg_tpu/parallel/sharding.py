"""Parameter sharding rules (tensor parallelism).

At 655M params the UNet fits on one chip (BASELINE.md), so TP is optional —
but the wide 640/1280-channel levels shard cleanly over the 'model' axis:
conv kernels [kh,kw,cin,cout] and linear kernels [in,out] split their
output-channel axis; XLA inserts the all-gathers/reduce-scatters where
layouts meet (scaling-book recipe: annotate shardings, let XLA place
collectives over ICI).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def unet_tp_rules(min_channels: int = 640) -> Callable:
    """Rule: shard the last axis of big kernels over 'model'.

    Returns a fn(path, leaf) -> PartitionSpec.
    """

    def rule(path, leaf):
        if leaf.ndim in (2, 4):
            cout = leaf.shape[-1]
            cin = leaf.shape[-2] if leaf.ndim == 2 else leaf.shape[2]
            if cout >= min_channels:
                return P(*([None] * (leaf.ndim - 1)), "model")
            # shard the contraction axis when only cin is wide, so the
            # matmul consumes the TP-sharded activation without a gather
            if cin >= min_channels:
                specs = [None] * leaf.ndim
                specs[-2 if leaf.ndim == 2 else 2] = "model"
                return P(*specs)
        return P()

    return rule


def param_shardings(params, mesh: Mesh, rule: Optional[Callable] = None):
    """Pytree of NamedShardings for ``params``.

    ``rule(path, leaf) -> PartitionSpec``; default = fully replicated.
    Falls back to replication whenever a dimension doesn't divide the mesh
    axis (odd channel counts stay replicated instead of erroring).
    """
    model_size = mesh.shape.get("model", 1)

    def assign(path, leaf):
        spec = rule(path, leaf) if rule is not None else P()
        # validate divisibility; replicate on mismatch
        for dim, axis in zip(leaf.shape, spec):
            if axis == "model" and dim % model_size != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)
