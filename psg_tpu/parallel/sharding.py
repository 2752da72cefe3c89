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


def _assign_sharding(mesh: Mesh, rule: Optional[Callable], path, leaf):
    spec = rule(path, leaf) if rule is not None else P()
    model_size = mesh.shape.get("model", 1)
    # validate divisibility; replicate on mismatch
    for dim, axis in zip(getattr(leaf, "shape", ()), spec):
        if axis == "model" and dim % model_size != 0:
            return NamedSharding(mesh, P())
    return NamedSharding(mesh, spec)


def param_shardings(params, mesh: Mesh, rule: Optional[Callable] = None):
    """Pytree of NamedShardings for ``params``.

    ``rule(path, leaf) -> PartitionSpec``; default = fully replicated.
    Falls back to replication whenever a dimension doesn't divide the mesh
    axis (odd channel counts stay replicated instead of erroring).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _assign_sharding(mesh, rule, path, leaf), params)


def shard_state(state, mesh: Mesh, rule: Optional[Callable] = None):
    """Place a whole TrainState on a mesh: params AND optimizer moments
    sharded by ``rule`` (replicated when rule is None), scalars replicated.

    The shipped rules (``unet_tp_rules``) depend only on leaf shape, so the
    Adam mu/nu trees — structurally mirrors of params — land on exactly the
    same shards as their parameters, which is what keeps the optimizer
    update fully local under TP.
    """

    def place(leaf):
        if getattr(leaf, "ndim", 0) < 2:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.device_put(leaf, _assign_sharding(mesh, rule, None, leaf))

    return jax.tree_util.tree_map(place, state)
