from psg_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from psg_tpu.parallel.multihost import (
    initialize_distributed,
    make_multihost_mesh,
)
from psg_tpu.parallel.sharding import (
    param_shardings,
    shard_state,
    unet_tp_rules,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "initialize_distributed",
    "make_multihost_mesh",
    "param_shardings",
    "shard_state",
    "unet_tp_rules",
]
