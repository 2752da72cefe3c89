"""Multi-host / multi-slice entry point (SURVEY.md §2.6 comm backend).

The reference is strictly single-device (src/utils/helpers.py:35-42); this
module is the framework's DCN story: one ``jax.distributed.initialize``
call per host process, after which ``jax.devices()`` is the GLOBAL device
list and the existing ('data', 'model') mesh + XLA collectives work
unchanged — gradient psums cross ICI within a slice and DCN between
slices, laid out by the mesh construction below.

Pieces:

- :func:`initialize_distributed` — idempotent env-driven init.  On cloud
  TPU pods the runtime env is auto-detected (``jax.distributed.initialize``
  with no args); elsewhere ``PSG_TPU_COORDINATOR_ADDRESS`` /
  ``PSG_TPU_NUM_PROCESSES`` / ``PSG_TPU_PROCESS_ID`` (or explicit args)
  drive it.  No-op returning False when nothing is configured, so
  single-process runs never pay for it.
- :func:`make_multihost_mesh` — ('data', 'model') mesh over the global
  device list with process-contiguous 'model' groups: TP collectives stay
  on ICI inside one host/slice, only the DP gradient reduction rides DCN.
- Process-local data: ``data.Loader(process_index=, process_count=)``
  slices every global batch, and ``parallel.shard_batch`` assembles global
  arrays from the local shards via
  ``jax.make_array_from_process_local_data``.

Verification without N hosts: ``python -m psg_tpu.parallel.multihost
<process_id> <num_processes> <port> [devices_per_process]`` is a smoke
worker used by tests/test_multihost.py (and
``__graft_entry__.dryrun_multiprocess``) — it spawns a real 2-process
gRPC-coordinated CPU cluster on localhost and checks that a DP train step
produces identical, finite, globally-reduced results on every process.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

# Env markers set by cloud TPU pod / multi-slice runtimes; their presence
# means `jax.distributed.initialize()` can auto-detect the full layout.
_AUTO_ENV = (
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
    "JAX_COORDINATOR_ADDRESS",
)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize the JAX distributed runtime when a multi-process layout
    is configured; return whether initialization happened.

    Resolution order: explicit args > ``PSG_TPU_*`` env vars > cloud-TPU
    auto-detection markers.  With none of those present this is a no-op
    (single-process single-host — the common case on this box).
    Idempotent: a second call after successful init returns True without
    re-initializing.
    """
    import jax

    env = os.environ
    coord = coordinator_address or env.get("PSG_TPU_COORDINATOR_ADDRESS")
    nproc = (num_processes if num_processes is not None
             else env.get("PSG_TPU_NUM_PROCESSES"))
    pid = (process_id if process_id is not None
           else env.get("PSG_TPU_PROCESS_ID"))
    auto = any(env.get(k) for k in _AUTO_ENV)
    if coord is None and not auto:
        return False

    # Idempotency probe WITHOUT touching the backend: jax.process_count()
    # would itself initialize XLA, after which distributed init is illegal.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return True  # already initialized
    except Exception:
        pass

    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return True


def make_multihost_mesh(data: int = -1, model: int = 1):
    """('data', 'model') mesh over the GLOBAL device list.

    Devices are ordered (process_index, slice_index, id) so that one
    host's devices are contiguous: with ``model`` dividing the per-process
    device count, every TP group lives inside a single host/slice (ICI),
    and the 'data' axis is the only one whose collectives cross hosts
    (DCN).  Single-process, this degrades to exactly ``make_mesh``.
    """
    import jax

    from psg_tpu.parallel.mesh import make_mesh

    devices = sorted(
        jax.devices(),
        key=lambda d: (getattr(d, "process_index", 0),
                       getattr(d, "slice_index", 0) or 0, d.id),
    )
    n_local = max(1, len(devices) // max(1, jax.process_count()))
    if model > 1 and n_local % model != 0:
        raise ValueError(
            f"model={model} does not divide the {n_local} per-process "
            f"devices — a TP group would straddle DCN")
    return make_mesh(data=data, model=model, devices=devices)


# ---------------------------------------------------------------------------
# Smoke worker: a real multi-process CPU cluster on localhost.
# ---------------------------------------------------------------------------


def _smoke_worker(process_id: int, num_processes: int, port: int,
                  devices_per_process: int = 2) -> None:
    """Run one process of the simulated multi-host layout and print a
    result line the parent compares across processes.

    Exercises the full multi-host path on CPU: distributed init over
    gRPC, global ('data','model') mesh, process-local loader slicing,
    global-array assembly from local shards, and a jitted DP train step
    whose gradient reduction crosses the process boundary.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", devices_per_process)

    ok = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id)
    assert ok, "initialize_distributed declined a fully-specified layout"
    assert jax.process_count() == num_processes
    n_global = num_processes * devices_per_process
    assert len(jax.devices()) == n_global

    import numpy as np
    import jax.numpy as jnp
    import optax

    from psg_tpu.parallel import batch_sharding, shard_batch
    mesh = make_multihost_mesh(data=n_global, model=1)

    # process-local batch slice: every process holds ROWS pid*L..(pid+1)*L
    # of the global batch (the Loader's process_index/process_count slice
    # produces exactly this layout from a shared shuffle plan)
    global_batch, feat = 2 * n_global, 8
    rng = np.random.RandomState(0)
    x_global = rng.randn(global_batch, feat).astype(np.float32)
    y_global = rng.randn(global_batch, 1).astype(np.float32)
    lo = process_id * (global_batch // num_processes)
    hi = lo + global_batch // num_processes
    batch = shard_batch({"x": x_global[lo:hi], "y": y_global[lo:hi]}, mesh)
    assert batch["x"].shape == (global_batch, feat), batch["x"].shape
    assert batch["x"].sharding == batch_sharding(mesh, 2)

    params = {"w": jnp.zeros((feat, 1)), "b": jnp.zeros((1,))}
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = batch["x"] @ p["w"] + p["b"]
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, batch)
    # fully-addressable output? loss is replicated => readable everywhere
    loss_v = float(jax.device_get(loss))
    w_sum = float(jax.device_get(jnp.sum(params["w"])))
    assert np.isfinite(loss_v) and np.isfinite(w_sum)
    # the line the parent diffs across processes: identical or the DP
    # reduction broke
    print(f"MPSMOKE pid={process_id} loss={loss_v:.10f} wsum={w_sum:.10f} "
          f"procs={jax.process_count()} devices={n_global}", flush=True)


if __name__ == "__main__":
    import sys

    _smoke_worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                  int(sys.argv[4]) if len(sys.argv) > 4 else 2)
