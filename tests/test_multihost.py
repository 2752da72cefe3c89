"""Multi-host entry point (parallel/multihost.py, SURVEY.md §2.6).

The real thing needs N hosts; these tests cover (a) the pure-host logic
in-process and (b) a REAL 2-process gRPC-coordinated CPU cluster on
localhost via spawned workers — the simulated multi-process layout
VERDICT r4 #5 asks for.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
CSV = Path("/root/reference/data/text_description_concat.csv")


def test_initialize_distributed_noop_without_config(monkeypatch):
    """No coordinator config anywhere => no-op returning False (the
    single-process default must never pay for the distributed runtime)."""
    from psg_tpu.parallel import initialize_distributed

    for k in ("PSG_TPU_COORDINATOR_ADDRESS", "PSG_TPU_NUM_PROCESSES",
              "PSG_TPU_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID",
              "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False


def test_make_multihost_mesh_single_process():
    """Single-process it must degrade to exactly make_mesh's layout."""
    import jax

    from psg_tpu.parallel import make_mesh, make_multihost_mesh

    a = make_multihost_mesh(data=len(jax.devices()), model=1)
    b = make_mesh(data=len(jax.devices()), model=1)
    assert dict(a.shape) == dict(b.shape)
    assert [d.id for d in a.devices.flat] == [d.id for d in b.devices.flat]
    # TP group that would straddle hosts is rejected
    with pytest.raises(ValueError):
        make_multihost_mesh(data=1, model=len(jax.devices()) * 2)


@pytest.mark.skipif(not CSV.exists(), reason="reference dataset not mounted")
def test_loader_process_slices_partition_global_batch():
    """Every process's Loader must yield the SAME global plan sliced into
    disjoint contiguous row blocks that concatenate to the single-process
    batch (text/ids exactly; images too with augmentation off)."""
    from psg_tpu.core.config import Config
    from psg_tpu.data.dataset import PokemonDataset, split_indices
    from psg_tpu.data.loader import Loader

    cfg = Config()
    cfg.data.csv_path = str(CSV)
    cfg.data.image_dir = "/root/reference/data/small_images"
    ds = PokemonDataset(cfg.data.csv_path, cfg.data.image_dir, image_size=64)
    tr, _, _ = split_indices(len(ds), 0.15, 0.05, seed=42)
    kw = dict(train=True, seed=7, augment=False, num_workers=1)

    whole = list(Loader(ds, tr, 8, **kw))
    parts = [list(Loader(ds, tr, 8, process_index=i, process_count=2, **kw))
             for i in range(2)]
    assert len(whole) == len(parts[0]) == len(parts[1])
    for b_all, b0, b1 in zip(whole, parts[0], parts[1]):
        assert b0["image"].shape[0] == b1["image"].shape[0] == 4
        np.testing.assert_array_equal(
            b_all["national_number"],
            np.concatenate([b0["national_number"], b1["national_number"]]))
        np.testing.assert_array_equal(
            b_all["image"], np.concatenate([b0["image"], b1["image"]]))

    with pytest.raises(ValueError):
        Loader(ds, tr, 9, process_count=2, **kw)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster_dp_step():
    """Spawn a REAL 2-process x 2-device CPU cluster (gRPC coordinator on
    localhost) and run a jitted DP train step in each: both processes must
    report identical, finite, globally-reduced loss/params — the
    simulated multi-host layout that closes SURVEY §2.6's comm-backend
    row without N hosts."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "psg_tpu.parallel.multihost",
             str(i), "2", str(port), "2"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    lines = [next(ln for ln in o.splitlines() if ln.startswith("MPSMOKE"))
             for o in outs]
    # strip the per-process pid field; everything else must match exactly
    payloads = [" ".join(t for t in ln.split() if not t.startswith("pid="))
                for ln in lines]
    assert payloads[0] == payloads[1], f"divergent workers: {lines}"
    assert "procs=2 devices=4" in payloads[0]
