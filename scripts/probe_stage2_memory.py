"""AOT memory probe for the stage-2 fast path on the real TPU.

The r3b stage-2 launch OOM'd at execution (RESOURCE_EXHAUSTED fetching the
first epoch's metrics): params 2.62G + Adam mu/nu 5.24G + EMA 2.62G + grads
+ activations exceeded the chip.  This probe AOT-compiles the exact jitted
scanned-epoch function the trainer runs (stage2_diffusion.train_epoch_fast)
and prints compiled.memory_analysis() per batch size WITHOUT executing, so
the relaunch batch/mu_dtype choice is measured, not guessed.

Usage: python scripts/probe_stage2_memory.py [batch ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from psg_tpu.core.config import load_config
from psg_tpu.train.stage2_diffusion import DiffusionTrainer


def main() -> int:
    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    stats = jax.devices()[0].memory_stats() or {}
    hbm = stats.get("bytes_limit", 0)
    print(f"device={jax.devices()[0].device_kind} hbm_limit={hbm/2**30:.2f}GiB")
    for bs in batches:
        cfg = load_config(
            "config/r3_evidence.yaml",
            overrides=[f"data.batch_size={bs}",
                       "training.sample_every=100000"])
        cfg.experiment_dir = "/tmp/memprobe"
        t = DiffusionTrainer(
            cfg, "experiments/evidence_r3b_vae/checkpoints/vae_best_model.ckpt",
            experiment_name="memprobe")
        t._setup_fast_data()
        lowered = jax.jit(t._fast_epoch_impl, donate_argnums=(0,)).lower(
            t.state, t.frozen, t._train_data)
        ma = lowered.compile().memory_analysis()
        gb = 2 ** 30
        print(f"batch={bs}: args={ma.argument_size_in_bytes/gb:.2f}G "
              f"out={ma.output_size_in_bytes/gb:.2f}G "
              f"temp={ma.temp_size_in_bytes/gb:.2f}G "
              f"gen={ma.generated_code_size_in_bytes/2**20:.0f}M "
              f"alias={ma.alias_size_in_bytes/gb:.2f}G "
              f"peak~={(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes)/gb:.2f}G")
        del t, lowered
    return 0


if __name__ == "__main__":
    sys.exit(main())
