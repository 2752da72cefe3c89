"""Legacy stage-2 trainer preset.

The reference keeps an older DiffusionTrainer (src/training/
diffusion_trainer.py) alongside the improved default: linear beta schedule
(:29), plain MSE loss (:257), per-epoch cosine LR (:242-246), and none of
the NaN machinery.  Here that's a configuration preset of the unified
DiffusionTrainer rather than a second 600-line class.
"""

from __future__ import annotations

from psg_tpu.core.config import Config
from psg_tpu.train.stage2_diffusion import DiffusionTrainer


class LegacyDiffusionTrainer(DiffusionTrainer):
    """DiffusionTrainer with the legacy trainer's choices pinned."""

    def __init__(self, cfg: Config, vae_checkpoint_path,
                 experiment_name: str = "pokemon"):
        import copy

        cfg = copy.deepcopy(cfg)
        cfg.model.beta_schedule = "linear"        # diffusion_trainer.py:29
        cfg.extra = dict(cfg.extra or {})
        cfg.extra["diffusion_loss"] = "mse"       # :257
        # per-epoch cosine anneal (:242-246) — expressed per-step over the
        # same total horizon
        cfg.optimization.scheduler = "cosine"
        # the legacy trainer's 'cosine' is CosineAnnealingLR, not OneCycle
        cfg.extra["unet_optimization"] = {
            **cfg.extra.get("unet_optimization", {}),
            "scheduler": "legacy_cosine",
        }
        super().__init__(cfg, vae_checkpoint_path, experiment_name)
