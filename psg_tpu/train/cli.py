"""3-stage training orchestration CLI.

Equivalent of the reference's ``train_3stage.py`` with the same flag
surface (train_3stage.py:28-54): ``--config --stage {1,2,3,all}
--vae-checkpoint --diffusion-checkpoint --experiment-name --resume
--data-stats`` plus ``--override section.key=value`` (typed-config extra).
``--use-diffusers`` routes stage 2 to ``SDDiffusionTrainer`` (the SD-1.5
UNet wrapper, psg_tpu/train/stage2_sd.py), matching the reference's
``train_3stage.py --use-diffusers`` -> DiffusersTrainer dispatch; the
custom UNet remains the default stage-2 path.

Stage hand-off follows the reference's path convention
(train_3stage.py:98,144,158-167):
``{experiment_dir}/{name}_vae/checkpoints/vae_best_model.ckpt`` feeds
stage 2, etc.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from psg_tpu.core.config import configure_jax, load_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="3-stage Pokemon sprite generator training (TPU)")
    p.add_argument("--config", type=str, default="config/train_config.yaml")
    # stage 0 = optional MLM pretraining of the text tower (not part of
    # 'all', which keeps the reference's 3-stage contract); its checkpoint
    # feeds stage 1 via extra.text_init
    p.add_argument("--stage", type=str, default="all",
                   choices=["0", "1", "2", "3", "all"])
    p.add_argument("--use-diffusers", action="store_true",
                   help="stage 2 uses the SD-1.5-family UNet wrapper "
                        "(pretrained weights via PSG_TPU_SD_UNET if available)")
    p.add_argument("--vae-checkpoint", type=str, default=None)
    p.add_argument("--diffusion-checkpoint", type=str, default=None)
    p.add_argument("--experiment-name", type=str, default="pokemon")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume the active stage from")
    p.add_argument("--data-stats", action="store_true",
                   help="print dataset statistics and exit")
    p.add_argument("--override", action="append", default=[],
                   help="config override, e.g. training.vae_epochs=3")
    return p


def stage_ckpt(cfg, name: str, stage: str) -> Path:
    return (Path(cfg.experiment_dir) / f"{name}_{stage}" / "checkpoints"
            / f"{stage}_best_model.ckpt")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = load_config(args.config if Path(args.config).exists() else None,
                      overrides=args.override)
    configure_jax(cfg)

    if args.data_stats:
        from psg_tpu.data import PokemonDataset, dataset_statistics

        ds = PokemonDataset(cfg.data.csv_path, cfg.data.image_dir,
                            image_size=cfg.data.image_size,
                            background_color=cfg.data.background_color)
        stats = dataset_statistics(ds)
        for k, v in stats.items():
            print(f"{k}: {v}")
        return 0

    name = args.experiment_name
    run_all = args.stage == "all"

    vae_ckpt = args.vae_checkpoint or str(stage_ckpt(cfg, name, "vae"))
    diff_ckpt = args.diffusion_checkpoint or str(stage_ckpt(cfg, name, "diffusion"))

    if args.stage == "0":
        from psg_tpu.train.stage0_mlm import MLMPretrainer

        t = MLMPretrainer(cfg, experiment_name=name)
        best = t.train()
        print(f"stage 0 complete: {best}")
        print(f"warm-start stage 1 with --override extra.text_init={best}")
        return 0

    if run_all or args.stage == "1":
        from psg_tpu.train.stage1_vae import VAETrainer

        t = VAETrainer(cfg, experiment_name=name)
        if args.resume and args.stage == "1":
            t.load_checkpoint(args.resume)
        best = t.train()
        vae_ckpt = str(best)
        print(f"stage 1 complete: {best}")

    if run_all or args.stage == "2":
        if args.use_diffusers:
            # SD-1.5-family UNet + trainable text encoder
            # (reference: train_3stage.py --use-diffusers -> DiffusersTrainer)
            from psg_tpu.train.stage2_sd import SDDiffusionTrainer as Trainer
        else:
            from psg_tpu.train.stage2_diffusion import DiffusionTrainer as Trainer

        t = Trainer(cfg, vae_checkpoint_path=vae_ckpt, experiment_name=name)
        if args.resume and args.stage == "2":
            t.load_checkpoint(args.resume)
        best = t.train()
        diff_ckpt = str(best)
        print(f"stage 2 complete: {best}")

    if run_all or args.stage == "3":
        from psg_tpu.train.stage3_final import FinalTrainer

        t = FinalTrainer(cfg, vae_checkpoint_path=vae_ckpt,
                         diffusion_checkpoint_path=diff_ckpt,
                         experiment_name=name)
        if args.resume and args.stage == "3":
            t.load_checkpoint(args.resume)
        best = t.train()
        print(f"stage 3 complete: {best}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
