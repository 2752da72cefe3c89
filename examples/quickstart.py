"""Small-budget end-to-end run (the reference's Kaggle-notebook recipe).

The reference ships pokemon_sprite_generator_kaggle.ipynb running the full
3-stage pipeline at 5/5/3 epochs, batch 8 (SURVEY.md §6).  This script is
the same recipe against this framework — a real-but-cheap full run that
produces a checkpoint chain and sample grids.

Usage:
    python examples/quickstart.py [--experiment-name quickstart]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psg_tpu.train.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main([
        "--config", "config/train_config.yaml",
        "--stage", "all",
        "--experiment-name", "quickstart",
        "--override", "training.vae_epochs=5",
        "--override", "training.diffusion_epochs=5",
        "--override", "training.final_epochs=3",
        "--override", "data.batch_size=8",
        "--override", "training.sample_every=1",
        *sys.argv[1:],
    ]))
