"""Checkpoint resolution: local paths first, HF Hub when online.

Covers gradio_app.py:34-158 (downloads from GabrieleConte/PokemonVAE /
GabrieleConte/PokemonU-Net with local fallbacks).  This framework's
checkpoints are .ckpt msgpack states; zero-egress environments resolve
locally only.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

log = logging.getLogger(__name__)

VAE_REPO = "GabrieleConte/PokemonVAE"
UNET_REPO = "GabrieleConte/PokemonU-Net"


def _local_candidates(cfg, experiment_name: str, stage: str):
    exp = Path(cfg.experiment_dir)
    named = [
        exp / f"{experiment_name}_{stage}" / "checkpoints" / f"{stage}_best_model.ckpt",
        exp / f"{stage}_best_model.ckpt",
        Path("weights") / f"{stage}_best_model.ckpt",
    ]
    # fallback: newest trained run of this stage under experiment_dir,
    # so the default serve CLI finds the freshest evidence checkpoints
    # without the caller knowing the run name
    globbed = sorted((p for p in exp.glob(
        f"*_{stage}/checkpoints/{stage}_best_model.ckpt") if p.exists()),
        key=lambda p: p.stat().st_mtime, reverse=True)
    return named + globbed


def _hub_reachable(timeout: float = 2.0) -> bool:
    """Quick DNS probe — zero-egress environments would otherwise burn
    minutes in huggingface_hub's internal retry/backoff loops."""
    import os
    import socket

    if os.environ.get("HF_HUB_OFFLINE") == "1":
        return False
    try:
        socket.setdefaulttimeout(timeout)
        socket.getaddrinfo("huggingface.co", 443)
        return True
    except OSError:
        return False
    finally:
        socket.setdefaulttimeout(None)


def _try_hub(repo: str, filename: str) -> Optional[str]:
    if not _hub_reachable():
        log.info("HF Hub unreachable (offline) — skipping %s/%s", repo, filename)
        return None
    try:
        from huggingface_hub import hf_hub_download

        return hf_hub_download(repo_id=repo, filename=filename)
    except Exception as e:  # missing dependency / no repo / auth
        log.info("HF Hub unavailable for %s/%s: %s", repo, filename, e)
        return None


def resolve_checkpoints(cfg, experiment_name: str = "pokemon",
                        allow_hub: bool = True) -> Tuple[Optional[str], Optional[str]]:
    """-> (vae_ckpt_path or None, diffusion_ckpt_path or None).

    A stage-3 ``final`` checkpoint (the {vae, text, unet} bundle written
    by FinalTrainer — the reference serves exactly this model via
    FinalPokemonGenerator, final_trainer.py:165-213) takes precedence:
    both slots then point at the same file and the generator loads all
    three components from it."""
    final = next((p for p in _local_candidates(cfg, experiment_name, "final")
                  if p.exists()), None)
    if final is not None:
        log.info("serving the stage-3 final checkpoint %s", final)
        return str(final), str(final)
    vae = next((p for p in _local_candidates(cfg, experiment_name, "vae")
                if p.exists()), None)
    diff = next((p for p in _local_candidates(cfg, experiment_name, "diffusion")
                 if p.exists()), None)
    if vae is None and allow_hub:
        vae = _try_hub(VAE_REPO, "vae_best_model.ckpt")
    if diff is None and allow_hub:
        diff = _try_hub(UNET_REPO, "diffusion_best_model.ckpt")
    return (str(vae) if vae else None, str(diff) if diff else None)
