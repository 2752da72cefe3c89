"""Import the reference's trained torch checkpoints for psg_tpu serving.

The reference serves checkpoints its trainers wrote (and its gradio app
downloads from HF Hub, gradio_app.py:34-158):

- stage-1 ``vae_best_model.pth``  — {'vae_state_dict', 'text_encoder_state_dict', ...}
  (src/training/vae_trainer.py:515-533)
- stage-2 ``diffusion_best_model.pth`` — {'unet_state_dict', ...}
  (src/training/improved_diffusion_trainer.py:620-636)
- stage-3 ``final_best_model.pth`` — {'model_state_dict': FinalPokemonGenerator}
  (src/training/final_trainer.py:644-662; submodules vae_encoder/vae_decoder/
  unet/text_encoder)

This script converts any of them to psg_tpu ``.ckpt`` files laid out where
``psg_tpu.serve.hub.resolve_checkpoints`` finds them, with the schedule
sidecar the serving CLI's ``--schedule auto`` reads.  A user switching from
the reference keeps their trained models:

  python scripts/import_reference_checkpoint.py --experiment-name imported \
      --vae vae_best_model.pth --diffusion diffusion_best_model.pth \
      [--final final_best_model.pth] [--schedule cosine] [--vocab vocab.txt]

``--schedule`` must be the schedule the UNet was TRAINED under: ``cosine``
for the reference's default ImprovedDiffusionTrainer
(improved_diffusion_trainer.py:41-48), ``linear`` for the legacy trainer.
``--vocab`` is the WordPiece vocab of the BERT the text encoder was
fine-tuned from (bert-base's vocab.txt for the reference default); it is
copied into the experiment dir so serving tokenizes identically.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _container(path):
    """torch.load the reference checkpoint container (tensors only)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older containers carry scheduler lambdas etc.; tensors are all
        # we read out of them
        return torch.load(path, map_location="cpu", weights_only=False)


def _np_sd(sd):
    return {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
                else np.asarray(v)) for k, v in sd.items()}


def _sub(container, *keys):
    """First present key, else the container itself (gradio_app.py:256-277
    load fallbacks)."""
    for k in keys:
        if isinstance(container, dict) and k in container:
            return container[k]
    return container


def _strip_prefix(sd, mapping):
    """Remap key prefixes: {'vae_encoder.': 'encoder.', ...}; drops keys
    matching no prefix."""
    out = {}
    for k, v in sd.items():
        for src, dst in mapping.items():
            if k.startswith(src):
                out[dst + k[len(src):]] = v
                break
    return out


def _text_encoder_dims(sd):
    """(num_layers, hidden, text_dim) derived from the state dict itself."""
    layers = {int(k.split(".")[3]) for k in sd
              if k.startswith("bert.encoder.layer.")}
    hidden = sd["bert.embeddings.word_embeddings.weight"].shape[1]
    text_dim = (sd["projection.weight"].shape[0]
                if "projection.weight" in sd else hidden)
    return max(layers) + 1, int(hidden), int(text_dim)


def _save(path: Path, params, schedule: str, src: str, stage: str) -> None:
    from psg_tpu.core.checkpoint import save_state

    meta = {
        "stage": stage,
        "step": 0,
        "imported_from": str(src),
        "config": {"model": {"beta_schedule": schedule}},
    }
    save_state(path, {"params": params}, meta)
    print(f"wrote {path}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--vae", help="reference vae_best_model.pth")
    ap.add_argument("--diffusion", help="reference diffusion_best_model.pth")
    ap.add_argument("--final", help="reference final_best_model.pth")
    ap.add_argument("--experiment-name", default="imported")
    ap.add_argument("--experiment-dir", default="experiments")
    ap.add_argument("--schedule", default="cosine",
                    choices=["cosine", "linear"],
                    help="beta schedule the UNet was trained under")
    ap.add_argument("--vocab", help="WordPiece vocab.txt of the source BERT")
    args = ap.parse_args(argv)
    if not (args.vae or args.diffusion or args.final):
        ap.error("need at least one of --vae / --diffusion / --final")

    from psg_tpu.models.convert import (
        convert_reference_text_encoder,
        convert_reference_unet,
        convert_reference_vae,
    )

    exp = Path(args.experiment_dir)

    def stage_ckpt(stage: str) -> Path:
        d = exp / f"{args.experiment_name}_{stage}" / "checkpoints"
        d.mkdir(parents=True, exist_ok=True)
        return d / f"{stage}_best_model.ckpt"

    if args.vae:
        c = _container(args.vae)
        vae_sd = _np_sd(_sub(c, "vae_state_dict", "model_state_dict"))
        params = {"vae": convert_reference_vae(vae_sd)}
        if isinstance(c, dict) and "text_encoder_state_dict" in c:
            tsd = _np_sd(c["text_encoder_state_dict"])
            params["text"] = convert_reference_text_encoder(
                tsd, *_text_encoder_dims(tsd))
        _save(stage_ckpt("vae"), params, args.schedule, args.vae, "vae")

    if args.diffusion:
        c = _container(args.diffusion)
        unet_sd = _np_sd(_sub(c, "unet_state_dict", "model_state_dict"))
        _save(stage_ckpt("diffusion"), convert_reference_unet(unet_sd),
              args.schedule, args.diffusion, "diffusion")

    if args.final:
        c = _container(args.final)
        gen_sd = _np_sd(_sub(c, "model_state_dict"))
        vae_sd = _strip_prefix(gen_sd, {"vae_encoder.": "encoder.",
                                        "vae_decoder.": "decoder."})
        tsd = _strip_prefix(gen_sd, {"text_encoder.": ""})
        _save(stage_ckpt("final"),
              {"vae": convert_reference_vae(vae_sd),
               "text": convert_reference_text_encoder(
                   tsd, *_text_encoder_dims(tsd)),
               "unet": convert_reference_unet(
                   _strip_prefix(gen_sd, {"unet.": ""}))},
              args.schedule, args.final, "final")

    if args.vocab:
        dst = exp / "vocab.txt"
        shutil.copyfile(args.vocab, dst)
        print(f"wrote {dst}")

    print(json.dumps({
        "experiment_name": args.experiment_name,
        "serve": (f"python -m psg_tpu.serve.app --prompt '...' "
                  f"--experiment-name {args.experiment_name} "
                  f"--override experiment_dir={exp}"),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
