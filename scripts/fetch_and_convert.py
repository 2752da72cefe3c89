"""Pretrained-weight onboarding: HF/torch sources -> psg_tpu .ckpt files.

One command turns pretrained towers into framework checkpoints at their
documented drop locations (reference deps: BERT text_encoder.py:30-40,
VGG16 losses.py:33-34, CLIP clip_loss.py:22-23, SD-1.5 diffusers_unet.py:59-63):

    python scripts/fetch_and_convert.py all            # via HF cache/hub
    python scripts/fetch_and_convert.py bert --src /path/to/bert_dir
    python scripts/fetch_and_convert.py vgg16 --src vgg16-weights.pth

Outputs (override dir with --out; trainers resolve via env vars):

    weights/bert_base.ckpt  + bert_vocab.txt   ($PSG_TPU_BERT)
    weights/vgg16_features.ckpt                ($PSG_TPU_VGG16)
    weights/clip_vit_b32.ckpt + clip_vocab.json + clip_merges.txt
                                               ($PSG_TPU_CLIP / _CLIP_BPE)
    weights/sd15_unet.ckpt                     ($PSG_TPU_SD_UNET)

Sources, tried in order: --src (a state-dict .pth/.bin/.safetensors, or a
HF snapshot directory), then the HF hub name (uses the local cache; needs
egress only on a cold cache).  This machine has zero egress — on it, drop
the files and pass --src.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

HF_NAMES = {
    "bert": "bert-base-uncased",
    "clip": "openai/clip-vit-base-patch32",
    "sd_unet": "runwayml/stable-diffusion-v1-5",
}


def _hf(cls, name, **kw):
    """Cache-first HF load: local_files_only avoids network retries when
    the snapshot is already cached; falls back to a networked fetch."""
    try:
        return cls.from_pretrained(name, local_files_only=True, **kw)
    except Exception:
        return cls.from_pretrained(name, **kw)


def _load_sd_any(path: Path) -> dict:
    """state dict from .pth/.bin (torch) or .safetensors -> numpy arrays."""
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    from psg_tpu.models.convert import load_torch_state_dict

    return load_torch_state_dict(str(path))


def _dir_state_dict(d: Path) -> dict:
    for name in ("model.safetensors", "pytorch_model.bin",
                 "diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin"):
        if (d / name).exists():
            return _load_sd_any(d / name)
    raise FileNotFoundError(f"no weight file found in {d}")


def _save(params, out_path: Path, source: str, extra=None) -> None:
    from psg_tpu.core.checkpoint import save_state

    n = sum(int(np.prod(p.shape)) for p in
            __import__("jax").tree_util.tree_leaves(params))
    meta = {"source": source, "params": n, "time": time.time()}
    if extra:
        meta.update(extra)
    save_state(out_path, params, meta)
    print(f"wrote {out_path}  ({n:,} params, source={source})")


def fetch_bert(out: Path, src: str | None) -> None:
    from psg_tpu.models.convert import convert_bert

    if src and Path(src).is_file():
        sd = _load_sd_any(Path(src))
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        params = convert_bert(sd, num_layers=12, prefix=prefix)
        _save(params, out / "bert_base.ckpt", str(src))
        print("NOTE: also drop the matching WordPiece vocab at "
              f"{out/'bert_vocab.txt'}")
        return
    if src and Path(src).is_dir():
        sd = _dir_state_dict(Path(src))
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        params = convert_bert(sd, num_layers=12, prefix=prefix)
        _save(params, out / "bert_base.ckpt", str(src))
        for v in (Path(src) / "vocab.txt",):
            if v.exists():
                shutil.copy(v, out / "bert_vocab.txt")
                print(f"wrote {out/'bert_vocab.txt'}")
        return
    # HF cache / hub
    from transformers import BertModel, BertTokenizerFast

    name = src or HF_NAMES["bert"]
    model = _hf(BertModel, name)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_bert(sd, num_layers=model.config.num_hidden_layers)
    _save(params, out / "bert_base.ckpt", name,
          {"hidden": model.config.hidden_size,
           "layers": model.config.num_hidden_layers,
           "vocab_size": model.config.vocab_size})
    tok = _hf(BertTokenizerFast, name)
    tok.save_vocabulary(str(out))
    (out / "vocab.txt").rename(out / "bert_vocab.txt")
    print(f"wrote {out/'bert_vocab.txt'}")


def fetch_vgg16(out: Path, src: str | None) -> None:
    from psg_tpu.models.convert import convert_vgg16

    if src:
        sd = _load_sd_any(Path(src))
        _save(convert_vgg16(sd, prefix="features." if any(
            k.startswith("features.") for k in sd) else ""),
            out / "vgg16_features.ckpt", str(src))
        return
    from torchvision.models import VGG16_Weights, vgg16

    model = vgg16(weights=VGG16_Weights.IMAGENET1K_V1)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    _save(convert_vgg16(sd), out / "vgg16_features.ckpt",
          "torchvision vgg16 IMAGENET1K_V1")


def fetch_clip(out: Path, src: str | None) -> None:
    from psg_tpu.models.convert import convert_clip

    if src and Path(src).is_dir():
        d = Path(src)
        sd = _dir_state_dict(d)
        _save(convert_clip(sd), out / "clip_vit_b32.ckpt", str(src))
        for a, b in (("vocab.json", "clip_vocab.json"),
                     ("merges.txt", "clip_merges.txt")):
            if (d / a).exists():
                shutil.copy(d / a, out / b)
                print(f"wrote {out/b}")
        return
    if src and Path(src).is_file():
        _save(convert_clip(_load_sd_any(Path(src))),
              out / "clip_vit_b32.ckpt", str(src))
        print("NOTE: also drop clip_vocab.json + clip_merges.txt (the BPE "
              "artifacts) — converted CLIP weights are unusable without them")
        return
    from transformers import CLIPModel, CLIPTokenizer

    name = src or HF_NAMES["clip"]
    model = _hf(CLIPModel, name)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    _save(convert_clip(sd,
                       vision_layers=model.config.vision_config.num_hidden_layers,
                       text_layers=model.config.text_config.num_hidden_layers),
          out / "clip_vit_b32.ckpt", name)
    tok = _hf(CLIPTokenizer, name)
    files = tok.save_vocabulary(str(out))
    for f in files:
        f = Path(f)
        target = {"vocab.json": "clip_vocab.json",
                  "merges.txt": "clip_merges.txt"}.get(f.name)
        if target:
            f.rename(out / target)
            print(f"wrote {out/target}")


def fetch_sd_unet(out: Path, src: str | None) -> None:
    from psg_tpu.models.convert import convert_sd_unet

    if src:
        p = Path(src)
        sd = _dir_state_dict(p) if p.is_dir() else _load_sd_any(p)
        _save(convert_sd_unet(sd), out / "sd15_unet.ckpt", str(src))
        return
    from diffusers import UNet2DConditionModel  # not in this image — --src path

    model = _hf(UNet2DConditionModel, HF_NAMES["sd_unet"], subfolder="unet")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    _save(convert_sd_unet(sd), out / "sd15_unet.ckpt", HF_NAMES["sd_unet"])


TOWERS = {"bert": fetch_bert, "vgg16": fetch_vgg16, "clip": fetch_clip,
          "sd_unet": fetch_sd_unet}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("towers", nargs="+",
                    choices=[*TOWERS, "all"], help="which towers to convert")
    ap.add_argument("--src", default=None,
                    help="local state-dict file / HF snapshot dir / HF name")
    ap.add_argument("--out", default="weights", help="output directory")
    args = ap.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    towers = list(TOWERS) if "all" in args.towers else args.towers
    if args.src and len(towers) > 1:
        ap.error("--src applies to a single tower")

    failures = {}
    for t in towers:
        try:
            TOWERS[t](out, args.src)
        except Exception as e:  # noqa: BLE001 — report all, convert the rest
            failures[t] = f"{type(e).__name__}: {e}"
    if failures:
        print("\nFAILED (likely: no cache and no egress — pass --src):")
        for t, msg in failures.items():
            print(f"  {t}: {msg}")
        return 1
    print("\nall requested towers converted; trainers will pick them up "
          "automatically (see module docstring for env-var overrides)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
