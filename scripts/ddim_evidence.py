"""DDIM sampling evidence from the trained stage-2 checkpoint.

Round-3 capability evidence (VERDICT r2 #1/#5): loads the best stage-1 VAE
+ stage-2 EMA UNet checkpoints and renders a captioned grid of
text-conditioned sprites with the DDIM sampler (the framework's quality
sampler — the reference's strided samplers provably stay at the prior,
tests/test_diffusion.py::test_reference_strided_samplers_stay_at_prior_variance).

Usage:
  python scripts/ddim_evidence.py [experiment_name] [steps] [out.png] \
      [guidance] [sampler] [restarts] [dataset] [negative]

Defaults: evidence_r3b, 200 steps, docs/samples/ddim_sprites_r3.png, 0.0,
ddim ('dpmpp' = DPM-Solver++(2M), ~10-25 steps suffice).  Runs on whatever
backend JAX picks (TPU: ~2-4 min incl. compile).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psg_tpu.serve.app import build_generator
from psg_tpu.utils.images import save_image_grid

PROMPTS = [
    "A small green creature with a bulb on its back",
    "An orange lizard with a flame on its tail",
    "A blue turtle with a hard shell",
    "A yellow electric mouse with red cheeks",
    "A purple poison snake with fierce eyes",
    "A large gray rock snake",
    "A pink round creature with a curl on its forehead",
    "A brown bird with sharp talons and large wings",
]


def dataset_prompts(n: int = 8):
    """First n training captions (name + description), so the grid is
    directly comparable to the real sprites the captions describe."""
    from psg_tpu.data.dataset import full_description, read_description_csv

    rows = read_description_csv(
        "/root/reference/data/text_description_concat.csv")
    return [full_description(r["english_name"], r["description"])
            for r in rows[:n]]


def main() -> int:
    # any k=v argument is a config override (device=cpu forces CPU)
    extra_overrides = [a for a in sys.argv[1:] if "=" in a]
    sys.argv = [sys.argv[0]] + [a for a in sys.argv[1:] if "=" not in a]
    name = sys.argv[1] if len(sys.argv) > 1 else "evidence_r3b"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    out = Path(sys.argv[3] if len(sys.argv) > 3 else
               "docs/samples/ddim_sprites_r3.png")
    guidance = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    sampler = sys.argv[5] if len(sys.argv) > 5 else "ddim"
    restarts = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    prompts = (dataset_prompts() if len(sys.argv) > 7
               and sys.argv[7] == "dataset" else PROMPTS)
    negative = sys.argv[8] if len(sys.argv) > 8 else "zero"
    init = sys.argv[9] if len(sys.argv) > 9 else "prior"

    overrides = [
        "data.csv_path=/root/reference/data/text_description_concat.csv",
        "data.image_dir=/root/reference/data/small_images",
    ] + extra_overrides
    gen = build_generator(None, name, overrides,
                          schedule="auto", sampler=sampler,
                          guidance=guidance, negative=negative)
    imgs = gen.generate_batch(prompts, num_inference_steps=steps, seed=7,
                              restarts=restarts, init=init)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_image_grid(imgs, out, captions=prompts)
    print(f"wrote {out} ({len(prompts)} prompts, {sampler} steps={steps}, "
          f"guidance={guidance}, restarts={restarts})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
