"""Quantitative text-conditioning evaluation of a trained checkpoint.

Generates one sprite per dataset caption (first N species) through the
production serving path, scores every generation against every REAL
sprite (psg_tpu.eval.metrics), and prints a JSON report whose headline is
``retrieval_at_1`` — the fraction of generations that are most similar to
the very sprite their caption describes (chance = 1/N).

Usage:
  python scripts/eval_conditioning.py [experiment_name] [n] [steps] \
      [sampler] [guidance] [out.json] [restarts] [negative]

Defaults: evidence_r3b, 8, 25, dpmpp, 0.0, docs/eval_conditioning.json.
Any ``section.key=value`` argument is passed through as a config override
(``device=cpu`` forces the CPU backend); ``seed=N`` changes the sampling
seed (default 1234) so recipes can be replicated across seeds;
``strength=S`` sets the retrieval-loo seeding strength.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    loo = "init=retrieval-loo" in sys.argv[1:]
    strength = 0.85
    seed = 1234
    for a in sys.argv[1:]:
        if a.startswith("strength="):
            strength = float(a.split("=", 1)[1])
        if a.startswith("seed="):
            seed = int(a.split("=", 1)[1])
    extra_overrides = [a for a in sys.argv[1:]
                       if "=" in a and a != "init=retrieval-loo"
                       and not a.startswith(("strength=", "seed="))]
    argv = [a for a in sys.argv[1:] if "=" not in a]
    force_cpu = "device=cpu" in extra_overrides
    name = argv[0] if len(argv) > 0 else "evidence_r3b"
    n = int(argv[1]) if len(argv) > 1 else 8
    steps = int(argv[2]) if len(argv) > 2 else 25
    sampler = argv[3] if len(argv) > 3 else "dpmpp"
    guidance = float(argv[4]) if len(argv) > 4 else 0.0
    out = Path(argv[5] if len(argv) > 5 else "docs/eval_conditioning.json")
    restarts = int(argv[6]) if len(argv) > 6 else 0
    negative = argv[7] if len(argv) > 7 else "zero"

    from psg_tpu.core.config import Config, configure_jax

    if force_cpu:
        c = Config()
        c.device = "cpu"
        configure_jax(c)

    from psg_tpu.data.dataset import PokemonDataset
    from psg_tpu.eval import conditioning_report
    from psg_tpu.serve.app import build_generator

    overrides = [
        "data.csv_path=/root/reference/data/text_description_concat.csv",
        "data.image_dir=/root/reference/data/small_images",
    ] + extra_overrides
    gen = build_generator(None, name, overrides, sampler=sampler,
                          guidance=guidance, negative=negative)

    ds = PokemonDataset("/root/reference/data/text_description_concat.csv",
                        "/root/reference/data/small_images",
                        image_size=gen.cfg.data.image_size)
    captions = ds.full_descriptions[:n]
    names = [r["english_name"] for r in ds.rows[:n]]
    real = [ds.image_float(i) for i in range(n)]

    if loo:
        # leave-one-out retrieval seeding: sprite i's generation is seeded
        # from the nearest OTHER sprite — if the prompt dominates, the
        # output should still match sprite i best
        from psg_tpu.utils.images import pil_to_array

        generated = []
        for i, cap in enumerate(captions):
            im = gen.generate_from_text_retrieval(
                cap, num_inference_steps=steps, seed=seed + i,
                restarts=restarts, exclude=i, strength=strength)
            generated.append(pil_to_array(im, gen.cfg.data.image_size))
    else:
        imgs = gen.generate_batch(captions, num_inference_steps=steps,
                                  seed=seed, restarts=restarts)
        generated = [np.asarray(im, np.float32) for im in imgs]

    report = conditioning_report(generated, real, names=names)
    report["checkpoint"] = name
    report["sampler"] = f"{sampler}@{steps}" + (
        f"+restart{restarts}" if restarts else "")
    report["guidance"] = guidance
    report["negative"] = negative
    report["init"] = (f"retrieval-loo@{strength}" if loo else "prior")
    report["seed"] = seed
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != "per_sprite"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
