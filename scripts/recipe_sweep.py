"""A/B sweep of inference-time CFG shaping recipes on ONE trained checkpoint.

Sweeps (guidance_scale, guidance_rescale, guidance interval, steps,
restarts) combinations through the production serving path and scores
each with the same retrieval@1 metric as scripts/eval_conditioning.py,
so recipe decisions (SERVING.md, serve defaults, the stamped sidecar
recipe) are measured, not eyeballed.

The expensive state — the 1.3 GB checkpoint load, bf16 weight cast, and
device placement — is paid ONCE: the knobs are baked into the jitted
sampler at trace time, and ``PokemonGenerator.set_guidance`` owns the
mutate-then-retrace invariant.  Each recipe therefore costs one sampler
compile + one n-caption batch.

Usage:
  python scripts/recipe_sweep.py [experiment] [n] [out.json] \
      [recipe ...] [section.key=value ...]

A recipe is a comma list, e.g. ``g=2.0,resc=0.7,lo=0.1,hi=0.8,steps=10,restarts=1``
(unset fields default to g=2.0 resc=0 lo=0 hi=1 steps=10 restarts=1).
With no recipes given, a default 6-point sweep runs.  ``negative=mean``
/ ``seed=N`` apply to the whole sweep.  Results print as one JSON line
per recipe plus a final ranked table; the full report goes to out.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DEFAULT_SWEEP = [
    "g=2.0",                              # chain baseline
    "g=2.0,resc=0.7",                     # CFG-rescale (Lin et al. 2023)
    "g=3.5,resc=0.7",                     # stronger guidance, rescued variance
    "g=2.0,lo=0.1,hi=0.8",                # guidance interval (Kynkäänniemi 2024)
    "g=3.5,resc=0.7,lo=0.1,hi=0.8",       # both
    "g=1.0",                              # weak-guidance control
]


def parse_recipe(s: str) -> dict:
    r = {"g": 2.0, "resc": 0.0, "lo": 0.0, "hi": 1.0, "steps": 10,
         "restarts": 1}
    for part in s.split(","):
        k, v = part.split("=", 1)
        if k not in r:
            raise SystemExit(f"unknown recipe field {k!r} in {s!r}")
        r[k] = int(v) if k in ("steps", "restarts") else float(v)
    return r


def main() -> int:
    args = sys.argv[1:]
    recipe_keys = {"g", "resc", "lo", "hi", "steps", "restarts"}
    seed, negative = 1234, "mean"
    recipes_raw, overrides, pos = [], [], []
    for a in args:
        if a.startswith("seed="):
            seed = int(a.split("=", 1)[1])
        elif a.startswith("negative="):
            negative = a.split("=", 1)[1]
        elif "=" in a and a.split("=", 1)[0].split(",")[0] in recipe_keys:
            recipes_raw.append(a)
        elif "=" in a:
            overrides.append(a)  # config override (section.key=value, device=…)
        else:
            pos.append(a)
    name = pos[0] if len(pos) > 0 else "evidence_r4d"
    n = int(pos[1]) if len(pos) > 1 else 16
    out = Path(pos[2] if len(pos) > 2 else "docs/recipe_sweep.json")
    recipes = [parse_recipe(r) for r in (recipes_raw or DEFAULT_SWEEP)]

    from psg_tpu.data.dataset import PokemonDataset
    from psg_tpu.eval import conditioning_report
    from psg_tpu.serve.app import build_generator

    gen = build_generator(None, name, [
        "data.csv_path=/root/reference/data/text_description_concat.csv",
        "data.image_dir=/root/reference/data/small_images",
    ] + overrides, sampler="dpmpp", guidance=recipes[0]["g"],
        negative=negative)

    ds = PokemonDataset(gen.cfg.data.csv_path, gen.cfg.data.image_dir,
                        image_size=gen.cfg.data.image_size)
    captions = ds.full_descriptions[:n]
    names = [r["english_name"] for r in ds.rows[:n]]
    real = [ds.image_float(i) for i in range(n)]

    rows = []
    for r in recipes:
        # the knobs are baked into the compiled chain; set_guidance owns
        # the mutate-then-retrace invariant (review r4: reaching into
        # gen._generate from outside the class left the invariant here)
        gen.set_guidance(scale=r["g"], rescale=r["resc"],
                         interval_lo=r["lo"], interval_hi=r["hi"])
        t0 = time.time()
        imgs = gen.generate_batch(captions, num_inference_steps=r["steps"],
                                  seed=seed, restarts=r["restarts"])
        generated = [np.asarray(im, np.float32) for im in imgs]
        rep = conditioning_report(generated, real, names=names)
        row = {"recipe": r, "retrieval_at_1": rep["retrieval_at_1"],
               "margin": rep.get("margin"),
               "matched_mean": rep["matched_mean"],
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        # save each recipe's grid for visual comparison
        from psg_tpu.utils.images import save_image_grid

        tag = "_".join(f"{k}{v}" for k, v in r.items())
        grid = out.parent / f"{out.stem}_{tag}.png"
        out.parent.mkdir(parents=True, exist_ok=True)
        save_image_grid(generated, grid, captions=captions)

    rows.sort(key=lambda x: (-x["retrieval_at_1"], -(x["margin"] or 0)))
    report = {"checkpoint": name, "n": n, "seed": seed,
              "negative": negative, "sampler": "dpmpp", "ranked": rows}
    out.write_text(json.dumps(report, indent=2))
    print(f"\n# ranked (chance={1.0 / n:.3f})")
    for row in rows:
        r = row["recipe"]
        print(f"r@1={row['retrieval_at_1']:.3f} margin={row['margin']:.4f} "
              f"g={r['g']} resc={r['resc']} band=({r['lo']},{r['hi']}) "
              f"steps={r['steps']} restarts={r['restarts']} "
              f"[{row['wall_s']}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
