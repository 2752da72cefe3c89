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
``seeds=A,B,C`` replicates across several seeds while reusing one
compiled generator (first seed writes the given out path and carries the
stamp; the rest write ``<stem>_seed<N>.json`` — pool with
``scripts/eval_table.py --pool``);
``strength=S`` sets the retrieval-loo seeding strength;
``prompts=paraphrase`` swaps the dataset captions for name-free
paraphrases (``PARAPHRASES``) — retrieval@1 from these measures
generalization across wording rather than caption memorization.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# Freshly-worded visual descriptions of the first 8 species, with the
# species NAME deliberately omitted (dataset captions all start "Pokemon
# named X.", so name tokens are a trivial retrieval key).  Used by the
# ``prompts=paraphrase`` mode: retrieval@1 from these measures whether
# conditioning generalizes across wording, not whether caption strings
# were memorized.  The set is adversarial on purpose — three green, three
# orange, and two blue confusable evolution-line neighbors.
PARAPHRASES = [
    "A small four-legged dinosaur beast, pale green with dark spots, "
    "carrying a fat round plant bulb on its back",                 # Bulbasaur
    "A mid-sized green quadruped with a leafy plant and tight pink "
    "buds sprouting from its back",                                # Ivysaur
    "A huge dark green beast bearing a giant blooming flower with "
    "bright pink petals and a yellow center on its back",          # Venusaur
    "A little bright orange lizard standing upright, a small flame "
    "burning at the tip of its tail",                              # Charmander
    "A lean red-orange reptile with a horned angular head and a "
    "hot blazing tail flame",                                      # Charmeleon
    "A big orange dragon with wide leathery wings tinged blue and "
    "a roaring fiery tail",                                        # Charizard
    "A tiny light blue turtle with a glossy brown shell and a "
    "curled fluffy tail",                                          # Squirtle
    "A dark blue turtle with long furry ears and a thick ridged "
    "shell",                                                       # Wartortle
    "A massive heavy dark blue tortoise, armored shell fitted "
    "with two metal water cannons",                                # Blastoise
    "A soft bright green worm with a segmented body and a red "
    "antenna on its head",                                         # Caterpie
    "A motionless green cocoon shaped like a crescent, hard "
    "glossy angular shell",                                        # Metapod
    "A butterfly with wide white wings veined in black and a "
    "small purple-blue body",                                      # Butterfree
    "A yellow segmented grub with a pink nose and a sharp "
    "needle stinger on its head",                                  # Weedle
    "A stiff yellow cocoon with a waxy shell and two small "
    "black eyes",                                                  # Kakuna
    "A wasp with a black and yellow striped body, buzzing clear "
    "wings and two long needle arms",                              # Beedrill
    "A plump little bird with brown and cream feathers and a "
    "tiny sharp beak",                                             # Pidgey
]
# evolution families among the first 16 (for the relaxed retrieval count)
FAMILIES = [{0, 1, 2}, {3, 4, 5}, {6, 7, 8}, {9, 10, 11}, {12, 13, 14},
            {15}]


def main() -> int:
    loo = "init=retrieval-loo" in sys.argv[1:]
    retrieval = "init=retrieval" in sys.argv[1:]
    paraphrase = "prompts=paraphrase" in sys.argv[1:]
    strength = 0.85
    seeds = [1234]
    for a in sys.argv[1:]:
        if a.startswith("strength="):
            strength = float(a.split("=", 1)[1])
        if a.startswith("seed="):
            seeds = [int(a.split("=", 1)[1])]
        if a.startswith("seeds="):
            # comma list: replicate the eval across sampling seeds while
            # reusing ONE built (and compiled) generator — seed
            # replication for the price of a single compile.  The first
            # seed writes to the given out path; each further seed writes
            # <out stem>_seed<N>.json, and only the first is stamped.
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
    extra_overrides = [a for a in sys.argv[1:]
                       if "=" in a and a not in ("init=retrieval-loo",
                                                 "init=retrieval",
                                                 "prompts=paraphrase")
                       and not a.startswith(("strength=", "seed=", "seeds=",
                                             "stamp="))]
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
    if paraphrase:
        n = min(n, len(PARAPHRASES))
        captions = PARAPHRASES[:n]
    else:
        captions = ds.full_descriptions[:n]
    names = [r["english_name"] for r in ds.rows[:n]]
    real = [ds.image_float(i) for i in range(n)]

    def run_for_seed(seed: int, out: Path, stamp: bool) -> None:
        if loo:
            # leave-one-out retrieval seeding: sprite i's generation is
            # seeded from the nearest OTHER sprite — if the prompt
            # dominates, the output should still match sprite i best
            from psg_tpu.utils.images import pil_to_array

            generated = []
            for i, cap in enumerate(captions):
                im = gen.generate_from_text_retrieval(
                    cap, num_inference_steps=steps, seed=seed + i,
                    restarts=restarts, exclude=i, strength=strength)
                generated.append(pil_to_array(im, gen.cfg.data.image_size))
        else:
            imgs = gen.generate_batch(
                captions, num_inference_steps=steps,
                seed=seed, restarts=restarts,
                init="retrieval" if retrieval else "prior",
                init_strength=strength)
            generated = [np.asarray(im, np.float32) for im in imgs]

        report = conditioning_report(generated, real, names=names)
        if paraphrase:
            # relaxed count: best match lands in the caption's evolution
            # family (Bulbasaur line / Charmander line / Squirtle line) —
            # the scorer is palette-heavy, so within-family confusions are
            # expected even under correct conditioning
            from psg_tpu.eval.metrics import pairwise_conditioning_scores

            s = pairwise_conditioning_scores(generated, real)
            best = s.argmax(axis=1)
            fam_of = {i: fi for fi, fam in enumerate(FAMILIES) for i in fam}
            hits = [fam_of.get(int(best[i])) == fam_of.get(i)
                    for i in range(len(best))]
            report["family_retrieval_at_1"] = float(np.mean(hits))
            report["family_chance"] = float(np.mean(
                [len(FAMILIES[fam_of[i]]) / len(best) for i in range(len(best))]))
            report["prompts"] = "paraphrase"
        report["checkpoint"] = name
        report["sampler"] = f"{sampler}@{steps}" + (
            f"+restart{restarts}" if restarts else "")
        report["guidance"] = guidance
        report["negative"] = negative
        report["init"] = (f"retrieval-loo@{strength}" if loo else
                          f"retrieval@{strength}" if retrieval else "prior")
        if retrieval or loo:
            report["retrieval_mode"] = gen.retrieval_mode
        report["seed"] = seed
        out.parent.mkdir(parents=True, exist_ok=True)
        # the generated sprites are already in memory — save the grid next to
        # the JSON (top rows: generations in caption order; the report's
        # per_sprite section carries the matched/mismatched scores)
        from psg_tpu.utils.images import save_image_grid

        save_image_grid(generated, out.with_suffix(".png"), captions=captions)
        report["grid"] = str(out.with_suffix(".png"))
        out.write_text(json.dumps(report, indent=2))
        if stamp and (paraphrase or loo or retrieval):
            # a paraphrase stamp lives on a different chance scale and a
            # retrieval-seeded stamp measures the crutch, not the
            # checkpoint — hub ranking would compare it against canonical
            # dataset stamps (serve/hub.py ignores such stamps, but don't
            # write them in the first place)
            print("NOT stamping: only dataset-prompt, prior-init evals "
                  "are comparable for serving resolution", file=sys.stderr)
            stamp = False
        if stamp:
            # record the headline in the evaluated checkpoint's sidecar so
            # serving resolution (serve/hub.py) can rank this checkpoint by
            # MEASURED conditioning, not just val loss — in particular a
            # stage-3 final bundle only shadows a stage-2 pair when its
            # stamped eval is not worse
            ck = getattr(gen, "diffusion_checkpoint", None)
            if ck:
                side = Path(ck).with_suffix(".json")
                meta = json.loads(side.read_text()) if side.exists() else {}
                meta.setdefault("eval", {})["retrieval_at_1"] = report[
                    "retrieval_at_1"]
                meta["eval"]["recipe"] = {
                    "sampler": report["sampler"], "guidance": guidance,
                    "negative": negative, "init": report["init"],
                    "n": len(captions), "seed": seed,
                    "prompts": "paraphrase" if paraphrase else "dataset"}
                side.write_text(json.dumps(meta, indent=2))
                print(f"stamped eval.retrieval_at_1={report['retrieval_at_1']} "
                      f"into {side}", file=sys.stderr)
        print(json.dumps(
            {k: v for k, v in report.items() if k != "per_sprite"}))

    stamp = "stamp=1" in sys.argv[1:]
    for si, s in enumerate(seeds):
        out_s = out if si == 0 else out.with_name(
            f"{out.stem}_seed{s}{out.suffix}")
        run_for_seed(s, out_s, stamp and si == 0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
