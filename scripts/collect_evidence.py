"""Collect learning-evidence artifacts from an experiments/ run into docs/.

Copies the latest sample grids and renders loss curves from the
metrics.jsonl logs (stage 1 + stage 2), producing the round-2 equivalent
of round 1's docs/samples/vae_recon_8epochs.png evidence set.

Usage: python scripts/collect_evidence.py [experiment_name]
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def read_metrics(path: Path):
    rows = []
    if not path.exists():
        return rows
    for line in path.read_text().splitlines():
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return rows


def series(rows, key):
    pts = [(r["step"], r["value"]) for r in rows if r.get("tag") == key]
    return [p[0] for p in pts], [p[1] for p in pts]


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "evidence"
    out = Path("docs/samples")
    out.mkdir(parents=True, exist_ok=True)

    for stage, tag_train, tag_val in (
        ("vae", "vae_train/total_loss", "vae_val/total_loss"),
        ("diffusion", "diffusion_train/loss", "diffusion_val/loss"),
        ("final", "final_train/total_loss", "final_val/total_loss"),
    ):
        exp = Path("experiments") / f"{name}_{stage}"
        rows = read_metrics(exp / "logs" / "metrics.jsonl")
        if rows:
            fig, ax = plt.subplots(figsize=(7, 4))
            xs, ys = series(rows, tag_train)
            if xs:
                ax.plot(xs, ys, label="train", alpha=0.8)
            xs, ys = series(rows, tag_val)
            if xs:
                ax.plot(xs, ys, label="val", alpha=0.8)
            ax.set_xlabel("step")
            ax.set_ylabel("loss")
            ax.set_title(f"stage {stage} ({name}) — TPU v5e")
            ax.legend()
            ax.grid(alpha=0.3)
            fig.tight_layout()
            fig.savefig(out / f"{stage}_loss_{name}.png", dpi=110)
            print(f"wrote {out}/{stage}_loss_{name}.png ({len(rows)} rows)")

        samples = sorted((exp / "samples").glob("*.png"))
        for keep in samples[-2:] + samples[:1]:
            dst = out / f"{stage}_{name}_{keep.name}"
            shutil.copy(keep, dst)
            print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
