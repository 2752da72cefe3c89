"""Tabulate docs/eval_conditioning*.json into one markdown table.

Usage: python scripts/eval_table.py [glob ...]
Defaults to every docs/eval_conditioning*.json, sorted by mtime.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main(argv) -> int:
    paths = []
    for pat in argv or ["docs/eval_conditioning*.json"]:
        paths += [p for p in Path(".").glob(pat)]
    paths = sorted(set(paths), key=lambda p: p.stat().st_mtime)
    rows = []
    for p in paths:
        try:
            d = json.loads(p.read_text())
        except Exception:
            continue
        rows.append((
            p.name,
            d.get("checkpoint", "?"),
            d.get("sampler", "?"),
            d.get("guidance", "-"),
            d.get("negative", "-"),
            d.get("prompts", "dataset"),
            d.get("init", "prior"),
            d.get("n", "-"),
            f"{d.get('retrieval_at_1', float('nan')):.3f}",
            f"{d.get('retrieval_p_value', float('nan')):.3g}"
            if d.get("retrieval_p_value") is not None else "-",
            f"{d.get('margin', float('nan')):.4f}",
        ))
    hdr = ("file", "checkpoint", "sampler", "g", "neg", "prompts", "init",
           "n", "ret@1", "p", "margin")
    widths = [max(len(str(r[i])) for r in rows + [hdr]) for i in range(len(hdr))]
    for r in [hdr, tuple("-" * w for w in widths)] + rows:
        print("| " + " | ".join(str(v).ljust(w) for v, w in zip(r, widths)) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
