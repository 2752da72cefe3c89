"""Tabulate docs/eval_conditioning*.json into one markdown table.

Usage: python scripts/eval_table.py [--pool] [glob ...]
Defaults to every docs/eval_conditioning*.json, sorted by mtime.

``--pool`` additionally pools the listed evals into one exact binomial
test: hits and trials are summed across files (they must share the same
chance rate, i.e. the same prompt-set size) and the tail probability
P(X >= hits) under X ~ Binomial(N, chance) is printed.  This is the
replication test for recipes whose single-seed eval lands near p=0.05:
independent sampling seeds of the same checkpoint+recipe are exchangeable
draws, so pooling is valid where cherry-picking the best seed is not.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path


def pooled_binomial(reports) -> dict:
    """Exact pooled tail test across eval reports (same chance rate)."""
    chances = {round(r["chance_retrieval"], 9) for r in reports}
    if len(chances) != 1:
        raise ValueError(f"cannot pool evals with different chance rates: {chances}")
    chance = chances.pop()
    n = sum(int(r["n"]) for r in reports)
    hits = sum(int(round(r["retrieval_at_1"] * r["n"])) for r in reports)
    p = float(sum(
        math.comb(n, k) * chance**k * (1 - chance) ** (n - k)
        for k in range(hits, n + 1)
    ))
    return {"n": n, "hits": hits, "chance": chance,
            "retrieval_at_1": hits / n if n else float("nan"),
            "pooled_p_value": p}


def main(argv) -> int:
    pool = "--pool" in argv
    argv = [a for a in argv if a != "--pool"]
    paths = []
    for pat in argv or ["docs/eval_conditioning*.json"]:
        paths += [p for p in Path(".").glob(pat)]
    paths = sorted(set(paths), key=lambda p: p.stat().st_mtime)
    rows = []
    reports = []
    for p in paths:
        try:
            d = json.loads(p.read_text())
        except Exception:
            continue
        reports.append(d)
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
    if pool:
        print(json.dumps({"pooled": pooled_binomial(reports)}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
