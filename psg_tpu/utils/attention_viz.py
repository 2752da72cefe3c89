"""Attention visualization (the reference's helpers.py:92-132 analog).

Renders per-head cross-attention maps (pixels -> text tokens) as a PNG
grid.  Works from raw attention probabilities, which callers can obtain by
running ``psg_tpu.ops.xla_ref.sdpa_xla`` manually with the same q/k (the
production kernels never materialize the maps — that's the point of them).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def attention_probs(q, k, *, scale=None):
    """[B,H,Lq,D] x [B,H,Lk,D] -> softmax probabilities [B,H,Lq,Lk]."""
    import jax.numpy as jnp

    d = q.shape[-1]
    scale = scale or d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    return np.asarray(p / p.sum(axis=-1, keepdims=True))


def plot_attention_maps(probs, spatial: int, out_path,
                        tokens: Optional[Sequence[str]] = None,
                        token_indices: Optional[Sequence[int]] = None,
                        sample: int = 0) -> None:
    """probs: [B,H,Lq,Lk] with Lq == spatial*spatial.

    Writes a grid: rows = selected text tokens, cols = heads; each cell is
    the spatial map of attention paid to that token.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = np.asarray(probs)[sample]  # [H, Lq, Lk]
    h, lq, lk = p.shape
    assert lq == spatial * spatial, (lq, spatial)
    token_indices = list(token_indices if token_indices is not None
                         else range(min(4, lk)))

    fig, axes = plt.subplots(len(token_indices), h,
                             figsize=(2 * h, 2 * len(token_indices)),
                             squeeze=False)
    for r, ti in enumerate(token_indices):
        for c in range(h):
            m = p[c, :, ti].reshape(spatial, spatial)
            axes[r][c].imshow(m, cmap="viridis")
            axes[r][c].axis("off")
            if r == 0:
                axes[r][c].set_title(f"head {c}", fontsize=8)
        label = tokens[ti] if tokens and ti < len(tokens) else f"tok {ti}"
        axes[r][0].set_ylabel(label, fontsize=8)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
