"""Profile the VAE decode path on real TPU: full decode + the 215^2
cross-attention block in isolation (VERDICT r1 target: <= 1 ms), per
attention backend (XLA vs Pallas).

Usage: python -u scripts/profile_vae.py [batch] [decode]
       (pass 'decode' to also time the full decoder — one more big compile)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench_util import bench, report
from psg_tpu.nn.attention import (
    spatial_cross_attention,
    spatial_cross_attention_init,
)


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    do_decode = "decode" in sys.argv[2:]
    S, text_dim = 128, 768
    dt_c = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    txt = jax.random.normal(key, (batch, S, text_dim), dt_c)

    print(f"batch={batch} bf16 backend={jax.default_backend()}", flush=True)

    # the decoder's 5 cross-attention sites: (spatial, channels)
    sites = [(27, 512), (54, 256), (108, 128), (215, 64), (215, 32)]
    import os

    for hw, c in sites:
        p = spatial_cross_attention_init(jax.random.PRNGKey(1), c, text_dim)
        p = jax.tree_util.tree_map(lambda a: a.astype(dt_c), p)
        x = jax.random.normal(key, (batch, hw, hw, c), dt_c)
        dt, fl = bench(
            lambda p, xi: spatial_cross_attention(p, xi, txt, num_heads=8,
                                                  dtype=dt_c),
            x, n=20, params=p)
        report(f"spatial_xattn {hw}^2 x{c} (attn={os.environ.get('PSG_TPU_ATTN','xla')})",
               dt, fl)

    if do_decode:
        from psg_tpu.models.vae import vae_decoder_apply, vae_decoder_init

        dec = jax.jit(lambda k: vae_decoder_init(k, 8, text_dim))(
            jax.random.PRNGKey(2))
        dec = jax.tree_util.tree_map(lambda a: a.astype(dt_c), dec)
        jax.block_until_ready(dec)
        lat = jax.random.normal(key, (batch, 27, 27, 8), dt_c)
        dt, fl = bench(
            lambda p, xi: vae_decoder_apply(p, xi, txt, image_size=215,
                                            dtype=dt_c), lat, n=10, params=dec)
        report("FULL vae_decode 27^2 -> 215^2", dt, fl)
    return 0


if __name__ == "__main__":
    sys.exit(main())
