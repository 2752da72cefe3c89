"""Per-channel latent usage of a trained stage-1 VAE.

VERDICT r4 #3 hypothesizes the 27^2 x 8 latent underuses its channels
(posterior collapse under the KL anneal), which would cap the anatomy any
stage-2 model can draw.  This measures it: encode N dataset sprites and
report, per latent channel, the spatial std of mu, the mean posterior
sigma, and the mean KL — a collapsed channel has KL ~ 0 (mu ~ 0,
sigma ~ 1) and carries no information.

Usage: python scripts/diag_latent_usage.py [vae_ckpt] [n_images] [device]
Defaults: the r4d/r5 evidence VAE, 64 images, cpu (the TPU is usually
busy training when this matters).
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    ckpt = (sys.argv[1] if len(sys.argv) > 1 else
            "experiments/evidence_r4d_vae/checkpoints/vae_best_model.ckpt")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    device = sys.argv[3] if len(sys.argv) > 3 else "cpu"

    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from psg_tpu.core.checkpoint import load_params
    from psg_tpu.core.initutil import jit_init
    from psg_tpu.data.dataset import PokemonDataset
    from psg_tpu.models.vae import vae_encoder_apply, vae_init

    ds = PokemonDataset("/root/reference/data/text_description_concat.csv",
                        "/root/reference/data/small_images", image_size=215)
    template = {"vae": jit_init(vae_init, jax.random.PRNGKey(0), 8, 768)}
    params = load_params(ckpt, template)["vae"]

    mus, logvars = [], []
    enc = jax.jit(lambda p, x: vae_encoder_apply(p, x, dtype=jnp.bfloat16))
    for s in range(0, n, 8):
        imgs = ds.images[s:s + 8].astype(np.float32) / 127.5 - 1.0
        mu, logvar = enc(params["encoder"], jnp.asarray(imgs))
        mus.append(np.asarray(mu, np.float32))
        logvars.append(np.asarray(logvar, np.float32))
    mu = np.concatenate(mus)          # [N, 27, 27, 8]
    logvar = np.concatenate(logvars)

    kl = 0.5 * (mu**2 + np.exp(logvar) - 1.0 - logvar)  # per-element KL
    print(f"{'ch':>3} {'std(mu)':>9} {'mean(sigma)':>11} {'mean KL':>9} "
          f"{'active':>7}")
    total_kl = 0.0
    for c in range(mu.shape[-1]):
        s_mu = float(mu[..., c].std())
        sig = float(np.exp(0.5 * logvar[..., c]).mean())
        k = float(kl[..., c].mean())
        total_kl += k
        print(f"{c:>3} {s_mu:>9.3f} {sig:>11.3f} {k:>9.3f} "
              f"{'yes' if k > 0.05 else 'COLLAPSED':>9}")
    print(f"\nmean KL/element over all channels: {total_kl / mu.shape[-1]:.3f}"
          f"  (uniform usage would spread it evenly)")
    active = int((kl.mean(axis=(0, 1, 2)) > 0.05).sum())
    print(f"active channels: {active}/8")
    return 0


if __name__ == "__main__":
    sys.exit(main())
