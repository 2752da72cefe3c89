from psg_tpu.models.vae import (
    vae_init,
    vae_encode,
    vae_decode,
    vae_apply,
    vae_sample,
)
from psg_tpu.models.unet import unet_init, unet_apply

__all__ = [
    "vae_init",
    "vae_encode",
    "vae_decode",
    "vae_apply",
    "vae_sample",
    "unet_init",
    "unet_apply",
]
