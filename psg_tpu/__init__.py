"""psg_tpu — a TPU-native latent-diffusion sprite-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
GabrieleConte/pokemon-sprite-generator (the PyTorch reference mounted at
/root/reference), designed TPU-first:

- all compute paths are jittable pure functions over explicit param pytrees
  (NHWC layouts, bf16-on-MXU friendly),
- diffusion sampling runs fully on-device as ``lax.scan`` loops,
- multi-device scaling goes through ``jax.sharding.Mesh`` + NamedSharding
  (axes ``('data', 'model')``) with XLA-emitted collectives over ICI,
- the hot attention paths have Pallas TPU kernels (``psg_tpu.ops``),
- numerical stability is structural (isfinite-masked optimizer steps,
  fp32 norms/softmax) instead of the reference's host-side NaN babysitting.

Package map (see SURVEY.md for the reference inventory each part covers):

- ``core``      config / PRNG / checkpointing / metrics / stability
- ``parallel``  mesh construction + sharding rules
- ``nn``        functional layer primitives (conv, norms, attention, ...)
- ``ops``       Pallas TPU kernels with XLA reference fallbacks
- ``models``    VAE, UNet, BERT text encoder, VGG/CLIP losses, converters
- ``text``      offline WordPiece tokenizer
- ``diffusion`` unified noise schedule + DDPM sampler family
- ``data``      host-side input pipeline (CSV + PNG -> device arrays)
- ``train``     3-stage trainers as jitted step functions + CLI
- ``serve``     generator API + (optional) gradio front-end
"""

__version__ = "0.1.0"
