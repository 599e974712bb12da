"""denoising_diffusion_deep_fake_tpu — a TPU-native face-swap-via-denoising framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ChainBreak/denoising_diffusion_deep_fake`` (reference surveyed in SURVEY.md):

* U-Net denoisers (ResNet-encoder topology parity with
  ``segmentation_models_pytorch.Unet``) trained to reconstruct images under a
  continuous variance-preserving noise schedule,
* a two-identity deep-fake trainer that cross-feeds EMA-generated fakes,
* a difficulty balancer for training images,
* on-device augmentation, a scanned DDIM sampler, and a batched video
  face-swap pipeline,

all expressed as pure functions + pytrees under ``jax.jit``, sharded over
``jax.sharding.Mesh`` for multi-chip scale-out.
"""

__version__ = "0.1.0"
