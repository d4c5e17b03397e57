"""WaveDM-TPU: a TPU-native wavelet-diffusion image-restoration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the WaveDM
reference (wavelet-domain conditional diffusion for image restoration,
IEEE TMM 2024 / arXiv 2305.13819): fixed Haar wavelet-packet transforms,
a time-conditioned diffusion UNet, the HFRM high-frequency restorer,
DDIM sampling with overlapping-patch tiling, and data-parallel training
over a `jax.sharding.Mesh`.

Layout:
  ops/        -- wavelet transforms and other fused primitives
  diffusion/  -- beta schedules, noise-estimation loss, EMA, DDIM samplers
  models/     -- Flax networks (DiffusionUNet, HFRM, WDNet, SAM, ...)
  data/       -- host-side input pipelines (RainDrop, paired folders)
  parallel/   -- mesh construction and sharding rules
  training/   -- jitted train steps and trainer loops
  inference/  -- full-image diffusive restoration
  utils/      -- metrics, checkpointing, image I/O
"""

__version__ = "0.1.0"
