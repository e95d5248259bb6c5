"""super_resolution_tpu — TPU-native ESRGAN super-resolution framework.

A from-scratch JAX / XLA / Flax / Pallas rebuild of the capabilities of
``lukas-blecher/super-resolution`` (ESRGAN detector-image upscaling,
PyTorch).  Design blueprint: ``SURVEY.md`` at the repo root.  NOTE: the
reference mount ``/root/reference/`` was empty in every session so far
(SURVEY.md §0), so parity citations point at SURVEY.md / BASELINE.json
provenance tags instead of reference file:line.

Public surface (mirrors the reference's capabilities, SURVEY.md §2.1):

- :mod:`super_resolution_tpu.models`   — RRDBNet generator, VGG-style
  discriminator, VGG-19 feature extractor (Flax, NHWC, bf16-ready).
- :mod:`super_resolution_tpu.losses`   — pixel L1, relativistic-average
  GAN, VGG perceptual losses as pure functions.
- :mod:`super_resolution_tpu.data`     — host decode + device-side jitted
  crop/augment/bicubic÷4/normalize pipeline.
- :mod:`super_resolution_tpu.train`    — jitted L1-pretrain and full GAN
  train steps, orbax checkpointing, eval (PSNR/SSIM).
- :mod:`super_resolution_tpu.parallel` — Mesh/shard_map data parallelism,
  overlap-blend tiled inference for arbitrarily large frames.
- :mod:`super_resolution_tpu.import_torch` — PyTorch ``.pth`` checkpoint
  importer (the parity linchpin, SURVEY.md §5.4).
- :mod:`super_resolution_tpu.cli`      — ``train`` / ``eval`` / ``upscale``
  subcommands preserving the reference CLI surface.
"""

__version__ = "0.1.0"

from super_resolution_tpu.config import (  # noqa: F401
    DataConfig,
    DiscriminatorConfig,
    GeneratorConfig,
    LossConfig,
    OptimConfig,
    TrainConfig,
    VGGConfig,
)
