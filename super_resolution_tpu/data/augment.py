"""Device-side jitted augmentation + LR synthesis + normalization.

The reference does per-sample PIL crops/flips in DataLoader worker
processes and normalizes on CPU (SURVEY.md §3.4).  TPU-native split
(SURVEY.md §2.2 "PIL" row): the host only decodes and random-crops uint8
patches (cheap slicing, keeps H2D bytes minimal and shapes static); all
arithmetic — uint8→float, flip/rot augmentation, antialiased bicubic ÷4 LR
synthesis, ImageNet normalization — runs on-device inside one jitted
function, so it fuses into the step and rides the MXU for the resampling
matmuls.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from super_resolution_tpu.config import DataConfig
from super_resolution_tpu.ops.resize import bicubic_downsample


def normalize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def denormalize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return x * std + mean


def augment_batch(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample random hflip / vflip / 90° rotation (the family's
    flip/rot augment, SURVEY.md §2.1 "Dataset / patch loader").

    Rotation by transpose requires square patches; for non-square inputs
    the rot branch is disabled at trace time.
    """
    b = x.shape[0]
    kh, kv, kr = jax.random.split(key, 3)
    do_h = jax.random.bernoulli(kh, 0.5, (b,))
    do_v = jax.random.bernoulli(kv, 0.5, (b,))
    x = jnp.where(do_h[:, None, None, None], x[:, :, ::-1, :], x)
    x = jnp.where(do_v[:, None, None, None], x[:, ::-1, :, :], x)
    if x.shape[1] == x.shape[2]:
        do_r = jax.random.bernoulli(kr, 0.5, (b,))
        x = jnp.where(do_r[:, None, None, None],
                      jnp.transpose(x, (0, 2, 1, 3)), x)
    return x


def preprocess_batch(
        key: jax.Array, batch, cfg: DataConfig,
        augment: bool | None = None,
) -> Dict[str, jnp.ndarray]:
    """uint8 batch → normalized {lr, hr} training pair, fully on-device
    (SURVEY.md §3.4 `__getitem__` equivalent, batched).

    ``batch`` is either an HR array (B, P, P, 3) — LR is bicubic-
    synthesized ÷scale — or a paired ``{"hr": …, "lr": …}`` uint8 dict
    (SURVEY.md §2.1 paired mode), in which case the same per-sample
    flip/rot decisions apply to both resolutions (identical RNG key →
    identical Bernoulli draws)."""
    do_aug = augment if augment is not None else cfg.augment
    if isinstance(batch, dict):
        hr = batch["hr"].astype(jnp.float32) / 255.0
        lr = batch["lr"].astype(jnp.float32) / 255.0
        if do_aug:
            hr = augment_batch(key, hr)
            lr = augment_batch(key, lr)
    else:
        hr = batch.astype(jnp.float32) / 255.0
        if do_aug:
            hr = augment_batch(key, hr)
        lr = bicubic_downsample(hr, cfg.scale)
    return {
        "lr": normalize(lr, cfg.normalize_mean, cfg.normalize_std),
        "hr": normalize(hr, cfg.normalize_mean, cfg.normalize_std),
    }


def to_uint8_image(x_normalized: jnp.ndarray, cfg: DataConfig) -> jnp.ndarray:
    """Denormalize a model output back to a displayable uint8 image."""
    x = denormalize(x_normalized, cfg.normalize_mean, cfg.normalize_std)
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
