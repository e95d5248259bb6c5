"""Self-ensemble (×8 test-time augmentation) — the ESRGAN/BasicSR
family's enhanced-inference mode: average the SR results over the 8
dihedral transforms of the input (4 rotations × flip), inverting each
transform on the output.  Typically worth ~0.1–0.2 dB PSNR at 8× the
compute."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _dihedral(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Apply the k-th (0..7) dihedral transform to an (H, W, C) image."""
    if k >= 4:
        x = x[:, ::-1, :]
    return jnp.rot90(x, k % 4, axes=(0, 1))


def _dihedral_inv(x: jnp.ndarray, k: int) -> jnp.ndarray:
    x = jnp.rot90(x, -(k % 4), axes=(0, 1))
    if k >= 4:
        x = x[:, ::-1, :]
    return x


def self_ensemble(upscale_fn: Callable[[jnp.ndarray], jnp.ndarray],
                  lr: jnp.ndarray) -> jnp.ndarray:
    """×8 TTA around any (H, W, C) → (rH, rW, C) upscale function (e.g. a
    tiled_upscale closure).  Non-square inputs are fine — odd rotations
    transpose the frame and the inverse transposes it back."""
    acc = None
    for k in range(8):
        sr = upscale_fn(_dihedral(lr, k))
        sr = _dihedral_inv(sr, k)
        acc = sr if acc is None else acc + sr
    return acc / 8.0
