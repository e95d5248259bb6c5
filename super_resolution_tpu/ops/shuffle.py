"""Sub-pixel (pixel shuffle) and nearest-neighbor upsampling, NHWC.

Both upsampler variants the reference family ships (SURVEY.md §2.1 "RRDB
generator": PixelShuffle in the eriklindernoren branch, nearest+conv in
xinntao's).  Channel ordering of :func:`pixel_shuffle` matches
``torch.nn.PixelShuffle`` exactly (channel ``c*r*r + i*r + j`` → spatial
offset ``(i, j)``) so imported checkpoints reproduce bit-compatible math.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) → (B, H*r, W*r, C), torch PixelShuffle semantics."""
    b, h, w, crr = x.shape
    assert crr % (r * r) == 0, (crr, r)
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)          # (..., c, i, j)
    x = x.transpose(0, 1, 4, 2, 5, 3)        # (b, h, i, w, j, c)
    return x.reshape(b, h * r, w * r, c)


def nearest_upsample(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) → (B, H*r, W*r, C) by pixel replication (matches
    ``F.interpolate(mode='nearest')``)."""
    x = jnp.repeat(x, r, axis=1)
    return jnp.repeat(x, r, axis=2)
