"""Mode-preserving image IO for the inference surfaces (upscale/serve).

The reference's inference script decodes every input as 3-channel RGB
(SURVEY.md §1 L6 — its cv2/PIL read path), which silently FLATTENS
transparency: an RGBA sprite or a palette PNG with a transparency entry
comes out opaque.  Real deployments (texture/sprite upscaling is a
headline ESRGAN use case) need the alpha channel to survive.

Convention (the one the ESRGAN-family tooling settled on): the model
sees only the RGB planes; the alpha plane is upscaled separately with
plain bicubic — alpha is a soft coverage mask, not natural-image
content, so hallucinating texture into it with the GAN generator causes
fringing — and reattached to the SR output.  Grayscale ("L"/"LA"/1-bit)
and palette ("P") inputs are expanded to RGB for the model, exactly as
the reference does.

``split_alpha`` / ``merge_alpha`` are the only two entry points; both
``cli upscale`` and the serve watch loop go through them, so the two
surfaces cannot drift.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from super_resolution_tpu.ops.resize import bicubic_resize

__all__ = ["split_alpha", "upscale_alpha", "merge_alpha"]


def _has_alpha(im) -> bool:
    if im.mode in ("RGBA", "LA", "PA"):
        return True
    # palette PNGs carry transparency as a tRNS sidecar, not a band
    return im.mode == "P" and "transparency" in im.info


def split_alpha(im) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """PIL image → (HWC uint8 RGB, HW uint8 alpha or None).

    The RGB planes are what the generator consumes; alpha (when the
    source has any, including palette-transparency) is returned
    separately for :func:`merge_alpha` after SR.
    """
    if _has_alpha(im):
        rgba = np.asarray(im.convert("RGBA"))
        return rgba[..., :3], rgba[..., 3]
    return np.asarray(im.convert("RGB")), None


def upscale_alpha(alpha_u8: np.ndarray, scale: int) -> np.ndarray:
    """×``scale`` bicubic upscale of an HW uint8 alpha plane (uint8 out).

    Runs through the framework's PIL-parity separable-matmul bicubic
    (``ops/resize.py``) — two small einsums, one compile per input
    shape on the default backend.
    """
    import jax.numpy as jnp

    h, w = alpha_u8.shape
    a = jnp.asarray(alpha_u8, jnp.float32)[..., None] / 255.0
    hr = bicubic_resize(a, h * scale, w * scale)[..., 0]
    hr = np.asarray(hr, np.float32)
    return np.clip(np.rint(hr * 255.0), 0, 255).astype(np.uint8)


def merge_alpha(sr_rgb_u8: np.ndarray,
                alpha_u8: Optional[np.ndarray],
                scale: int) -> np.ndarray:
    """Reattach a (LR-resolution) alpha plane to an SR RGB frame.

    Returns HWC uint8 — 4 channels when ``alpha_u8`` is given (upscaled
    to match), 3 channels untouched when it is None.
    """
    if alpha_u8 is None:
        return sr_rgb_u8
    alpha_hr = upscale_alpha(alpha_u8, scale)
    if alpha_hr.shape != sr_rgb_u8.shape[:2]:
        raise ValueError(
            f"alpha {alpha_u8.shape} × scale {scale} → {alpha_hr.shape} "
            f"does not match SR frame {sr_rgb_u8.shape[:2]}")
    return np.concatenate([sr_rgb_u8, alpha_hr[..., None]], axis=-1)
