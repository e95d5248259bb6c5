"""PIL-parity bicubic resampling as separable matmuls (MXU-friendly).

The reference synthesizes LR patches with PIL's ``Image.BICUBIC`` resize
(SURVEY.md §3.4), and SURVEY.md §7 flags bicubic parity as the silent
dominator of PSNR deltas — so instead of ``jax.image.resize`` we build the
exact PIL resampling weights (Catmull-Rom cubic, a = -0.5, kernel support
scaled by the downscale factor, per-row normalization) as static
(out, in) matrices at trace time and apply them with two einsum
contractions (rows then columns).  Static shapes → one compile; dense
matmuls → MXU.

Matches PIL float-mode resize to ~1e-6; the uint8 path differs only by
PIL's output quantization (tested to ≤1/255 — tests/test_resize.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax < 1.0,
        ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0, (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a, 0.0),
    )


@functools.lru_cache(maxsize=64)
def _resample_matrix(n_in: int, n_out: int) -> np.ndarray:
    """PIL ``precompute_coeffs`` equivalent: (n_out, n_in) float32 weights."""
    scale = n_in / n_out
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale          # bicubic support = 2
    ss = 1.0 / filterscale
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(n_in, int(center + support + 0.5))
        xs = np.arange(xmin, xmax, dtype=np.float64)
        w = _cubic((xs - center + 0.5) * ss)
        s = w.sum()
        if s != 0.0:
            w = w / s
        mat[i, xmin:xmax] = w
    return mat.astype(np.float32)


def bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize NHWC (or HWC) float array to (out_h, out_w), PIL-bicubic."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    mh = jnp.asarray(_resample_matrix(h, out_h))
    mw = jnp.asarray(_resample_matrix(w, out_w))
    # rows: (B,H,W,C) x (Oh,H) -> (B,Oh,W,C); then cols analogously.
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
    y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision="highest")
    return y[0] if squeeze else y


def bicubic_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """÷factor antialiased bicubic downsample (the reference's LR synthesis,
    SURVEY.md §3.4: ``Resize(hr//4, BICUBIC)``)."""
    h, w = x.shape[-3], x.shape[-2]
    assert h % factor == 0 and w % factor == 0, (x.shape, factor)
    return bicubic_resize(x, h // factor, w // factor)
