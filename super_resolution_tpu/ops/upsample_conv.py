"""Fused nearest-×2-upsample + 3×3 conv via polyphase decomposition.

The RRDB tail's ``nearest_upsample(x, 2)`` followed by a 3×3 SAME conv
(models/rrdb.py upconv1/2; the xinntao family branch) does 9 MACs per
*upsampled* pixel = 36 MAC-taps per source pixel, reading a 4×-size
plane.  Because nearest upsampling duplicates pixels, the composite is
exactly a set of four 2×2 convolutions on the SMALL plane — one per
output phase (a, b) ∈ {0,1}²:

    out[2y+a, 2x+b] = Σ_{dy,dx} W[dy+1, dx+1] · x[y + ⌊(a+dy)/2⌋,
                                                  x + ⌊(b+dx)/2⌋]

The row tap sets collapse per phase: a=0 → rows (y-1: W[0]), (y: W[1]+
W[2]); a=1 → rows (y: W[0]+W[1]), (y+1: W[2]) — and columns factor the
same way, so each phase kernel is a 2×2 combination of the 3×3 kernel's
row/col sums: 4 phases × 4 taps = 16 MAC-taps per source pixel, a 2.25×
FLOP reduction plus the big-plane input read eliminated.  XLA cannot
discover this across the repeat→conv boundary (verified: the naive form
lowers to a full-plane conv), so the decomposition lives here at the
op level; the parameter stays the ordinary (3, 3, C, F) HWIO kernel, so
checkpoints are untouched and import/export is oblivious.

Boundary semantics match the naive form exactly: the up-plane's SAME
zero-padding corresponds to zero rows/cols at x[-1] and x[H], which is
what the per-phase paddings below produce (pinned by
tests/test_ops.py::test_nearest_up_conv_matches_naive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_up_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    """(B, H, W, C) → (B, 2H, 2W, F): nearest-×2 upsample + 3×3 SAME conv
    + bias, computed as four polyphase 2×2 convs on the small plane.

    ``kernel`` is the standard (3, 3, C, F) HWIO conv weight."""
    b, h, w, c = x.shape
    f = kernel.shape[-1]

    # per-phase 2-tap row/col combinations of the 3x3 kernel
    # phase 0: taps (prev, cur) = (W0, W1+W2); phase 1: (cur, next) =
    # (W0+W1, W2)
    def row_taps(a):
        if a == 0:
            return kernel[0:1], kernel[1:2] + kernel[2:3]      # (1,3,C,F)
        return kernel[0:1] + kernel[1:2], kernel[2:3]

    phases = []
    for a in (0, 1):
        r_prev, r_cur = row_taps(a)
        for bb in (0, 1):
            if bb == 0:
                k2 = jnp.concatenate([
                    jnp.concatenate([r_prev[:, 0:1],
                                     r_prev[:, 1:2] + r_prev[:, 2:3]], 1),
                    jnp.concatenate([r_cur[:, 0:1],
                                     r_cur[:, 1:2] + r_cur[:, 2:3]], 1),
                ], 0)                                           # (2,2,C,F)
                pad = ((1, 0), (1, 0)) if a == 0 else ((0, 1), (1, 0))
            else:
                k2 = jnp.concatenate([
                    jnp.concatenate([r_prev[:, 0:1] + r_prev[:, 1:2],
                                     r_prev[:, 2:3]], 1),
                    jnp.concatenate([r_cur[:, 0:1] + r_cur[:, 1:2],
                                     r_cur[:, 2:3]], 1),
                ], 0)
                pad = ((1, 0), (0, 1)) if a == 0 else ((0, 1), (0, 1))
            y = jax.lax.conv_general_dilated(
                x, k2, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision)
            phases.append(y)

    # interleave phases: phases[2a+b][y, x] is out[2y+a, 2x+b]
    stacked = jnp.stack(phases, axis=0).reshape(2, 2, b, h, w, f)
    out = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5)) \
        .reshape(b, 2 * h, 2 * w, f)
    return out + bias.astype(out.dtype)


def nearest_up_conv_nchw(x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray, *,
                         precision=None) -> jnp.ndarray:
    """(B, C, H, W) channels-first wrapper (the pallas_cf tail layout)."""
    y = nearest_up_conv(jnp.transpose(x, (0, 2, 3, 1)), kernel, bias,
                        precision=precision)
    return jnp.transpose(y, (0, 3, 1, 2))
