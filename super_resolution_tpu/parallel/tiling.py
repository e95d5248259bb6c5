"""Overlap-blend tiled inference for arbitrarily large frames.

SURVEY.md §5.7: the image-domain counterpart of sequence/context
parallelism.  A 2K+ detector frame (BASELINE.json config 4) cannot be one
conv graph per frame size — XLA would recompile per shape and HBM would
hold the whole activation plane.  Instead:

    pad frame (reflect, halo h) → extract T×T LR tiles on a stride
    S = T − 2h grid → batch tiles through the jitted generator (ONE
    compiled shape) → multiply by a 2-D blending window (linear ramp over
    the 2h overlap — complementary ramps sum to exactly 1) → scatter-add
    into the ×r canvas → divide by the accumulated weight map.

The halo plays the role ring-attention's block exchange plays for
sequences: each tile carries enough neighbor context that the blend is
indistinguishable from the whole-frame result (pinned by the
tiled-vs-whole equivalence test, tests/test_tiling.py — the generator's
*effective* receptive field is small even though ~350 convs deep).

Multi-chip: pass a ``Mesh`` and the tile batch axis is sharded across it
(DP-of-tiles, SURVEY.md §2.3) — tiles scatter over ICI, the blended
canvas gathers back on the host.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def blend_window(tile: int, halo: int, scale: int) -> np.ndarray:
    """(T·r, T·r, 1) HR-resolution weight window: 1 in the core, linear
    ramp 0→1 across the 2h overlap; complementary ramps of adjacent tiles
    sum to exactly 1."""
    t_hr = tile * scale
    ramp_len = 2 * halo * scale
    x = np.arange(t_hr, dtype=np.float32) + 0.5
    if ramp_len > 0:
        w1 = np.clip(x / ramp_len, 0.0, 1.0)
        w1 = np.minimum(w1, np.clip((t_hr - x) / ramp_len, 0.0, 1.0))
    else:
        w1 = np.ones_like(x)
    return (np.outer(w1, w1))[..., None]


def plan_tiles(h: int, w: int, tile: int, halo: int):
    """Tile grid over an H×W LR frame: returns (n_rows, n_cols, pad_h,
    pad_w, stride).  Padding = halo on the leading edge + rounding up to a
    full stride grid on the trailing edge."""
    stride = tile - 2 * halo
    if stride <= 0:
        raise ValueError(f"tile {tile} must exceed 2*halo ({2 * halo})")
    n_rows = max(1, math.ceil(h / stride))
    n_cols = max(1, math.ceil(w / stride))
    pad_h = n_rows * stride + 2 * halo - h
    pad_w = n_cols * stride + 2 * halo - w
    return n_rows, n_cols, pad_h, pad_w, stride


def extract_tiles(lr: jnp.ndarray, tile: int, halo: int):
    """(H, W, C) → (n_tiles, T, T, C) with reflect padding."""
    h, w, c = lr.shape
    n_rows, n_cols, pad_h, pad_w, stride = plan_tiles(h, w, tile, halo)
    padded = jnp.pad(lr, ((halo, pad_h - halo), (halo, pad_w - halo),
                          (0, 0)), mode="reflect")
    tiles = []
    for i in range(n_rows):
        for j in range(n_cols):
            tiles.append(jax.lax.dynamic_slice(
                padded, (i * stride, j * stride, 0), (tile, tile, c)))
    return jnp.stack(tiles), (n_rows, n_cols, stride)


def tiled_upscale(
        infer_fn: Callable[[jnp.ndarray], jnp.ndarray],
        lr: jnp.ndarray,
        scale: int = 4,
        tile: int = 128,
        halo: int = 8,
        tile_batch: int = 8,
        mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Upscale an (H, W, C) normalized LR frame by ×``scale``.

    ``infer_fn`` maps a normalized (B, T, T, C) LR batch → (B, T·r, T·r, C)
    SR batch (e.g. a jitted generator apply).  ``tile_batch`` bounds the
    on-chip working set; every ``infer_fn`` call sees the same static
    shape, so the generator compiles exactly once per (tile, tile_batch).

    With a ``mesh``, tiles are batch-sharded across it, so any params
    ``infer_fn`` takes as *jit arguments* must already be replicated over
    the same mesh (``jax.device_put(params, replicated(mesh))``) — mixing
    single-device params with sharded tiles is a placement error.
    Closed-over (constant) params replicate automatically.
    """
    h, w, c = lr.shape
    tiles, (n_rows, n_cols, stride) = extract_tiles(lr, tile, halo)
    n_tiles = tiles.shape[0]

    # pad the tile batch to a full multiple (and to the mesh) — static shape
    group = tile_batch if mesh is None else tile_batch * mesh.devices.size
    n_pad = (-n_tiles) % group
    if n_pad:
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((n_pad,) + tiles.shape[1:], tiles.dtype)])
    if mesh is not None:
        sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        tiles = jax.device_put(tiles, sharding)

    sr_chunks = []
    for start in range(0, tiles.shape[0], group):
        sr_chunks.append(infer_fn(tiles[start:start + group]))
    sr_tiles = jnp.concatenate(sr_chunks)[:n_tiles]

    window = jnp.asarray(blend_window(tile, halo, scale))
    weighted = sr_tiles * window          # (n, T·r, T·r, C) — fused on VPU

    # scatter-add into the canvas + weight map, then normalize
    hr_t, s_hr = tile * scale, stride * scale
    canvas_h = n_rows * s_hr + 2 * halo * scale
    canvas_w = n_cols * s_hr + 2 * halo * scale
    canvas = jnp.zeros((canvas_h, canvas_w, c), jnp.float32)
    weights = jnp.zeros((canvas_h, canvas_w, 1), jnp.float32)
    for i in range(n_rows):
        for j in range(n_cols):
            idx = i * n_cols + j
            canvas = jax.lax.dynamic_update_slice(
                canvas,
                jax.lax.dynamic_slice(
                    canvas, (i * s_hr, j * s_hr, 0), (hr_t, hr_t, c))
                + weighted[idx], (i * s_hr, j * s_hr, 0))
            weights = jax.lax.dynamic_update_slice(
                weights,
                jax.lax.dynamic_slice(
                    weights, (i * s_hr, j * s_hr, 0), (hr_t, hr_t, 1))
                + window, (i * s_hr, j * s_hr, 0))

    out = canvas / jnp.maximum(weights, 1e-8)
    off = halo * scale
    return out[off:off + h * scale, off:off + w * scale]
