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

import functools
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


@functools.partial(jax.jit,
                   static_argnames=("pad_h", "pad_w", "tile", "halo",
                                    "n_rows", "n_cols", "stride"))
def _extract_tiles_jit(lr, *, pad_h, pad_w, tile, halo, n_rows, n_cols,
                       stride):
    padded = jnp.pad(lr, ((halo, pad_h - halo), (halo, pad_w - halo),
                          (0, 0)), mode="reflect")
    idx = jnp.arange(n_rows * n_cols)
    oys, oxs = (idx // n_cols) * stride, (idx % n_cols) * stride
    return jax.vmap(lambda oy, ox: jax.lax.dynamic_slice(
        padded, (oy, ox, 0), (tile, tile, lr.shape[-1])))(oys, oxs)


def extract_tiles(lr: jnp.ndarray, tile: int, halo: int):
    """(H, W, C) → (n_tiles, T, T, C) with reflect padding — one compiled
    vmap-of-dynamic_slice per (frame shape, tile plan), not n_tiles
    eagerly dispatched slices."""
    h, w, c = lr.shape
    n_rows, n_cols, pad_h, pad_w, stride = plan_tiles(h, w, tile, halo)
    tiles = _extract_tiles_jit(lr, pad_h=pad_h, pad_w=pad_w, tile=tile,
                               halo=halo, n_rows=n_rows, n_cols=n_cols,
                               stride=stride)
    return tiles, (n_rows, n_cols, stride)


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

    out = _blend_scatter(sr_tiles,
                         jnp.asarray(blend_window(tile, halo, scale)),
                         jnp.asarray(_weight_map(n_rows, n_cols, tile,
                                                 halo, scale)),
                         n_rows=n_rows, n_cols=n_cols,
                         s_hr=stride * scale, hr_t=tile * scale)
    off = halo * scale
    return out[off:off + h * scale, off:off + w * scale]


def _weight_map(n_rows: int, n_cols: int, tile: int, halo: int,
                scale: int) -> np.ndarray:
    """Accumulated blend-weight canvas, computed analytically: the 2-D
    window is ``outer(w1, w1)``, so the sum of shifted windows over the
    tile grid separates into an outer product of 1-D shifted-ramp sums —
    no per-tile accumulation pass needed."""
    t_hr, s_hr = tile * scale, (tile - 2 * halo) * scale
    x = np.arange(t_hr, dtype=np.float32) + 0.5
    ramp_len = 2 * halo * scale
    if ramp_len > 0:
        w1 = np.clip(x / ramp_len, 0.0, 1.0)
        w1 = np.minimum(w1, np.clip((t_hr - x) / ramp_len, 0.0, 1.0))
    else:
        w1 = np.ones_like(x)

    def profile(n):
        p = np.zeros(n * s_hr + (t_hr - s_hr), np.float32)
        for i in range(n):
            p[i * s_hr:i * s_hr + t_hr] += w1
        return p

    return np.outer(profile(n_rows), profile(n_cols))[..., None]


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "n_cols", "s_hr", "hr_t"))
def _blend_scatter(sr_tiles, window, wmap, *, n_rows, n_cols, s_hr, hr_t):
    """One compiled scatter-blend for the whole frame (SURVEY.md §7 stage
    6): window-weight every tile, lax.scan a dynamic-update-slice
    accumulation over the tile grid, divide by the analytic weight map.
    Replaces ~2·n_tiles eagerly dispatched host ops per frame with a
    single cached jit call per (frame shape, plan)."""
    c = sr_tiles.shape[-1]
    weighted = (sr_tiles * window).astype(jnp.float32)
    idx = jnp.arange(n_rows * n_cols)
    oys, oxs = (idx // n_cols) * s_hr, (idx % n_cols) * s_hr
    canvas = jnp.zeros((n_rows * s_hr + (hr_t - s_hr),
                        n_cols * s_hr + (hr_t - s_hr), c), jnp.float32)

    def body(canvas, x):
        t, oy, ox = x
        patch = jax.lax.dynamic_slice(canvas, (oy, ox, 0), (hr_t, hr_t, c))
        return jax.lax.dynamic_update_slice(canvas, patch + t,
                                            (oy, ox, 0)), None

    canvas, _ = jax.lax.scan(body, canvas, (weighted, oys, oxs))
    return canvas / jnp.maximum(wmap, 1e-8)
