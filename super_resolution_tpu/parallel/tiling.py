"""Overlap-blend tiled inference for arbitrarily large frames.

SURVEY.md §5.7: the image-domain counterpart of sequence/context
parallelism.  A 2K+ detector frame (BASELINE.json config 4) cannot be one
conv graph per frame size — XLA would recompile per shape and HBM would
hold the whole activation plane.  Instead:

    clamp a T×T tile grid INSIDE the frame (stride S = T − 2h, the last
    row/column shifted inward so every tile is a true sub-window) →
    batch tiles through the jitted generator (ONE compiled shape) →
    multiply by a 2-D blending window (linear ramp over the overlaps) →
    scatter-add into the ×r canvas → divide by the accumulated weight
    map computed for the actual tile offsets.

Clamping (not padding) is what makes tiling *parity-exact at frame
borders*: an output pixel on the frame edge is produced only by tiles
whose boundary coincides with the frame edge there, so the generator's
own SAME zero-padding applies exactly as in whole-frame inference.
(Reflect-padding the frame — the usual shortcut, and round 1's choice —
leaks reflected context into every conv layer near the border and
deviated from the whole-frame result by up to 7/255 uint8 on the
canonical model; found by the round-2 verify drive.)  Frames that fit in
a single tile run whole — exact by construction.

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
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _axis_offsets(n: int, tile: int, stride: int) -> tuple:
    """Clamped 1-D tile offsets covering [0, n): multiples of ``stride``
    with the last tile shifted inward to end exactly at ``n``."""
    if n <= tile:
        return (0,)
    k = math.ceil((n - tile) / stride) + 1
    return tuple(min(i * stride, n - tile) for i in range(k))


def plan_tiles(h: int, w: int, tile: int, halo: int,
               tile_w: Optional[int] = None):
    """Tile plan over an H×W LR frame: ((tile_h, tile_w), oys, oxs) —
    per-axis tile sizes (clamped to the frame) and clamped offsets.
    Every (oy, ox, tile_h, tile_w) window lies inside the frame.

    ``tile`` is the tile height; ``tile_w`` (default: square tiles) makes
    the grid rectangular.  Full-height COLUMN tiling — ``tile >= h`` with
    a narrow ``tile_w`` — is the preferred 2K geometry: the fused kernel
    streams rows with the upward-halo carry, so vertical extent inside a
    tile costs zero recompute, and a column grid pays overlap waste on
    one axis only (1.125× vs 1.266× for 384² tiles on a 2048² frame)."""
    tile_w = tile if tile_w is None else tile_w
    tile_h = tile
    for t in (tile_h, tile_w):
        if t - 2 * halo <= 0:
            raise ValueError(f"tile {t} must exceed 2*halo ({2 * halo})")
    tile_h, tile_w = min(tile_h, h), min(tile_w, w)
    return ((tile_h, tile_w),
            _axis_offsets(h, tile_h, tile_h - 2 * halo),
            _axis_offsets(w, tile_w, tile_w - 2 * halo))


# Measured relative forward rate of the fused kernel vs column HEIGHT
# (128-wide columns, shipping knobs).  Sources: the round-4
# constant-pixel height sweep (BENCHNOTES "Constant-pixel column-height
# sweep": raw 47.1 / 45.0 / 44.4 / 44.7 / 39.9 MP/s at h = 128 / 256 /
# 512 / 1024 / 2048) and the round-4/5 end-to-end A/B (effective rate =
# MP/s x overlap waste: 44.9 at 704, 43.1 at 1056, 38.8 at 2048).
# Normalized to the 256-1024 plateau; piecewise-linear between knots,
# clamped at the ends.  Heights on the plateau run near speed; the
# 2048-high chain pays ~8-14% (0.917 / 0.865 across two sessions —
# knot at the midpoint; every planner decision pinned in
# tests/test_tiling.py is invariant across that range) — which is why
# min-area-tie-TALLER (round 4's objective) picked the known-slower
# geometry for any bucket-multiple frame height (VERDICT round 4,
# weak #3).  The round-5 completion sweep (BENCHNOTES) confirmed the
# model end-to-end: waste-corrected rates are flat ~45 MP/s across
# 512-768-high columns, so tile AREA separates plateau candidates and
# the rate term only demotes tall chains.
# (the 47.1 MP/s raw measurement at 128-high is amortization-
# confounded — BENCHNOTES flags it, and end-to-end 128-tiles measured
# SLOWER (29.0 vs 31.4, round 2) — so the 128 knot sits on the plateau,
# not above it: a planner rewarding 128-high columns would split a
# 1080-row frame into nine dispatches chasing a rate that does not
# survive end-to-end.)
_HEIGHT_RATE_KNOTS = ((128, 1.0), (256, 1.0), (704, 1.0),
                      (1056, 0.96), (2048, 0.89))


def _height_rate(t: int) -> float:
    """Piecewise-linear interpolation of the measured height-rate curve
    (clamped to the end knots)."""
    knots = _HEIGHT_RATE_KNOTS
    if t <= knots[0][0]:
        return knots[0][1]
    for (h0, r0), (h1, r1) in zip(knots, knots[1:]):
        if t <= h1:
            return r0 + (r1 - r0) * (t - h0) / (h1 - h0)
    return knots[-1][1]


def bucket_tile_h(h: int, tile_h: int, halo: int, bucket: int) -> int:
    """Rate-aware BUCKETED tile height: the multiple of ``bucket`` in
    (2*halo, min(tile_h, h)] minimizing estimated frame time — total
    clamped-grid tile area divided by the measured height-dependent
    forward rate (``_HEIGHT_RATE_KNOTS``) — ties broken toward taller
    tiles (fewer dispatches).

    This is the height-bucketing planner for column tiling on
    variable-height streams (ROADMAP round-5 candidate 2): quantizing
    the tile height to multiples of ``bucket`` bounds the set of
    compiled shapes to the distinct multiples actually used, while the
    clamped grid keeps fidelity exact-by-construction (no padding —
    conv biases make a zero-padded region non-zero after the first
    layer and that leaks back through later convs at the true frame
    border; see ``tiled_upscale``'s ``align`` note).

    Round 4 minimized AREA alone with ties toward taller — but the
    height sweep shows the fused kernel runs ~11-14% slower on a
    2048-high chain than on the 256-1024 plateau (BENCHNOTES), so for
    a 2048-high frame pure min-area picked the full-height column and
    forfeited a measured +12% (704x128 b2 = 40.99 vs 36.50 MP/s/chip
    end-to-end, round-4 A/B).  Dividing area by the measured rate makes
    the planner choose the capped geometry exactly where the hardware
    does.

    Falls back to ``min(tile_h, h)`` (the unbucketed clamp, i.e. a
    per-height compile) when no multiple fits; if even that clamp is
    <= 2*halo (short frame, tall halo) it returns ``tile_h`` unchanged
    so ``plan_tiles`` clamps the vertical axis to the whole frame just
    as the unbucketed path would (round-4 ADVICE: the clamped fallback
    used to hand plan_tiles an inadmissible tile and raise where the
    unbucketed path worked).
    """
    cap = min(tile_h, h)
    best = None
    for t in range(bucket, cap + 1, bucket):
        if t - 2 * halo <= 0:
            continue
        k = 1 if t >= h else math.ceil((h - t) / (t - 2 * halo)) + 1
        # estimated frame time: tile area over the measured height rate,
        # plus a small per-dispatch regularizer (0.3%/vertical tile) so
        # near-equal-cost geometries resolve toward fewer dispatches
        # rather than letting sub-percent rate-table noise pick a
        # many-tile grid.
        cost = (k * t / _height_rate(t)) * (1.0 + 0.003 * k)
        key = (cost, -t)
        if best is None or key < best[0]:
            best = (key, t)
    if best is None:
        return tile_h if cap <= 2 * halo else cap
    return best[1]


def _ramp(t_hr: int, ramp_len: int) -> np.ndarray:
    x = np.arange(t_hr, dtype=np.float32) + 0.5
    if ramp_len > 0:
        w1 = np.clip(x / ramp_len, 0.0, 1.0)
        return np.minimum(w1, np.clip((t_hr - x) / ramp_len, 0.0, 1.0))
    return np.ones_like(x)


def blend_window(tile: int, halo: int, scale: int,
                 tile_w: Optional[int] = None) -> np.ndarray:
    """(T_h·r, T_w·r, 1) HR-resolution weight window: 1 in the core,
    linear ramp 0→1 across the 2h overlap; the scatter divides by the
    accumulated window sum, so any coverage pattern renormalizes to a
    partition of unity."""
    tile_w = tile if tile_w is None else tile_w
    ramp_len = 2 * halo * scale
    return np.outer(_ramp(tile * scale, ramp_len),
                    _ramp(tile_w * scale, ramp_len))[..., None]


def _weight_profiles(oys: Sequence[int], oxs: Sequence[int], tile_h: int,
                     tile_w: int, halo: int, scale: int, h_hr: int,
                     w_hr: int) -> tuple:
    """Per-axis accumulated blend-weight profiles for the actual
    (clamped) offsets.  The 2-D window is an outer product and the
    offset grid factorizes per axis, so the full (h_hr, w_hr) weight
    canvas separates into an outer product of these two 1-D
    shifted-ramp sums — which is why only the PROFILES (a few KB) ever
    leave the host: the blend jit reconstitutes the outer product
    on-device instead of uploading an h_hr×w_hr fp32 canvas (268 MB for
    an 8K SR frame — measured to dominate frame time when the tunnel's
    host→device bandwidth dips)."""
    ramp_len = 2 * halo * scale

    def profile(offsets, t_hr, n_hr):
        w1 = _ramp(t_hr, ramp_len)
        p = np.zeros(n_hr, np.float32)
        for o in offsets:
            p[o * scale:o * scale + t_hr] += w1
        return p

    return (profile(oys, tile_h * scale, h_hr),
            profile(oxs, tile_w * scale, w_hr))


def _weight_map(oys: Sequence[int], oxs: Sequence[int], tile_h: int,
                tile_w: int, halo: int, scale: int, h_hr: int,
                w_hr: int) -> np.ndarray:
    """Accumulated blend-weight canvas (host-side reference form; the
    production path keeps the factors separate — ``_weight_profiles``)."""
    py, px = _weight_profiles(oys, oxs, tile_h, tile_w, halo, scale,
                              h_hr, w_hr)
    return np.outer(py, px)[..., None]


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w"))
def _extract_tiles_jit(lr, oys, oxs, *, tile_h, tile_w):
    return jax.vmap(lambda oy, ox: jax.lax.dynamic_slice(
        lr, (oy, ox, 0), (tile_h, tile_w, lr.shape[-1])))(oys, oxs)


def extract_tiles(lr: jnp.ndarray, tile: int, halo: int,
                  tile_w: Optional[int] = None):
    """(H, W, C) → (n_tiles, T_h, T_w, C), every tile a true sub-window
    of the frame — one compiled vmap-of-dynamic_slice per (frame shape,
    tile plan), not n_tiles eagerly dispatched slices."""
    h, w, c = lr.shape
    (tile_h, tile_w), oys, oxs = plan_tiles(h, w, tile, halo, tile_w)
    grid = [(oy, ox) for oy in oys for ox in oxs]
    oy_arr = jnp.asarray([g[0] for g in grid], jnp.int32)
    ox_arr = jnp.asarray([g[1] for g in grid], jnp.int32)
    tiles = _extract_tiles_jit(lr, oy_arr, ox_arr, tile_h=tile_h,
                               tile_w=tile_w)
    return tiles, ((tile_h, tile_w), oys, oxs)


def tiled_upscale(
        infer_fn: Callable[[jnp.ndarray], jnp.ndarray],
        lr: jnp.ndarray,
        scale: int = 4,
        tile: int = 128,
        halo: int = 8,
        tile_batch: int = 8,
        mesh: Optional[Mesh] = None,
        tile_w: Optional[int] = None,
        align: Optional[tuple] = None,
        bucket_h: Optional[int] = None,
) -> jnp.ndarray:
    """Upscale an (H, W, C) normalized LR frame by ×``scale``.

    ``infer_fn`` maps a normalized (B, T, T, C) LR batch → (B, T·r, T·r, C)
    SR batch (e.g. a jitted generator apply).  ``tile_batch`` bounds the
    on-chip working set; every ``infer_fn`` call sees the same static
    shape, so the generator compiles exactly once per (tile, tile_batch).

    Frames that fit inside one tile run whole-frame (a single ``infer_fn``
    call — exact reference semantics); larger frames use the clamped
    shift-and-blend grid, which is parity-exact at frame borders (module
    docstring).

    ``align=(align_h, align_w)`` clamps the EFFECTIVE tile sizes down to
    multiples of the given alignments when the frame exceeds them — the
    fused-kernel fast paths gate on the plane geometry (H divisible by
    the band rows, W % 128 == 0 for v9/carries/flat chaining;
    BENCHNOTES round 3), so a misaligned 200²-style detector frame that
    would otherwise run whole at a width that disables every aligned
    kernel (measured 17.8 vs 29+ MP/s) instead runs as a few
    aligned-width clamped tiles.  Zero-padding the frame was rejected:
    conv biases make a zero-padded region non-zero after the first
    layer, and that leaks back through later convs at the true frame
    border — exactly where checkpoint parity is contractual.  The
    clamped grid keeps borders exact by construction.

    ``bucket_h`` quantizes the tile height to the waste-minimizing
    multiple of ``bucket_h`` (``bucket_tile_h``): column tiling on a
    VARIABLE-height stream then reuses a bounded set of compiled shapes
    instead of compiling once per frame height, at the cost of a small
    vertical overlap when the height is not itself a multiple.  Use with
    a tall ``tile`` cap and a narrow ``tile_w`` (the serve recipe:
    ``--tile 4096 --tile_w 128 --tile_bucket 256``).

    With a ``mesh``, tiles are batch-sharded across it, so any params
    ``infer_fn`` takes as *jit arguments* must already be replicated over
    the same mesh (``jax.device_put(params, replicated(mesh))``) — mixing
    single-device params with sharded tiles is a placement error.
    Closed-over (constant) params replicate automatically.
    """
    h, w, c = lr.shape
    tile_h = tile
    tile_w = tile if tile_w is None else tile_w
    if bucket_h is not None:
        tile_h = bucket_tile_h(h, tile_h, halo, bucket_h)
    if align is not None:
        a_h, a_w = align
        eff_h, eff_w = min(tile_h, h), min(tile_w, w)
        if h > a_h and eff_h % a_h and a_h * (eff_h // a_h) > 2 * halo:
            tile_h = a_h * (eff_h // a_h)
        if w > a_w and eff_w % a_w and a_w * (eff_w // a_w) > 2 * halo:
            tile_w = a_w * (eff_w // a_w)
    tile, tile_w = tile_h, tile_w
    if h <= tile and w <= tile_w:
        return infer_fn(lr[None])[0]

    tiles, ((tile_h, tile_w), oys, oxs) = extract_tiles(lr, tile, halo,
                                                        tile_w)
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

    grid = [(oy, ox) for oy in oys for ox in oxs]
    ramp_len = 2 * halo * scale
    py, px = _weight_profiles(oys, oxs, tile_h, tile_w, halo, scale,
                              h * scale, w * scale)
    return _blend_scatter(
        sr_tiles,
        jnp.asarray(_ramp(tile_h * scale, ramp_len)),
        jnp.asarray(_ramp(tile_w * scale, ramp_len)),
        jnp.asarray(py), jnp.asarray(px),
        jnp.asarray([g[0] * scale for g in grid], jnp.int32),
        jnp.asarray([g[1] * scale for g in grid], jnp.int32),
        h_hr=h * scale, w_hr=w * scale)


@functools.partial(jax.jit, static_argnames=("h_hr", "w_hr"))
def _blend_scatter(sr_tiles, wy, wx, py, px, oys_hr, oxs_hr, *,
                   h_hr, w_hr):
    """One compiled scatter-blend for the whole frame (SURVEY.md §7 stage
    6): window-weight every tile, lax.scan a dynamic-update-slice
    accumulation over the tile grid, divide by the offset-exact weight
    map.  Replaces ~2·n_tiles eagerly dispatched host ops per frame with
    a single cached jit call per (frame shape, plan).

    The blend window and the weight map are both separable outer
    products, so only their 1-D factors (``wy``/``wx`` ramps and
    ``py``/``px`` accumulated profiles) cross the host→device boundary
    — a few KB instead of an h_hr×w_hr fp32 canvas per frame."""
    t_h, t_w, c = sr_tiles.shape[1:]
    window = (wy[:, None] * wx[None, :])[..., None]
    weighted = (sr_tiles * window).astype(jnp.float32)
    canvas = jnp.zeros((h_hr, w_hr, c), jnp.float32)

    def body(canvas, x):
        t, oy, ox = x
        patch = jax.lax.dynamic_slice(canvas, (oy, ox, 0), (t_h, t_w, c))
        return jax.lax.dynamic_update_slice(canvas, patch + t,
                                            (oy, ox, 0)), None

    canvas, _ = jax.lax.scan(body, canvas, (weighted, oys_hr, oxs_hr))
    wmap = (py[:, None] * px[None, :])[..., None]
    return canvas / jnp.maximum(wmap, 1e-8)
