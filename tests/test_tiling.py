"""Overlap-blend tiling tests (SURVEY.md §4.3): window partition-of-unity,
tiled == whole-frame equivalence, odd sizes, mesh-sharded tiles."""

import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.config import GeneratorConfig
from super_resolution_tpu.models import RRDBNet
from super_resolution_tpu.parallel import (
    blend_window,
    make_mesh,
    plan_tiles,
    tiled_upscale,
)


def test_blend_window_partition_of_unity():
    """Adjacent windows at stride S must sum to exactly 1 in the overlap
    (SURVEY.md §5.7: 'window weights sum to 1 everywhere')."""
    tile, halo, scale = 32, 4, 2
    w = blend_window(tile, halo, scale)[..., 0]
    s_hr = (tile - 2 * halo) * scale
    acc = np.zeros((s_hr * 3 + 2 * halo * scale,))
    row = w[tile * scale // 2]              # central row, fully interior
    for i in range(3):
        acc[i * s_hr:i * s_hr + tile * scale] += row
    interior = acc[tile * scale: 2 * s_hr]  # covered by full ramps
    np.testing.assert_allclose(interior, 1.0, atol=1e-6)


def test_plan_tiles_covers_frame():
    for h, w in [(100, 200), (33, 17), (128, 128), (1, 1)]:
        n_rows, n_cols, pad_h, pad_w, stride = plan_tiles(h, w, 32, 4)
        assert n_rows * stride >= h and n_cols * stride >= w
        assert pad_h >= 4 and pad_w >= 4          # at least the halo


def _small_gen():
    cfg = GeneratorConfig(n_blocks=1, filters=8, growth=4)
    g = RRDBNet(cfg)
    variables = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    fn = jax.jit(lambda x: g.apply(variables, x))
    whole = lambda img: fn(img[None])[0]
    return fn, whole


def test_tiled_matches_whole_frame():
    """Core equivalence (SURVEY.md §4.3): with halo ≥ effective receptive
    field the blend is indistinguishable from the whole-frame result."""
    fn, whole = _small_gen()
    img = jax.random.normal(jax.random.key(1), (96, 96, 3))
    ref = np.asarray(whole(img))
    # 1-block generator: 17 convs deep ⇒ RF radius 17 px; halo 20 covers it
    out = np.asarray(tiled_upscale(fn, img, scale=4, tile=72, halo=20,
                                   tile_batch=2))
    assert out.shape == ref.shape == (384, 384, 3)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_tiled_small_halo_still_close():
    """Production halo (8 px) trades exactness for speed; error must stay
    visually negligible (the effective RF is small, SURVEY.md §5.7)."""
    fn, whole = _small_gen()
    img = jax.random.normal(jax.random.key(2), (64, 64, 3)) * 0.5
    ref = np.asarray(whole(img))
    out = np.asarray(tiled_upscale(fn, img, scale=4, tile=48, halo=8,
                                   tile_batch=4))
    err = np.abs(out - ref)
    assert err.max() < 0.02, err.max()
    assert err.mean() < 1e-3


def test_tiled_odd_sizes_and_single_tile():
    fn, whole = _small_gen()
    for h, w in [(37, 53), (16, 16), (48, 31)]:
        img = jax.random.normal(jax.random.key(3), (h, w, 3)) * 0.3
        out = tiled_upscale(fn, img, scale=4, tile=48, halo=8, tile_batch=2)
        assert out.shape == (4 * h, 4 * w, 3)
        if h <= 32 and w <= 32:   # fits one tile: must equal whole-frame
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(whole(img)), atol=5e-5)


def test_plan_tiles_2k_detector_frame():
    """BASELINE.json config 4: 2K frames.  The production plan: 128-px
    tiles with an 8-px halo → 112-px stride grid, all tiles one compiled
    shape."""
    n_rows, n_cols, pad_h, pad_w, stride = plan_tiles(2048, 2048, 128, 8)
    assert stride == 112
    assert n_rows == n_cols == 19        # ceil(2048/112)
    assert (n_rows - 1) * stride + 128 >= 2048 + 8


def test_tiled_large_frame_smoke():
    """A 512×512 frame through the tiled path end-to-end (CPU-sized stand-
    in for the 2K case — identical code path, more tiles than tile_batch
    so chunking is exercised)."""
    fn, _ = _small_gen()
    img = jax.random.normal(jax.random.key(9), (512, 512, 3)) * 0.3
    out = tiled_upscale(fn, img, scale=4, tile=96, halo=8, tile_batch=8)
    assert out.shape == (2048, 2048, 3)
    assert bool(jnp.isfinite(out).all())


def test_tiled_mesh_sharded_matches_single_device():
    """DP-of-tiles over the 8-device mesh == single-device tiling
    (SURVEY.md §2.3 SP row)."""
    fn, _ = _small_gen()
    img = jax.random.normal(jax.random.key(4), (96, 96, 3)) * 0.5
    single = np.asarray(tiled_upscale(fn, img, scale=4, tile=48, halo=8,
                                      tile_batch=2))
    mesh = make_mesh(8)
    sharded = np.asarray(tiled_upscale(fn, img, scale=4, tile=48, halo=8,
                                       tile_batch=1, mesh=mesh))
    np.testing.assert_allclose(sharded, single, atol=1e-5)
