"""Overlap-blend tiling tests (SURVEY.md §4.3): window partition-of-unity,
tiled == whole-frame equivalence, odd sizes, mesh-sharded tiles."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.config import GeneratorConfig
from super_resolution_tpu.models import RRDBNet
from super_resolution_tpu.parallel import (
    blend_window,
    bucket_tile_h,
    make_mesh,
    plan_tiles,
    tiled_upscale,
)


@pytest.mark.fast
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
    """Clamped tiles: every window inside the frame, union covers it."""
    for h, w in [(100, 200), (33, 17), (128, 128), (1, 1)]:
        (t_h, t_w), oys, oxs = plan_tiles(h, w, 32, 4)
        assert t_h <= h or t_h == h
        cov_h = np.zeros(h, bool)
        for oy in oys:
            assert 0 <= oy <= h - t_h          # true sub-window
            cov_h[oy:oy + t_h] = True
        cov_w = np.zeros(w, bool)
        for ox in oxs:
            assert 0 <= ox <= w - t_w
            cov_w[ox:ox + t_w] = True
        assert cov_h.all() and cov_w.all()


def _small_gen():
    cfg = GeneratorConfig(n_blocks=1, filters=8, growth=4)
    g = RRDBNet(cfg)
    variables = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    fn = jax.jit(lambda x: g.apply(variables, x))
    whole = lambda img: fn(img[None])[0]
    return fn, whole


@pytest.mark.fast
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
    (t_h, t_w), oys, oxs = plan_tiles(2048, 2048, 128, 8)
    assert (t_h, t_w) == (128, 128)
    assert len(oys) == len(oxs) == 19    # ceil((2048-128)/112)+1
    assert oys[-1] == 2048 - 128         # clamped to the frame edge
    assert all(b - a <= 112 for a, b in zip(oys, oys[1:]))


def test_tiled_exact_at_frame_borders():
    """Round-2 regression (found by the verify drive): frame-BORDER
    pixels must match whole-frame inference exactly — clamped tiles mean
    the generator's own SAME zero-padding applies at the true frame edge,
    instead of round 1's reflect-padding (up to 7/255 uint8 off on the
    canonical model)."""
    fn, whole = _small_gen()
    img = jax.random.normal(jax.random.key(4), (96, 96, 3))
    ref = np.asarray(whole(img))
    out = np.asarray(tiled_upscale(fn, img, scale=4, tile=72, halo=20,
                                   tile_batch=2))
    # borders specifically (the old reflect-pad design failed exactly here)
    np.testing.assert_allclose(out[:8], ref[:8], atol=5e-4)
    np.testing.assert_allclose(out[-8:], ref[-8:], atol=5e-4)
    np.testing.assert_allclose(out[:, :8], ref[:, :8], atol=5e-4)
    np.testing.assert_allclose(out[:, -8:], ref[:, -8:], atol=5e-4)


def test_tiled_single_tile_frame_is_whole_frame():
    """Frames that fit in one tile take the whole-frame path — bit-exact
    with direct inference."""
    fn, whole = _small_gen()
    img = jax.random.normal(jax.random.key(5), (24, 30, 3))
    ref = np.asarray(whole(img))
    out = np.asarray(tiled_upscale(fn, img, scale=4, tile=128, halo=8))
    np.testing.assert_array_equal(out, ref)


def test_tiled_large_frame_smoke():
    """A 512×512 frame through the tiled path end-to-end (CPU-sized stand-
    in for the 2K case — identical code path, more tiles than tile_batch
    so chunking is exercised)."""
    fn, _ = _small_gen()
    img = jax.random.normal(jax.random.key(9), (512, 512, 3)) * 0.3
    out = tiled_upscale(fn, img, scale=4, tile=96, halo=8, tile_batch=8)
    assert out.shape == (2048, 2048, 3)
    assert bool(jnp.isfinite(out).all())


def test_plan_tiles_rectangular_and_column():
    """tile_w makes the grid rectangular; tile >= h with a narrow tile_w
    is full-height column tiling (one offset row, overlap waste on the
    x axis only)."""
    (t_h, t_w), oys, oxs = plan_tiles(200, 300, 64, 4, tile_w=40)
    assert (t_h, t_w) == (64, 40)
    assert oys[-1] == 200 - 64 and oxs[-1] == 300 - 40
    # column tiling: tile height covers the frame
    (t_h, t_w), oys, oxs = plan_tiles(100, 300, 128, 4, tile_w=48)
    assert (t_h, t_w) == (100, 48)
    assert oys == (0,)
    cov = np.zeros(300, bool)
    for ox in oxs:
        cov[ox:ox + 48] = True
    assert cov.all()


@pytest.mark.fast
def test_tiled_column_matches_whole_frame():
    """Full-height column tiling (the preferred 2K geometry — overlap
    waste on one axis only) must equal whole-frame inference like square
    tiling does."""
    fn, whole = _small_gen()
    img = jax.random.normal(jax.random.key(7), (64, 96, 3)) * 0.5
    ref = np.asarray(whole(img))
    out = np.asarray(tiled_upscale(fn, img, scale=4, tile=64, halo=20,
                                   tile_batch=2, tile_w=72))
    assert out.shape == ref.shape == (256, 384, 3)
    np.testing.assert_allclose(out, ref, atol=5e-4)
    # borders too (the clamped-grid exactness contract)
    np.testing.assert_allclose(out[:, :8], ref[:, :8], atol=5e-4)
    np.testing.assert_allclose(out[:, -8:], ref[:, -8:], atol=5e-4)


def test_tiled_rectangular_matches_square():
    """A rectangular grid (both axes tiled, tile_h != tile_w) agrees with
    the square-tile result to blend tolerance."""
    fn, _ = _small_gen()
    img = jax.random.normal(jax.random.key(8), (96, 96, 3)) * 0.5
    sq = np.asarray(tiled_upscale(fn, img, scale=4, tile=72, halo=20,
                                  tile_batch=2))
    rect = np.asarray(tiled_upscale(fn, img, scale=4, tile=72, halo=20,
                                    tile_batch=2, tile_w=64))
    np.testing.assert_allclose(rect, sq, atol=1e-3)


def test_tiled_align_clamps_effective_tiles():
    """align=(a_h, a_w) clamps the effective tile sizes to kernel-aligned
    multiples when the frame exceeds them (misaligned whole frames lose
    the aligned Pallas kernels — BENCHNOTES round-3 sixth session), and
    the result still matches whole-frame inference to blend tolerance."""
    fn, whole = _small_gen()
    # 40×56 frame, align (8, 16) → effective tiles 40×48: x-axis tiled
    img = jax.random.normal(jax.random.key(11), (40, 56, 3)) * 0.4
    ref = np.asarray(whole(img))
    out = np.asarray(tiled_upscale(fn, img, scale=4, tile=128, halo=8,
                                   tile_batch=2, align=(8, 16)))
    assert out.shape == ref.shape
    err = np.abs(out - ref)
    assert err.max() < 0.02, err.max()
    # borders exact-ish (clamped grid contract)
    np.testing.assert_allclose(out[:, :4], ref[:, :4], atol=1e-3)
    np.testing.assert_allclose(out[:, -4:], ref[:, -4:], atol=1e-3)
    # aligned frames are untouched: identical whole-frame path
    img2 = jax.random.normal(jax.random.key(12), (40, 48, 3)) * 0.4
    np.testing.assert_array_equal(
        np.asarray(tiled_upscale(fn, img2, scale=4, tile=128, halo=8,
                                 align=(8, 16))),
        np.asarray(whole(img2)))
    # frames too small to clamp (result would be <= 2*halo) run native
    img3 = jax.random.normal(jax.random.key(13), (20, 20, 3)) * 0.4
    np.testing.assert_array_equal(
        np.asarray(tiled_upscale(fn, img3, scale=4, tile=128, halo=8,
                                 align=(16, 16))),
        np.asarray(whole(img3)))


@pytest.mark.fast
def test_bucket_tile_h_planner():
    """Rate-aware height bucketing (VERDICT round-4 item 3): the planner
    minimizes estimated frame time (area over the measured height-rate
    curve), NOT area alone — so for a 2048-high frame it picks a capped
    plateau-height column instead of the full-height column the height
    sweep measured ~11-14% slower (BENCHNOTES round-4 campaign:
    704x128 b2 = 40.99 vs full-height 36.50 MP/s/chip)."""
    # h=2048 at the SHIPPED bucket (64): the planner must land on the
    # measured end-to-end winner geometry — 704-high columns beat the
    # full-height column on BOTH measured sessions (41.07 vs 38.86 and
    # 40.99 vs 36.50 MP/s/chip; BENCHNOTES round-4/5 campaigns).  This
    # is the capped choice the round-4 min-area planner forfeited.
    assert bucket_tile_h(2048, 4096, 4, 64) == 704
    assert bucket_tile_h(2048, 4096, 8, 64) == 704
    # at a COARSE bucket (256) the efficient k=3 geometry is out of
    # reach (768 pays 1.195x waste, measured 37.87 — within day
    # variance of full-height's 38.86); the planner may legitimately
    # pick either, but never the measured-loser middle heights
    t = bucket_tile_h(2048, 4096, 8, 256)
    assert t in (768, 2048), t
    # the 128-high raw-rate measurement is amortization-confounded and
    # 128-tiles measured SLOWER end-to-end (29.0 vs 31.4, round 2) —
    # the planner must not split a ~1080-row frame into nine 128-high
    # dispatches chasing it (the 128 knot sits ON the plateau)
    assert bucket_tile_h(1080, 4096, 4, 64) == 576   # two dispatches
    assert bucket_tile_h(1440, 4096, 4, 64) >= 448
    # plateau-height frames keep the true full-height column (zero
    # vertical waste, and the rate curve is flat there)
    assert bucket_tile_h(1024, 4096, 8, 256) == 1024
    assert bucket_tile_h(512, 4096, 8, 256) == 512
    # non-multiple: result is a multiple of the bucket inside the frame
    t = bucket_tile_h(2000, 4096, 8, 256)
    assert t % 256 == 0 and 0 < t <= 2000
    # the cap bounds the choice
    assert bucket_tile_h(2000, 512, 8, 256) <= 512
    # no multiple fits below the frame/cap: native fallback
    assert bucket_tile_h(100, 4096, 8, 256) == 100
    # multiples at or under 2*halo are skipped, not selected
    assert bucket_tile_h(64, 4096, 30, 32) == 64
    # short-frame fallback (round-4 ADVICE): when even the clamped cap
    # is <= 2*halo, return the original tall cap so plan_tiles clamps
    # the vertical axis whole-frame instead of raising
    assert bucket_tile_h(12, 4096, 8, 256) == 4096
    assert plan_tiles(12, 300, bucket_tile_h(12, 4096, 8, 256), 8,
                      tile_w=128)[0][0] == 12


@pytest.mark.fast
def test_bucketed_heights_bounded_shape_set():
    """The point of bucketing: a variable-height stream maps to a
    BOUNDED set of compiled tile heights (vs one shape per height)."""
    tiles = {bucket_tile_h(h, 4096, 8, 128) for h in range(900, 1100)}
    assert all(t % 128 == 0 for t in tiles)
    assert len(tiles) <= 4, tiles


def test_tiled_bucketed_matches_whole_frame():
    """bucket_h quantizes the tile height; fidelity must stay at blend
    tolerance because the grid is still clamped (no padding)."""
    fn, whole = _small_gen()
    # 100 is not a multiple of 32: vertical axis gets a bucketed grid
    img = jax.random.normal(jax.random.key(21), (100, 96, 3)) * 0.4
    ref = np.asarray(whole(img))
    out = np.asarray(tiled_upscale(fn, img, scale=4, tile=4096, halo=20,
                                   tile_batch=2, tile_w=48, bucket_h=32))
    assert out.shape == ref.shape == (400, 384, 3)
    np.testing.assert_allclose(out, ref, atol=5e-4)
    # borders stay exact-ish (clamped-grid contract)
    np.testing.assert_allclose(out[:8], ref[:8], atol=5e-4)
    np.testing.assert_allclose(out[-8:], ref[-8:], atol=5e-4)
    # exact-multiple height: true full-height columns, same fidelity
    img2 = jax.random.normal(jax.random.key(22), (96, 96, 3)) * 0.4
    ref2 = np.asarray(whole(img2))
    out2 = np.asarray(tiled_upscale(fn, img2, scale=4, tile=4096,
                                    halo=20, tile_batch=2, tile_w=48,
                                    bucket_h=32))
    np.testing.assert_allclose(out2, ref2, atol=5e-4)


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
