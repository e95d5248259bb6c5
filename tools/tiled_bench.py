#!/usr/bin/env python
"""End-to-end large-frame tiled-inference benchmark (BASELINE.json
config 4: 2K detector frames via overlap-blend tiling).

Times the FULL production path on-device — reflect-pad + jitted tile
extraction → batched generator forwards (one compiled shape) → jitted
scatter-blend → analytic weight-map divide — and syncs by fetching one
scalar (the SR mean): through the axon tunnel `block_until_ready` does
not block and bulk fetches run at ~15 MB/s (BENCHNOTES.md), so the 8K
output must stay on device.

Usage: python tools/tiled_bench.py [--frame 2048] [--tile_w 128] [--halo 4]
(defaults = the measured-winner HEIGHT-CAPPED column geometry the
rate-aware planner picks: bucket_h 64 → 704-high 128-wide columns,
batch 2, halo 4 — 41.07 MP/s/chip on the 2048² flagship path vs 38.86
for the round-4 full-height column and 31.24 for square 384/b2,
BENCHNOTES round-5 completion sweep.  These are also the CLI's
fused-path defaults (cli._resolve_tile_geometry).  halo=4 fidelity is
gated per-checkpoint by tools/halo_parity.py / the export-time stamp:
on the round-4 trained GAN checkpoint tiled output sits 60 dB from
whole-frame and +0.0015 dB on PSNR-vs-GT.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from super_resolution_tpu.compile_cache import (            # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()   # warm re-runs skip the TPU compile

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", type=int, default=2048,
                    help="LR frame size (square unless --frame_h)")
    ap.add_argument("--frame_h", type=int, default=None,
                    help="LR frame height when different from --frame "
                         "(misaligned/variable-height stream probes)")
    ap.add_argument("--bucket_h", type=int, default=64,
                    help="height-bucketed column planning "
                         "(tiled_upscale bucket_h / CLI --tile_bucket): "
                         "quantize the tile height to rate-aware "
                         "multiples of this.  Default 64 — the planner "
                         "picks the measured-winner 704-high capped "
                         "columns on a 2048 frame (41.07 MP/s/chip, "
                         "BENCHNOTES round 5); 0 disables bucketing "
                         "(tile = --tile or frame height)")
    ap.add_argument("--tile", type=int, default=None,
                    help="tile height cap (default: frame height; the "
                         "rate-aware --bucket_h planner caps it to the "
                         "measured plateau)")
    ap.add_argument("--tile_w", type=int, default=128,
                    help="rectangular tiles; --tile >= frame height with "
                         "a narrow --tile_w = full-height column tiling "
                         "(overlap waste on one axis only). 128 admits "
                         "the kernel's best rows/v9 geometry")
    ap.add_argument("--halo", type=int, default=4,
                    help="LR overlap half-width. 4 is the measured "
                         "flagship value (38.9 vs 34.6 MP/s at halo=8, "
                         "BENCHNOTES round 4) and is fidelity-gated by "
                         "tools/halo_parity.py on trained weights "
                         "(+0.0015 dB vs whole-frame on the round-4 "
                         "GAN checkpoint); the CLI ships the more "
                         "conservative 8 for arbitrary checkpoints")
    ap.add_argument("--tile_batch", type=int, default=2,
                    help="2 for the capped 704-row columns (two in "
                         "flight hide dispatch gaps: 41.07 vs 40.15 at "
                         "b1; b3 LOSES to HBM pressure, 38.27 — "
                         "BENCHNOTES round 5.  Full-height columns "
                         "prefer 1: a 2048-row column is already 256 "
                         "pipeline bands)")
    ap.add_argument("--conv_impl", default="pallas_cf")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--decompose", action="store_true",
                    help="additionally time the pipeline stages in "
                         "isolation (extract / infer / blend) to "
                         "attribute the end-to-end vs raw-rate gap")
    ap.add_argument("--fwd_cap", type=int, default=None,
                    help="override models.rrdb.FWD_LANE_CAP (e.g. 5120 "
                         "admits rows=16 at W=384 — re-probing the VMEM "
                         "margin in the pure-inference context)")
    ap.add_argument("--cf9", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="route aligned-width fused forwards through "
                         "the dy-extended v9 kernel "
                         "(ops/pallas/partitioned.CF9_ENABLED)")
    ap.add_argument("--fwd_carry", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="enable the fused forward's upward-halo carry "
                         "(ops/pallas/dense_block_cf.FWD_CARRY_ENABLED)")
    args = ap.parse_args()
    frame_h = args.frame_h if args.frame_h is not None else args.frame
    if args.tile is None:
        args.tile = frame_h
    if args.bucket_h == 0:
        args.bucket_h = None
    if args.fwd_carry is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf
        dense_block_cf.FWD_CARRY_ENABLED = args.fwd_carry

    if args.fwd_cap is not None:
        from super_resolution_tpu.models import rrdb
        rrdb.FWD_LANE_CAP = args.fwd_cap

    if args.cf9 is not None:
        from super_resolution_tpu.ops.pallas import partitioned
        partitioned.CF9_ENABLED = args.cf9

    from super_resolution_tpu.config import GeneratorConfig
    from super_resolution_tpu.models import RRDBNet
    from super_resolution_tpu.parallel import tiled_upscale

    cfg = GeneratorConfig(conv_impl=args.conv_impl)
    model = RRDBNet(cfg, dtype=jnp.bfloat16)
    params = jax.jit(RRDBNet(GeneratorConfig(conv_impl="lax"),
                             dtype=jnp.bfloat16).init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    infer = jax.jit(lambda p, x: model.apply(p, x))

    rng = np.random.RandomState(0)
    lr = jax.device_put(jnp.asarray(
        rng.rand(frame_h, args.frame, 3).astype(np.float32)))

    def run():
        sr = tiled_upscale(lambda x: infer(params, x), lr, scale=cfg.scale,
                           tile=args.tile, halo=args.halo,
                           tile_batch=args.tile_batch, tile_w=args.tile_w,
                           bucket_h=args.bucket_h)
        return float(jax.device_get(jnp.mean(sr)))   # scalar sync

    t0 = time.perf_counter()
    run()
    print(f"[tiled] compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    if args.decompose:
        # Re-run the pipeline stage by stage (same code paths the
        # production tiled_upscale dispatches) and time each with the
        # scalar-sync methodology, so the end-to-end residual over the
        # raw kernel rate decomposes into extract / infer / blend.
        from super_resolution_tpu.parallel.tiling import (
            _blend_scatter, _ramp, _weight_profiles, extract_tiles,
        )

        def timed(fn, reps=args.reps):
            fn()   # warm (stage jits are cached from the e2e runs)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        eff_tile = args.tile
        if args.bucket_h is not None:
            from super_resolution_tpu.parallel import bucket_tile_h

            eff_tile = bucket_tile_h(frame_h, args.tile, args.halo,
                                     args.bucket_h)
        tiles, ((t_h, t_w), oys, oxs) = extract_tiles(
            lr, eff_tile, args.halo, args.tile_w)
        n_tiles = tiles.shape[0]
        group = args.tile_batch
        n_pad = (-n_tiles) % group
        if n_pad:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((n_pad,) + tiles.shape[1:],
                                  tiles.dtype)])
        tiles = jax.block_until_ready(tiles)

        def extract_only():
            t, _ = extract_tiles(lr, eff_tile, args.halo, args.tile_w)
            return float(jax.device_get(jnp.mean(t[-1, -1, -1])))

        def infer_only():
            chunks = [infer(params, tiles[s:s + group])
                      for s in range(0, tiles.shape[0], group)]
            return float(jax.device_get(jnp.mean(chunks[-1][-1, -1, -1])))

        sr_tiles = jnp.concatenate(
            [infer(params, tiles[s:s + group])
             for s in range(0, tiles.shape[0], group)])[:n_tiles]
        sr_tiles = jax.block_until_ready(sr_tiles)
        grid = [(oy, ox) for oy in oys for ox in oxs]
        h_hr, w_hr = frame_h * cfg.scale, args.frame * cfg.scale
        ramp_len = 2 * args.halo * cfg.scale
        py, px = _weight_profiles(oys, oxs, t_h, t_w, args.halo,
                                  cfg.scale, h_hr, w_hr)
        blend_args = (sr_tiles,
                      jnp.asarray(_ramp(t_h * cfg.scale, ramp_len)),
                      jnp.asarray(_ramp(t_w * cfg.scale, ramp_len)),
                      jnp.asarray(py), jnp.asarray(px),
                      jnp.asarray([g[0] * cfg.scale for g in grid],
                                  jnp.int32),
                      jnp.asarray([g[1] * cfg.scale for g in grid],
                                  jnp.int32))

        def blend_only():
            out = _blend_scatter(*blend_args, h_hr=h_hr, w_hr=w_hr)
            return float(jax.device_get(jnp.mean(out[-1, -1])))

        for name, fn in (("extract", extract_only),
                         ("infer", infer_only),
                         ("blend", blend_only)):
            print(f"[tiled] stage {name:8s}: {timed(fn):.3f} s")

    out_mp = frame_h * args.frame * cfg.scale ** 2 / 1e6
    tw = args.tile if args.tile_w is None else args.tile_w
    print(f"[tiled] {args.frame}x{frame_h} LR -> "
          f"{args.frame * cfg.scale}x{frame_h * cfg.scale} SR "
          f"({args.conv_impl}, tile={args.tile}x{tw} "
          f"halo={args.halo} batch={args.tile_batch}"
          + (f" bucket_h={args.bucket_h}" if args.bucket_h else "")
          + f"): {best:.3f} s/frame = {out_mp / best:.2f} MP/s/chip")


if __name__ == "__main__":
    main()
