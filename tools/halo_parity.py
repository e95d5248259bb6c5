#!/usr/bin/env python
"""Measure tiled-vs-whole-frame error as a function of halo width.

The tiling halo trades overlap-recompute waste for fidelity: stride =
tile − 2·halo, so at the 128-wide column geometry halo=8 costs 1.1875×
waste on a 2048² frame where halo=4 would cost 1.0625× (BENCHNOTES
round-4 geometry campaign).  Whether halo=4 is admissible is an
*empirical question about the trained model's effective receptive
field* — random-init RRDBNets (residual scaling 0.2) have a much
shorter effective RF than the ~350-conv theoretical one, and trained
weights can differ from both.  This probe answers it for a REAL
checkpoint: whole-frame SR vs tiled SR at each candidate halo, max and
mean abs error in [0,1] output space plus the uint8-LSB view the
parity contract is written in.

Usage:
  python tools/halo_parity.py --checkpoint /tmp/srdemo_r4/ck [--frame 256]
  JAX_PLATFORMS=cpu python tools/halo_parity.py --checkpoint x.pth ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from super_resolution_tpu.compile_cache import (            # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import numpy as np                                            # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help=".pth or orbax checkpoint dir (trained weights "
                         "— the point of the probe)")
    ap.add_argument("--frame", type=int, default=256,
                    help="square LR frame side; must exceed the tile "
                         "so the grid actually tiles")
    ap.add_argument("--tile_w", type=int, default=64,
                    help="column width (frame-height columns)")
    ap.add_argument("--halos", default="2,4,6,8,12")
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="float32 isolates RF truncation from rounding")
    ap.add_argument("--conv_impl", default=None,
                    help="override (default: lax on CPU, auto elsewhere)")
    ap.add_argument("--val_dir", default=None,
                    help="instead of a synthetic frame, measure the "
                         "contract-level statement on real images: "
                         "PSNR-vs-ground-truth of whole-frame vs tiled "
                         "SR at each halo (images are treated as HR, "
                         "LR = PIL-parity bicubic ÷scale)")
    ap.add_argument("--weights", default="auto",
                    choices=("auto", "ema", "raw"),
                    help="which tree of an orbax checkpoint to probe: "
                         "'auto' (default) applies the same EMA "
                         "maturity gate as the inference CLI, so the "
                         "measured halo certifies the weights serving "
                         "will ACTUALLY load; 'ema'/'raw' force a tree")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.checkpoint import restore_generator_params
    from super_resolution_tpu.config import DataConfig
    from super_resolution_tpu.data import normalize
    from super_resolution_tpu.models import RRDBNet
    from super_resolution_tpu.parallel import tiled_upscale

    if args.checkpoint.endswith(".pth"):
        from super_resolution_tpu.import_torch import (
            import_generator,
            load_pth,
        )
        params, gcfg = import_generator(load_pth(args.checkpoint))
    else:
        from super_resolution_tpu.import_torch import (
            infer_generator_cfg_from_params,
        )

        # probe the tree inference will actually load: 'auto' applies
        # the maturity gate exactly like cli eval/upscale/serve (a halo
        # certified for the EMA of an immature checkpoint would be
        # stamped for weights the CLI never serves — round-5 review)
        from super_resolution_tpu.config import TrainConfig

        kw = {"auto": {"ema_decay": TrainConfig().ema_decay},
              "ema": {},
              "raw": {"prefer_ema": False}}[args.weights]
        g_params, _step = restore_generator_params(args.checkpoint, **kw)
        gcfg = infer_generator_cfg_from_params(g_params)
        params = {"params": g_params}
    impl = args.conv_impl or (
        "lax" if jax.default_backend() == "cpu" else "auto")
    gcfg = __import__("dataclasses").replace(gcfg, conv_impl=impl)

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    model = RRDBNet(gcfg, dtype=dtype)
    infer = jax.jit(lambda x: model.apply(params, x))

    dc = DataConfig()

    if args.val_dir:
        from super_resolution_tpu.data import denormalize, list_images
        from super_resolution_tpu.metrics import psnr01 as psnr_fn
        from super_resolution_tpu.ops import bicubic_downsample
        from super_resolution_tpu.train.evaluate import _load_image

        halos = [int(h) for h in args.halos.split(",")]
        acc = {("whole", None): []}
        acc.update({("tiled", h): [] for h in halos})
        for path in list_images(args.val_dir):
            hr01 = _load_image(path)
            s = gcfg.scale
            h, w = (hr01.shape[0] // s) * s, (hr01.shape[1] // s) * s
            hr01 = jnp.asarray(hr01[:h, :w])
            lrn = normalize(bicubic_downsample(hr01, s),
                            dc.normalize_mean, dc.normalize_std)

            def score(srn):
                sr01 = jnp.clip(denormalize(srn, dc.normalize_mean,
                                            dc.normalize_std), 0.0, 1.0)
                return float(psnr_fn(sr01, hr01))

            acc[("whole", None)].append(score(infer(lrn[None])[0]))
            for halo in halos:
                acc[("tiled", halo)].append(score(tiled_upscale(
                    infer, lrn, scale=s, tile=h // s,
                    tile_w=args.tile_w, halo=halo, tile_batch=1)))
        ref = float(np.mean(acc[("whole", None)]))
        print(f"[halo] val_dir={args.val_dir}: whole-frame "
              f"psnr_rgb={ref:.4f} dB "
              f"({len(acc[('whole', None)])} images, {args.dtype}, {impl})")
        for halo in halos:
            v = float(np.mean(acc[("tiled", halo)]))
            print(f"[halo] halo={halo:2d} tile_w={args.tile_w}: "
                  f"psnr_rgb={v:.4f} dB  delta_vs_whole={v - ref:+.4f} dB")
        return

    rng = np.random.RandomState(0)
    # structured content (edges + gradients), not white noise — error
    # concentrates at edges, and white noise has no trained statistics
    gy, gx = np.mgrid[0:args.frame, 0:args.frame].astype(np.float32)
    img = np.stack([gx, gy, (gx + gy) / 2], -1) / args.frame
    img += 0.25 * np.sin(gx[..., None] / 3.1) * np.cos(gy[..., None] / 4.7)
    img = np.clip(img + rng.rand(args.frame, args.frame, 3) * 0.05, 0, 1)
    x = jnp.asarray(normalize(img.astype(np.float32),
                              dc.normalize_mean, dc.normalize_std))

    whole = np.asarray(infer(x[None])[0], np.float32)
    std = np.asarray(dc.normalize_std, np.float32)
    print(f"[halo] frame {args.frame}² whole-frame reference computed "
          f"({args.dtype}, {impl})")
    for halo in (int(h) for h in args.halos.split(",")):
        tiled = np.asarray(
            tiled_upscale(infer, x, scale=gcfg.scale, tile=args.frame,
                          tile_w=args.tile_w, halo=halo, tile_batch=1),
            np.float32)
        err01 = np.abs(tiled - whole) * std   # de-normalized [0,1] space
        stride = args.tile_w - 2 * halo
        import math
        k = math.ceil((args.frame - args.tile_w) / stride) + 1
        waste = k * args.tile_w / args.frame
        # the deployment-relevant view: how far the tiled output sits
        # from the whole-frame output in PSNR terms (max-LSB is an
        # outlier statistic; a 50+ dB tiled-vs-whole PSNR moves any
        # PSNR-vs-ground-truth number by <0.01 dB)
        psnr_vs_whole = -10.0 * np.log10(np.mean(err01 ** 2) + 1e-30)
        print(f"[halo] halo={halo:2d} (waste {waste:.4f}x at "
              f"tile_w={args.tile_w}): max={err01.max():.2e} "
              f"mean={err01.mean():.2e} "
              f"uint8_lsb_max={np.ceil(err01.max() * 255):.0f} "
              f"psnr_vs_whole={psnr_vs_whole:.2f}dB")


if __name__ == "__main__":
    main()
