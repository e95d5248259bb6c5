#!/usr/bin/env python
"""Full-model A/B bench over kernel-variant combinations.

Monkeypatches the variant seams (which fused dense-block kernel the
custom-VJP forward uses; whether the tail convs take the Pallas kernel
or lax) and times the canonical 23-block ×4 model with the bench.py
chained-scan methodology.  Diagnostic tool — product behavior is
configured only via GeneratorConfig.conv_impl.

Usage: python tools/model_bench.py [--variants v5+ktail,v5+laxtail,...]
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

TILE, BATCH, ITERS = 128, 8, 10
TUNNEL_FLOOR_S = 0.025


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="lax,v4+laxtail,v5+laxtail,v4+ktail,v5+ktail")
    ap.add_argument("--fwd_carry", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="enable the fused forward's upward-halo carry "
                         "(ops/pallas/dense_block_cf.FWD_CARRY_ENABLED)")
    ap.add_argument("--tile", type=int, default=TILE,
                    help="LR side length (default %(default)s)")
    ap.add_argument("--tile_w", type=int, default=None,
                    help="LR width if different from --tile "
                         "(rectangular probes, e.g. the 2048x128 "
                         "column-tiling shape)")
    ap.add_argument("--batch", type=int, default=BATCH,
                    help="batch size (default %(default)s)")
    ap.add_argument("--iters", type=int, default=ITERS,
                    help="chained forwards per timed call")
    args = ap.parse_args()
    tile, batch, iters = args.tile, args.batch, args.iters
    tile_w = args.tile_w if args.tile_w is not None else tile
    if args.fwd_carry is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf
        dense_block_cf.FWD_CARRY_ENABLED = args.fwd_carry

    from super_resolution_tpu.config import GeneratorConfig
    from super_resolution_tpu.models import RRDBNet
    from super_resolution_tpu.ops.pallas import (
        conv_cf,
        dense_block_cf,
        experiments_dense_block,
        partitioned,
    )

    params = jax.jit(RRDBNet(GeneratorConfig(conv_impl="lax"),
                             dtype=jnp.bfloat16).init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    x = jax.random.normal(jax.random.key(1), (batch, tile, tile_w, 3),
                          jnp.float32)

    # the inference primal resolves the kernel through partitioned.py's
    # module-level binding (the custom_partitioning impl closures look it
    # up at call time), so that is the patch seam
    orig_fwd = partitioned.fused_dense_block_cf5
    orig_conv = conv_cf.conv3x3_cf

    def lax_tail_conv(x, w, b, rows, act, slope):
        return conv_cf._lax_ref(x, w, b, act, slope)

    for variant in args.variants.split(","):
        # "prod": the pure shipping configuration — GeneratorConfig
        # defaults (conv_impl="auto") with whatever knob defaults ship;
        # no monkeypatching, so it measures exactly what bench.py and
        # the CLI run.
        impl = ("lax" if variant == "lax"
                else "auto" if variant == "prod" else "pallas_cf")
        if "+" in variant:
            block, tail = variant.split("+")
            def adapt(fn):
                # cf3/cf6 lack the interpret kwarg of cf5's signature
                def wrapped(x, ws, bs, *, rows, res_scale, slope,
                            save_acts=False, interpret=False):
                    assert not save_acts
                    return fn(x, ws, bs, rows=rows, res_scale=res_scale,
                              slope=slope)
                return wrapped

            from super_resolution_tpu.ops.pallas import dense_block_cf_ext

            partitioned.fused_dense_block_cf5 = {
                "v4": adapt(experiments_dense_block.fused_dense_block_cf3),
                "v5": dense_block_cf.fused_dense_block_cf5,
                "v6": adapt(experiments_dense_block.fused_dense_block_cf6),
                "v9": dense_block_cf_ext.fused_dense_block_cf9}[block]
            partitioned.partitioned_dense_block.cache_clear()
            conv_cf.conv3x3_cf = (orig_conv if tail == "ktail"
                                  else lax_tail_conv)
        model = RRDBNet(GeneratorConfig(conv_impl=impl),
                        dtype=jnp.bfloat16)

        def chained(params, x):
            def body(c, _):
                y = model.apply(params, x * (1.0 + c))
                return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
            return jax.lax.scan(body, 0.0, None, length=iters)[0]

        f = jax.jit(chained)
        try:
            t0 = time.perf_counter()
            jax.device_get(f(params, x))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(f(params, x))
                best = min(best, time.perf_counter() - t0)
            per_batch = max(best - TUNNEL_FLOOR_S, 1e-9) / iters
            mp_s = batch * (tile * 4) * (tile_w * 4) / 1e6 / per_batch
            print(f"{variant:12s}: {per_batch * 1e3:6.1f} ms/batch  "
                  f"{mp_s:6.2f} MP/s  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{variant:12s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            partitioned.fused_dense_block_cf5 = orig_fwd
            partitioned.partitioned_dense_block.cache_clear()
            conv_cf.conv3x3_cf = orig_conv


if __name__ == "__main__":
    main()
