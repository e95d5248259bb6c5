#!/usr/bin/env python
"""On-chip microbenchmark for the fused dense-block kernel variants.

Chained-scan methodology (BENCHNOTES.md "scan-hoisting trap"): the carry
feeds the next input so XLA cannot hoist the body; sync via device_get of
a scalar (block_until_ready does not block through the axon tunnel).

Usage: python tools/kernel_bench.py [--rows 32] [--batch 8] [--hw 128]
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

TUNNEL_FLOOR_S = 0.025
ITERS = 30


def time_fn(fn, *args):
    f = jax.jit(lambda *a: jax.lax.scan(
        lambda c, _: (jnp.sum(fn((a[0] * (1.0 + c)).astype(a[0].dtype),
                                 *a[1:]).astype(
            jnp.float32)) * 1e-12, None), 0.0, None, length=ITERS)[0])
    jax.device_get(f(*args))          # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - TUNNEL_FLOOR_S, 1e-9) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--variants", default="lax,v3b,v4,v5")
    ap.add_argument("--rows", default="16,32")
    ap.add_argument("--fwd_carry", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="enable the fused forward's upward-halo carry "
                         "(ops/pallas/dense_block_cf.FWD_CARRY_ENABLED)")
    args = ap.parse_args()
    if args.fwd_carry is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf
        dense_block_cf.FWD_CARRY_ENABLED = args.fwd_carry

    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        fused_dense_block_cf5,
    )
    from super_resolution_tpu.ops.pallas.dense_block_cf_ext import (
        fused_dense_block_cf9,
    )
    from super_resolution_tpu.ops.pallas.experiments_dense_block import (
        fused_dense_block_cf2,
        fused_dense_block_cf3,
        fused_dense_block_cf6,
        fused_dense_block_cf8,
    )

    B, H = args.batch, args.hw
    C, G = 64, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C, H, H).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ws, bs = [], []
    cin = C
    for k in range(5):
        co = C if k == 4 else G
        ws.append(jnp.asarray(rng.randn(3, 3, cin, co).astype(np.float32)
                              * 0.05).astype(jnp.bfloat16))
        bs.append(jnp.asarray(rng.randn(co).astype(np.float32) * 0.05))
        if k < 4:
            cin += co
    flops = 2 * B * H * H * sum(9 * w.shape[2] * w.shape[3] for w in ws)

    def lax_block(x, ws, bs):
        h = jnp.transpose(x, (0, 2, 3, 1))
        feats = h
        out = h
        for k, (w, b) in enumerate(zip(ws, bs)):
            out = (jax.lax.conv_general_dilated(
                feats, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
                + b.astype(x.dtype)).astype(x.dtype)
            if k < 4:
                out = jnp.where(out >= 0, out, 0.2 * out)
                feats = jnp.concatenate([feats, out], -1)
        return jnp.transpose(h + 0.2 * out, (0, 3, 1, 2))

    ref = None
    for name in args.variants.split(","):
        if name == "lax":
            t = time_fn(lax_block, x, ws, bs)
            y = lax_block(x, ws, bs)
            print(f"lax        : {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")
            ref = y
            continue
        fn = {"v3b": fused_dense_block_cf2, "v4": fused_dense_block_cf3,
              "v5": fused_dense_block_cf5,
              "v6": fused_dense_block_cf6,
              "v8": fused_dense_block_cf8,
              "v9": fused_dense_block_cf9}[name]
        for rows in (int(r) for r in args.rows.split(",")):
            if H % rows:
                continue
            try:
                t = time_fn(lambda xx: fn(xx, ws, bs, rows=rows), x)
                y = fn(x, ws, bs, rows=rows)
                err = (float(jnp.abs(y.astype(jnp.float32)
                                     - ref.astype(jnp.float32)).max())
                       if ref is not None else float("nan"))
                print(f"{name} rows={rows:2d}: {t * 1e3:7.3f} ms  "
                      f"{flops / t / 1e12:6.1f} TF/s  maxerr {err:.1e}")
            except Exception as e:
                print(f"{name} rows={rows:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
