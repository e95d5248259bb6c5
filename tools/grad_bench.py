#!/usr/bin/env python
"""On-chip fwd+bwd microbench for the fused dense block at training
geometry — lax autodiff vs the Mosaic custom VJP, unfolded vs
batch-to-lane folded (models/rrdb._fold_factor).

Uses an L2-style loss so the cotangent is real (grad-of-sum lets XLA
simplify the lax backward — the round-2 measurement trap, CLAUDE.md).
Chained scan + scalar device_get per BENCHNOTES methodology.

Usage: python tools/grad_bench.py [--batch 16] [--h 48] [--w 48]
       [--variants lax,kernel,kernel_fold]
"""

import argparse
import math
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
ITERS = 20


def time_fn(fn, x):
    f = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (fn((a * (1.0 + c)).astype(a.dtype)) * 1e-12, None),
        0.0, None, length=ITERS)[0])
    jax.device_get(f(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        best = min(best, time.perf_counter() - t0)
    return max(best - TUNNEL_FLOOR_S, 1e-9) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--h", type=int, default=48)
    ap.add_argument("--w", type=int, default=48)
    ap.add_argument("--variants", default="lax,kernel,kernel_fold")
    ap.add_argument("--rows", type=int, default=0,
                    help="override band rows (0 = auto)")
    ap.add_argument("--bwd_cap", type=int, default=None,
                    help="override dense_block_cf_vjp."
                         "BWD_LANE_CAP_ALIGNED")
    ap.add_argument("--bwd_carry", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="enable the Mosaic backward's halo-recompute "
                         "carry (ops/pallas/dense_block_cf_vjp."
                         "BWD_CARRY_ENABLED)")
    args = ap.parse_args()
    if args.bwd_cap is not None or args.bwd_carry is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf_vjp as v
        if args.bwd_cap is not None:
            v.BWD_LANE_CAP_ALIGNED = args.bwd_cap
        if args.bwd_carry is not None:
            v.BWD_CARRY_ENABLED = args.bwd_carry

    from super_resolution_tpu.models.rrdb import _fold_factor, _pick_rows
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    B, H, W = args.batch, args.h, args.w
    C, G = 64, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32)
                    ).astype(jnp.bfloat16)
    tgt = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    ws, bs = [], []
    cin = C
    for k in range(5):
        co = C if k == 4 else G
        ws.append(jnp.asarray(rng.randn(3, 3, cin, co).astype(np.float32)
                              * 0.05).astype(jnp.bfloat16))
        bs.append(jnp.asarray(rng.randn(co).astype(np.float32) * 0.05))
        if k < 4:
            cin += co
    # fwd ~2 NCHW·9·Cin·Cout; bwd ≈ 2x fwd
    flops = 3 * 2 * B * H * W * sum(9 * w.shape[2] * w.shape[3]
                                    for w in ws)

    def lax_block(x):
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

    g = _fold_factor(B, W)
    c_total = C + 4 * G

    def fold(a):
        b_, c_, h_, w_ = a.shape
        return jnp.transpose(a.reshape(b_ // g, g, c_, h_, w_),
                             (0, 2, 3, 1, 4)).reshape(
            b_ // g, c_, h_, g * w_)

    def unfold(a):
        b_, c_, h_, gw = a.shape
        w_ = gw // g
        return jnp.transpose(a.reshape(b_, c_, h_, g, w_),
                             (0, 3, 1, 2, 4)).reshape(b_ * g, c_, h_, w_)

    grads = {}
    for name in args.variants.split(","):
        if name == "lax":
            def loss(x):
                return jnp.sum((lax_block(x).astype(jnp.float32)
                                - tgt) ** 2)
        elif name == "kernel":
            rows = args.rows or _pick_rows(H, W, c_total=c_total)

            def loss(x, rows=rows):
                y = dense_block_cf_train(x, ws, bs, rows, 0.2, 0.2, None)
                return jnp.sum((y.astype(jnp.float32) - tgt) ** 2)
        elif name == "kernel_fold":
            if g == 1:
                print(f"{name:12s}: no fold exists for B={B} W={W}")
                continue
            rows = args.rows or _pick_rows(H, g * W, c_total=c_total)
            if rows is None:
                print(f"{name:12s}: folded plane fails _pick_rows")
                continue

            def loss(x, rows=rows):
                y = dense_block_cf_train(fold(x), ws, bs, rows, 0.2, 0.2,
                                         W)
                return jnp.sum((unfold(y).astype(jnp.float32)
                                - tgt) ** 2)
        else:
            raise SystemExit(f"unknown variant {name}")

        vg = jax.grad(loss)
        try:
            t = time_fn(lambda a: jnp.sum(vg(a).astype(jnp.float32)), x)
            grads[name] = jax.device_get(vg(x)).astype(np.float32)
            err = ""
            if "lax" in grads and name != "lax":
                d = float(np.abs(grads[name] - grads["lax"]).max())
                err = f"  dx maxerr vs lax {d:.2e}"
            print(f"{name:12s}: {t * 1e3:7.3f} ms  "
                  f"{flops / t / 1e12:6.1f} TF/s (fwd+bwd){err}",
                  flush=True)
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
