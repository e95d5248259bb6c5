#!/usr/bin/env python
"""Per-component breakdown of the GAN train step on the real chip
(round-2 VERDICT weak #2: "D-and-tail-dominated is asserted, not
profiled").

Two modes:

- default: chained-scan timings of the step's constituent subgraphs
  (G fwd, G fwd+bwd, stem+tail-only fwd+bwd → trunk vs tail split,
  D fwd, the G-step D pass (fwd + input-grad), the D step (fwd + param
  grads), preprocessing, the two Adam updates) plus the full step —
  the component table for BENCHNOTES.md.
- --trace DIR: additionally wraps N full steps in a jax.profiler trace
  and, when the xplane parser is available, prints the top device ops.

Usage: python tools/profile_gan.py [--batch 16] [--hr 192]
       [--impl lax|pallas_cf] [--trace /tmp/gan_trace]
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
ITERS = 20


def chained(fn, x):
    """Time fn(x)->scalar with the carry feeding the next input."""
    f = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (fn((a * (1.0 + c * 1e-20)).astype(a.dtype)) * 1e-12,
                      None), 0.0, None, length=ITERS)[0])
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
    ap.add_argument("--hr", type=int, default=192)
    ap.add_argument("--impl", default="lax")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--trace_steps", type=int, default=10)
    ap.add_argument("--cf9", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="route aligned-width fused forwards through "
                         "the dy-extended v9 kernel "
                         "(ops/pallas/partitioned.CF9_ENABLED)")
    ap.add_argument("--bwd_cap", type=int, default=None,
                    help="override dense_block_cf_vjp."
                         "BWD_LANE_CAP_ALIGNED")
    ap.add_argument("--fwd_carry", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="enable the fused forward's upward-halo carry "
                         "(ops/pallas/dense_block_cf.FWD_CARRY_ENABLED)")
    ap.add_argument("--bwd_carry", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="enable the Mosaic backward's halo-recompute "
                         "carry (ops/pallas/dense_block_cf_vjp."
                         "BWD_CARRY_ENABLED)")
    args = ap.parse_args()
    if args.fwd_carry is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf
        dense_block_cf.FWD_CARRY_ENABLED = args.fwd_carry
    if args.cf9 is not None:
        from super_resolution_tpu.ops.pallas import partitioned
        partitioned.CF9_ENABLED = args.cf9
    if args.bwd_cap is not None or args.bwd_carry is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf_vjp
        if args.bwd_cap is not None:
            dense_block_cf_vjp.BWD_LANE_CAP_ALIGNED = args.bwd_cap
        if args.bwd_carry is not None:
            dense_block_cf_vjp.BWD_CARRY_ENABLED = args.bwd_carry

    import dataclasses

    from super_resolution_tpu.config import (
        DataConfig,
        DiscriminatorConfig,
        GeneratorConfig,
        LossConfig,
        preset,
    )
    from super_resolution_tpu.data.augment import preprocess_batch
    from super_resolution_tpu.losses import (
        feature_matching_loss,
        ragan_discriminator_loss,
        ragan_generator_loss,
    )
    from super_resolution_tpu.models import Discriminator, RRDBNet
    from super_resolution_tpu.train import init_state, make_gan_step
    from super_resolution_tpu.train.state import make_optimizer

    cfg = dataclasses.replace(
        preset("train_gan"),
        generator=GeneratorConfig(conv_impl=args.impl),
        data=DataConfig(hr_patch=args.hr, batch_size=args.batch),
        loss=LossConfig(perceptual_source="d_features",
                        lambda_percep=1.0),
        warmup_batches=0,
    )
    dtype = jnp.bfloat16
    lr_hw = args.hr // 4
    rng = np.random.RandomState(0)
    hr_u8 = jnp.asarray(rng.randint(
        0, 256, (args.batch, args.hr, args.hr, 3), dtype=np.uint8))
    lr = jnp.asarray(rng.randn(args.batch, lr_hw, lr_hw, 3)
                     .astype(np.float32))
    hr = jnp.asarray(rng.randn(args.batch, args.hr, args.hr, 3)
                     .astype(np.float32))

    state = init_state(cfg)
    g = RRDBNet(cfg.generator, dtype=dtype)
    g0 = RRDBNet(dataclasses.replace(cfg.generator, n_blocks=0),
                 dtype=dtype)
    p0 = g0.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))["params"]
    d = Discriminator(cfg.discriminator, dtype=dtype)
    d_vars = {"params": state.d_params, "batch_stats": state.d_stats}
    opt_g = make_optimizer(cfg.optim_g)
    opt_d = make_optimizer(cfg.optim_d)

    gp, dp = state.g_params, state.d_params
    rows = []

    def add(name, t):
        rows.append((name, t))
        print(f"{name:34s} {t * 1e3:8.2f} ms", flush=True)

    # --- components ---
    add("preprocess (aug+bicubic+norm)",
        chained(lambda b: jnp.sum(preprocess_batch(
            jax.random.key(0), (b * 255).astype(jnp.uint8),
            cfg.data)["lr"].astype(jnp.float32)) * 1e-6,
            hr_u8.astype(jnp.float32) / 255.0))

    add("G fwd", chained(
        lambda x: jnp.sum(g.apply({"params": gp}, x)) * 1e-6, lr))

    def g_l2(x, params, net):
        y = net.apply({"params": params}, x)
        return jnp.sum((y - hr.astype(y.dtype)).astype(jnp.float32) ** 2)

    t_g_full = chained(lambda x: jnp.sum(jax.grad(
        lambda p: g_l2(x, p, g))(gp)["conv_first"]["kernel"]), lr)
    add("G fwd+bwd (L2)", t_g_full)
    t_g_tail = chained(lambda x: jnp.sum(jax.grad(
        lambda p: g_l2(x, p, g0))(p0)["conv_first"]["kernel"]), lr)
    add("  stem+tail-only fwd+bwd", t_g_tail)
    add("  => 23-block trunk fwd+bwd", t_g_full - t_g_tail)

    add("D fwd (train mode)", chained(
        lambda x: jnp.sum(d.apply(d_vars, x, train=True,
                                  mutable=["batch_stats"])[0]) * 1e-6,
        hr))

    # the G-step D pass: two D fwds + backward w.r.t. the sr INPUT
    # (adv + feature-matching terms), params frozen
    def g_side_d(x):
        def loss(sr):
            (pr, fr), _ = d.apply(d_vars, hr.astype(sr.dtype), train=True,
                                  mutable=["batch_stats"],
                                  return_features=True)
            (pf, ff), _ = d.apply(d_vars, sr, train=True,
                                  mutable=["batch_stats"],
                                  return_features=True)
            return (5e-3 * ragan_generator_loss(pr, pf)
                    + feature_matching_loss(ff, fr))
        return jnp.sum(jax.grad(loss)(x).astype(jnp.float32))

    add("G-step D pass (2 fwd + d/d_sr bwd)", chained(g_side_d, hr))

    # the D step: two fwds + param grads
    def d_step(x):
        def loss(params):
            dv = {"params": params, "batch_stats": state.d_stats}
            pr, st = d.apply(dv, hr.astype(x.dtype), train=True,
                             mutable=["batch_stats"])
            pf, _ = d.apply({"params": params,
                             "batch_stats": st["batch_stats"]}, x,
                            train=True, mutable=["batch_stats"])
            return ragan_discriminator_loss(pr, pf)
        gr = jax.grad(loss)(dp)
        return jnp.sum(gr["conv0_0"]["kernel"].astype(jnp.float32))

    add("D step (2 fwd + param bwd)", chained(d_step, hr))

    gopt_state = opt_g.init(gp)
    zeros_g = jax.tree.map(jnp.zeros_like, gp)

    def adam_g(x):
        up, _ = opt_g.update(zeros_g, gopt_state, gp)
        return jnp.sum(up["conv_first"]["kernel"]) + jnp.sum(x) * 0.0

    add("Adam update (G tree)", chained(adam_g, lr))
    dopt_state = opt_d.init(dp)
    zeros_d = jax.tree.map(jnp.zeros_like, dp)

    def adam_d(x):
        up, _ = opt_d.update(zeros_d, dopt_state, dp)
        return jnp.sum(up["conv0_0"]["kernel"]) + jnp.sum(x) * 0.0

    add("Adam update (D tree)", chained(adam_d, lr))

    # --- full step (host-chained via the state dependency) ---
    step = make_gan_step(cfg)
    st = state
    st, m = step(st, hr_u8)
    float(jax.device_get(m["psnr"]))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        st, m = step(st, hr_u8)
    float(jax.device_get(m["psnr"]))
    t_full = (time.perf_counter() - t0) / n
    print(f"{'FULL GAN step':34s} {t_full * 1e3:8.2f} ms "
          f"({1 / t_full:.2f} it/s)", flush=True)
    acc = sum(t for name, t in rows if not name.startswith(" "))
    print(f"{'sum of components':34s} {acc * 1e3:8.2f} ms", flush=True)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(args.trace_steps):
            st, m = step(st, hr_u8)
        float(jax.device_get(m["psnr"]))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
