#!/usr/bin/env python
"""GAN / pretrain train-step throughput on the real chip (BASELINE.json
tracked metric: "GAN train iters/sec").

Times the full jitted step (G fwd + D fwds + both grads + two Adam
updates for GAN; G fwd+grad+Adam for pretrain) on a synthetic uint8
batch.  The step's state->state dependency chains iterations naturally,
so a host loop over N steps with one final scalar fetch measures true
sustained throughput (no scan-hoisting risk; the ~25 ms tunnel sync
floor amortizes over N).

Usage: python tools/train_bench.py [--step gan|pretrain]
       [--impls lax,pallas_cf] [--batch 16] [--hr 192] [--steps 30]
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
    ap.add_argument("--step", default="gan", choices=("gan", "pretrain"))
    ap.add_argument("--impls", default="lax,pallas_cf")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hr", type=int, default=192)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--tail_up", default="naive",
                    choices=("polyphase", "naive"))
    ap.add_argument("--dedup", action="store_true",
                    help="cfg.dedup_d_hr: one D(hr) forward per GAN "
                         "step (train/steps._dedup_gan_step)")
    ap.add_argument("--cf9", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="route aligned-width fused forwards through "
                         "the dy-extended v9 kernel "
                         "(ops/pallas/partitioned.CF9_ENABLED)")
    ap.add_argument("--bwd_cap", type=int, default=None,
                    help="override dense_block_cf_vjp."
                         "BWD_LANE_CAP_ALIGNED (e.g. 4608 admits "
                         "rows=12 at the folded W=384 geometry)")
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
    if args.bwd_carry is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf_vjp as v
        v.BWD_CARRY_ENABLED = args.bwd_carry

    if args.cf9 is not None:
        from super_resolution_tpu.ops.pallas import partitioned
        partitioned.CF9_ENABLED = args.cf9
    if args.bwd_cap is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf_vjp
        dense_block_cf_vjp.BWD_LANE_CAP_ALIGNED = args.bwd_cap

    import dataclasses

    from super_resolution_tpu.config import (
        DataConfig,
        GeneratorConfig,
        LossConfig,
        preset,
    )
    from super_resolution_tpu.train import (
        init_state,
        make_gan_step,
        make_pretrain_step,
    )

    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randint(
        0, 256, (args.batch, args.hr, args.hr, 3), dtype=np.uint8))

    for impl in args.impls.split(","):
        cfg = dataclasses.replace(
            preset("train_gan" if args.step == "gan" else "pretrain_psnr"),
            generator=GeneratorConfig(conv_impl=impl, tail_up=args.tail_up),
            data=DataConfig(hr_patch=args.hr, batch_size=args.batch),
            loss=LossConfig(perceptual_source="d_features",
                            lambda_percep=1.0),
            warmup_batches=0,
            dedup_d_hr=args.dedup,
        )
        make_step = (make_gan_step if args.step == "gan"
                     else make_pretrain_step)
        try:
            state = init_state(cfg)
            step = make_step(cfg)
            t0 = time.perf_counter()
            state, metrics = step(state, batch)
            float(jax.device_get(metrics["psnr"]))
            print(f"{impl:10s} compile+first: "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = step(state, batch)
            float(jax.device_get(metrics["psnr"]))
            dt = (time.perf_counter() - t0) / args.steps
            mp = args.batch * args.hr * args.hr / 1e6
            print(f"{impl:10s} {args.step}: {1.0 / dt:6.2f} it/s  "
                  f"({dt * 1e3:.1f} ms/step, {mp / dt:.2f} MP/s HR, "
                  f"batch {args.batch}x{args.hr}²)", flush=True)
        except Exception as e:
            print(f"{impl:10s} FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
