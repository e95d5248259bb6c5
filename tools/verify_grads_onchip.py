#!/usr/bin/env python
"""On-chip gradient parity drill: full-model kernel-vs-lax grads.

Round 3 found an XLA TPU miscompile class that is INVISIBLE off-chip:
the backward wrapper's vectorized overlap-add produced NaN dx rows on
real hardware while interpret mode and the CPU backend were bit-correct
(BENCHNOTES round 3, "the dx overlap-add").  CPU tests therefore cannot
close a Pallas-training change; this drill is the on-chip gate.

It builds the canonical 23-block RRDBNet at the requested training
shape, computes L1-pretrain gradients through `conv_impl=lax` and
`conv_impl=pallas_cf` (whatever `_training_cfg` routes to — printed),
and asserts loss equality, finite grads, and a leafwise relative-diff
bound consistent with the kernel's bf16 matmul floor.

Usage: python tools/verify_grads_onchip.py [--batch 16] [--hr 192]
       [--tol 0.02]
Exit code 0 = parity holds.  Run after ANY Pallas kernel/VJP change,
alongside the CPU suite.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from super_resolution_tpu.compile_cache import (            # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()   # warm re-runs skip the TPU compile

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402


def grads_for(impl, batch_u8, cfg_base):
    import dataclasses

    from super_resolution_tpu.config import GeneratorConfig
    from super_resolution_tpu.losses import l1_loss
    from super_resolution_tpu.train import init_state
    from super_resolution_tpu.train.state import build_models
    from super_resolution_tpu.train.steps import _prep, _training_cfg

    cfg = dataclasses.replace(
        cfg_base, generator=GeneratorConfig(conv_impl=impl),
        donate_buffers=False)
    cfg = _training_cfg(cfg)
    print(f"{impl} -> training impl: {cfg.generator.conv_impl}",
          flush=True)
    state = init_state(cfg)
    g, _, _ = build_models(cfg)

    @jax.jit
    def grads_of(params, hr_uint8):
        _, lr, hr = _prep(state, hr_uint8, cfg)

        def loss_fn(p):
            sr = g.apply({"params": p}, lr)
            return l1_loss(sr, hr)

        return jax.value_and_grad(loss_fn)(params)

    loss, gr = grads_of(state.g_params, batch_u8)
    gr = jax.device_get(gr)
    gn = float(jnp.sqrt(sum(
        np.sum(np.square(np.asarray(a, np.float32)))
        for a in jax.tree.leaves(gr))))
    print(f"{impl}: loss={float(loss):.6f} gnorm={gn:.4g}", flush=True)
    return float(loss), gr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hr", type=int, default=192)
    ap.add_argument("--tol", type=float, default=0.02,
                    help="max leafwise relative grad diff (bf16 matmul "
                         "floor observed ~0.006 at b16x192²)")
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
        from super_resolution_tpu.ops.pallas import dense_block_cf_vjp
        dense_block_cf_vjp.BWD_CARRY_ENABLED = args.bwd_carry

    if args.cf9 is not None:
        from super_resolution_tpu.ops.pallas import partitioned
        partitioned.CF9_ENABLED = args.cf9
    if args.bwd_cap is not None:
        from super_resolution_tpu.ops.pallas import dense_block_cf_vjp
        dense_block_cf_vjp.BWD_LANE_CAP_ALIGNED = args.bwd_cap

    import dataclasses

    from super_resolution_tpu.config import DataConfig, preset

    cfg_base = dataclasses.replace(
        preset("pretrain_psnr"),
        data=DataConfig(hr_patch=args.hr, batch_size=args.batch))

    rng = np.random.RandomState(0)
    batch_u8 = jnp.asarray(rng.randint(
        0, 256, (args.batch, args.hr, args.hr, 3), dtype=np.uint8))

    loss_l, gl = grads_for("lax", batch_u8, cfg_base)
    loss_k, gk = grads_for("pallas_cf", batch_u8, cfg_base)

    assert abs(loss_l - loss_k) < 1e-4, (loss_l, loss_k)

    worst = 0.0
    worst_path = None
    n_nonfinite = 0
    for (pth, al), (_, ak) in zip(
            jax.tree_util.tree_leaves_with_path(gl),
            jax.tree_util.tree_leaves_with_path(gk)):
        al = np.asarray(al, np.float32)
        ak = np.asarray(ak, np.float32)
        n_nonfinite += int((~np.isfinite(ak)).sum())
        rd = float(np.linalg.norm(ak - al)
                   / (np.linalg.norm(al) + 1e-12))
        if rd > worst:
            worst, worst_path = rd, jax.tree_util.keystr(pth)
    print(f"worst leaf reldiff: {worst:.4g} at {worst_path}; "
          f"non-finite kernel grad elements: {n_nonfinite}")
    assert n_nonfinite == 0, n_nonfinite
    assert worst <= args.tol, (worst, worst_path)
    print("ON-CHIP GRAD PARITY: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
