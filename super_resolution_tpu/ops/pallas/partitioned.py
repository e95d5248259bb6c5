"""SPMD-partitioned fused dense block (DP over a Mesh × Pallas kernel).

A ``pallas_call`` is opaque to XLA's SPMD partitioner: under a
batch-sharded jit the partitioner's default is to all-gather the
operands and run the kernel replicated — silently destroying
data-parallel scaling.  Round 1 therefore forced ``conv_impl='lax'``
under DP.  This module closes that gap with
``jax.experimental.custom_partitioning``:

- forward (:func:`partitioned_dense_block`, and the save-acts variant
  :func:`partitioned_dense_block_fwd`): the fused block is batch-
  parallel by construction (the kernel grid's leading axis IS the
  batch), so shard x and the outputs on the batch dim, replicate
  weights/biases, run the kernel per shard — no collectives.
- backward (:func:`partitioned_dense_block_bwd`): dx is batch-parallel,
  but the weight/bias gradients are *sums over the batch*, so the
  lower_fn computes per-shard partials with the Mosaic backward kernel
  and ``lax.psum``s them over the mesh axis — exactly the gradient
  all-reduce XLA would insert for a lax conv under DP.  The Shardy
  sharding rule simply omits the batch factor from the dW/db results.

This makes ``conv_impl='pallas_cf'`` trainable under data parallelism
(train/steps._training_cfg gates it on the measured aligned-width win).
"""

from __future__ import annotations

import functools

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from super_resolution_tpu.ops.pallas.dense_block_cf import (
    fused_dense_block_cf5,
)
from super_resolution_tpu.ops.pallas.dense_block_cf_ext import (
    ext_ok,
    fused_dense_block_cf9,
)

# v9 (dy-extended) forward dispatch knob — read at TRACE time, so set it
# before the first traced call in a process (same convention as
# dense_block_cf_vjp.DMA_IN_ENABLED).  When True, forwards whose width
# passes ext_ok (W % 128 == 0: the folded training trunk and the
# 128-wide inference tiles) and whose 3× dy-extended scratch fits the
# VMEM cap run fused_dense_block_cf9 instead of v5 — one K = 3·C_k
# matmul per conv (~18% fewer K-passes).  The backward stays v5
# (v9-ification rejected on VMEM math, BENCHNOTES round 3).  Default ON
# since the round-3 on-chip campaign: +14% in-kernel over v5 (108.5
# TF/s, 57% MFU), inference 48.4 MP/s/chip, GAN 18.3 it/s with the
# carries, and the full-model on-chip grad gate passes with every knob
# combination (BENCHNOTES round-3 fifth/sixth sessions).
CF9_ENABLED = True

# The v9 scratch is (3·c_total, band_rows·W) at x.dtype.  The forward
# has no other large scratch (one accumulator, DMA semaphores), so 8 MiB
# leaves half the 16 MiB scoped-VMEM budget for outputs/operands — it
# admits both production geometries (6.2 MiB at rows=32·W=128 bf16,
# 7.96 MiB at the folded rows=8·W=384 training trunk).
_CF9_SCRATCH_CAP = 8 * 1024 * 1024


def _fwd_kernel(x, weights, rows: int, flat_h):
    """Trace-time v5/v9 forward selection (shapes are static under jit).

    Returns a callable with the shared fused-dense-block contract."""
    if not CF9_ENABLED:
        return fused_dense_block_cf5
    n_convs = len(weights)
    if flat_h is not None:
        w = x.shape[2] // (flat_h + 2 * n_convs)
    else:
        w = x.shape[3]
    if not ext_ok(w):
        return fused_dense_block_cf5
    cin = weights[0].shape[2]
    growth = weights[0].shape[3]
    c_total = cin + (n_convs - 1) * growth
    scratch = 3 * c_total * (rows + 2 * n_convs) * w * x.dtype.itemsize
    if scratch > _CF9_SCRATCH_CAP:
        return fused_dense_block_cf5
    return fused_dense_block_cf9


def _batch_axis(shardings):
    """The mesh axis the first operand (x) is batch-sharded over, if any."""
    s = shardings[0]
    if isinstance(s, NamedSharding) and len(s.spec) > 0:
        return s.spec[0]
    return None


@functools.lru_cache(maxsize=None)
def partitioned_dense_block(n_convs: int, rows: int, res_scale: float,
                            slope: float, interpret: bool = False,
                            img_w: int | None = None,
                            flat_h: int | None = None):
    """A ``custom_partitioning``-wrapped v5 fused dense block for the
    given static config.  Call as ``fn(x, *weights, *biases)``.
    With ``flat_h`` the activations are rank-3 flat padded buffers
    (dense_block_cf.fused_dense_block_cf5 flat chaining) — the batch
    axis stays leading, so the sharding logic is unchanged."""
    nd = 2 if flat_h is not None else 3        # trailing act dims

    def impl(x, *wb):
        ws = list(wb[:n_convs])
        bs = list(wb[n_convs:])
        fn = _fwd_kernel(x, ws, rows, flat_h)
        return fn(x, ws, bs, rows=rows,
                  res_scale=res_scale, slope=slope,
                  interpret=interpret, img_w=img_w,
                  flat_h=flat_h)

    f = custom_partitioning(impl)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        b = _batch_axis([a.sharding for a in arg_shapes])
        return NamedSharding(mesh, P(b, *(None,) * nd))

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis([a.sharding for a in arg_shapes])
        x_sh = NamedSharding(mesh, P(b, *(None,) * nd))
        rep = NamedSharding(mesh, P())
        arg_shardings = (x_sh,) + (rep,) * (len(arg_shapes) - 1)
        out_sharding = NamedSharding(mesh, P(b, *(None,) * nd))
        return mesh, impl, out_sharding, arg_shardings

    # Shardy-style einsum rule: only the batch factor `b` is shared
    # between x and the result, so batch sharding propagates and nothing
    # else does (H/W sharding must not — the kernel's halo logic assumes
    # whole rows; `partition` also forces x to P(b, None, ...), so any
    # stray spatial sharding is repartitioned away).  The legacy
    # GSPMD callbacks are kept for toolchains with Shardy disabled.
    xdims = " ".join(f"x{j}" for j in range(nd))
    ydims = " ".join(f"y{j}" for j in range(nd))
    operands = [f"b {xdims}"]
    operands += [f"w{k}0 w{k}1 w{k}2 w{k}3" for k in range(n_convs)]
    operands += [f"c{k}0" for k in range(n_convs)]
    rule = ", ".join(operands) + f" -> b {ydims}"

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule)
    return f


@functools.lru_cache(maxsize=None)
def partitioned_dense_block_fwd(n_convs: int, rows: int, res_scale: float,
                                slope: float, interpret: bool = False,
                                img_w: int | None = None,
                                flat_h: int | None = None):
    """Save-acts forward (custom-VJP residual producer), batch-
    partitioned: call as ``fn(x, *weights, *biases)`` →
    ``(y, a1..a{n-1})``, all batch-sharded like x."""
    nd = 2 if flat_h is not None else 3

    def impl(x, *wb):
        ws = list(wb[:n_convs])
        bs = list(wb[n_convs:])
        fn = _fwd_kernel(x, ws, rows, flat_h)
        y, acts = fn(x, ws, bs, rows=rows,
                     res_scale=res_scale, slope=slope,
                     save_acts=True,
                     interpret=interpret, img_w=img_w,
                     flat_h=flat_h)
        return (y, *acts)

    f = custom_partitioning(impl)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        b = _batch_axis([a.sharding for a in arg_shapes])
        out = NamedSharding(mesh, P(b, *(None,) * nd))
        return (out,) * n_convs

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis([a.sharding for a in arg_shapes])
        xs = NamedSharding(mesh, P(b, *(None,) * nd))
        rep = NamedSharding(mesh, P())
        return (mesh, impl, (xs,) * n_convs,
                (xs,) + (rep,) * (len(arg_shapes) - 1))

    xdims = " ".join(f"x{j}" for j in range(nd))
    operands = [f"b {xdims}"]
    operands += [f"w{k}0 w{k}1 w{k}2 w{k}3" for k in range(n_convs)]
    operands += [f"c{k}0" for k in range(n_convs)]
    results = ["b " + " ".join(f"y{j}" for j in range(nd))]
    results += ["b " + " ".join(f"a{k}{j}" for j in range(nd))
                for k in range(n_convs - 1)]
    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=", ".join(operands) + " -> " + ", ".join(results))
    return f


@functools.lru_cache(maxsize=None)
def partitioned_dense_block_bwd(n_convs: int, rows: int, res_scale: float,
                                slope: float, interpret: bool = False,
                                img_w: int | None = None,
                                flat_h: int | None = None):
    """Batch-partitioned Mosaic backward: call as
    ``fn(x, *acts, g, *weights)`` → ``(dx, dW_1..dW_n, db_1..db_n)``.
    dx comes back batch-sharded; the weight/bias grads are psum'd over
    the mesh axis inside the partition (replicated outputs)."""
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        fused_dense_block_cf5_bwd,
    )

    nd = 2 if flat_h is not None else 3
    n_arr = 1 + (n_convs - 1) + 1            # x, acts, g (batch-sharded)

    def local(x, *rest):
        acts = list(rest[:n_convs - 1])
        g = rest[n_convs - 1]
        ws = list(rest[n_convs:])
        dx, dws, dbs = fused_dense_block_cf5_bwd(
            x, acts, ws, g, rows=rows, res_scale=res_scale, slope=slope,
            interpret=interpret, img_w=img_w, flat_h=flat_h)
        return (dx, *dws, *dbs)

    f = custom_partitioning(local)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        b = _batch_axis([a.sharding for a in arg_shapes])
        rep = NamedSharding(mesh, P())
        return ((NamedSharding(mesh, P(b, *(None,) * nd)),)
                + (rep,) * (2 * n_convs))

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis([a.sharding for a in arg_shapes])
        xs = NamedSharding(mesh, P(b, *(None,) * nd))
        rep = NamedSharding(mesh, P())

        def lower(x, *rest):
            res = local(x, *rest)
            if b is None:
                return res
            dx, grads = res[0], res[1:]
            return (dx, *(jax.lax.psum(gr, axis_name=b) for gr in grads))

        return (mesh, lower,
                (xs,) + (rep,) * (2 * n_convs),
                (xs,) * n_arr + (rep,) * n_convs)

    xdims = " ".join(f"x{j}" for j in range(nd))
    operands = [f"b {xdims}"]
    operands += ["b " + " ".join(f"p{k}{j}" for j in range(nd))
                 for k in range(n_convs - 1)]
    operands += ["b " + " ".join(f"g{j}" for j in range(nd))]
    operands += [f"w{k}0 w{k}1 w{k}2 w{k}3" for k in range(n_convs)]
    results = ["b " + " ".join(f"y{j}" for j in range(nd))]
    results += [f"v{k}0 v{k}1 v{k}2 v{k}3" for k in range(n_convs)]
    results += [f"u{k}0" for k in range(n_convs)]
    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=", ".join(operands) + " -> " + ", ".join(results))
    return f
