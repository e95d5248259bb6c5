"""Custom VJP for the packed-K channels-first fused dense block (v4).

Round-1 left training pinned to the lax conv path because the Pallas
kernels defined no VJP (train/steps.py forced ``conv_impl='lax'``); this
module closes that gap with a hand-written Mosaic *backward* kernel, so
the fused forward also runs under ``jax.grad``.

Backward math, all in the same channels-first flattened-band layout as
the forward (dense_block_cf.py):

- forward conv k: ``z = Wp_k · feats`` (taps packed in M), 9 tap
  shift-adds, LeakyReLU; backward therefore *scatters* the incoming
  cotangent into a (9F, window·W) buffer with the reverse shifts
  (dy → lane-window placement, dx → opposite-direction lane rolls with
  the mirrored edge masks), then
- ``dW_k  = dz ·_P feats^T``  — one matmul contracting the pixel axis
  (K = thousands, MXU-healthy), and
- ``dfeats += Wp_k^T ·_{9F} dz`` — one matmul with K = 9F = 288.
- LeakyReLU gradient uses the saved activation sign (``a >= 0`` ⟺
  ``z >= 0``), and the forward's out-of-image row masking back-propagates
  as a row mask on the cotangent.

Band halos: the forward recomputes halo rows per band, so the gradient
w.r.t. the input carries per-band contributions that overlap ±halo rows
across band boundaries.  The kernel writes each band's *widened* input
gradient disjointly ((B, n_bands, C, band_rows, W)); the wrapper
overlap-adds the bands — a handful of XLA adds.

Weight/bias gradients accumulate across the sequential TPU grid into
constant-index output blocks (zeroed on the first grid step — the
standard Pallas accumulation pattern).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from super_resolution_tpu.ops.pallas.dense_block_cf import (
    fused_dense_block_cf3,
    fused_dense_block_cf5,
    pack_weights_cf,
)


def unpack_weight_grad(dw9: jnp.ndarray) -> jnp.ndarray:
    """(9F, C) packed-layout gradient → (3, 3, C, F) HWIO (the inverse of
    :func:`pack_weights_cf`)."""
    nine_f, c = dw9.shape
    f = nine_f // 9
    return jnp.transpose(dw9.reshape(3, 3, f, c), (0, 1, 3, 2))


def _kernel3_bwd(*refs, rows, width, n_convs, growth, filters,
                 res_scale, slope, h_img, n_in_blocks, cin):
    nb = n_in_blocks
    n_srcs = n_convs              # x + a1..a4
    src_blocks = [refs[j * nb:(j + 1) * nb] for j in range(n_srcs)]
    g_ref = refs[n_srcs * nb]
    w_refs = refs[n_srcs * nb + 1:n_srcs * nb + 1 + n_convs]
    outs = refs[n_srcs * nb + 1 + n_convs:
                n_srcs * nb + 1 + n_convs + 1 + 2 * n_convs]
    o_dx, o_dws, o_dbs = outs[0], outs[1:1 + n_convs], outs[1 + n_convs:]
    feat_ref, dfeat_ref, dz_ref, gflat_ref = refs[-4:]

    band_row0 = pl.program_id(1) * rows
    halo = n_convs
    band_rows = rows + 2 * halo
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        for r in list(o_dws) + list(o_dbs):
            r[:] = jnp.zeros_like(r)

    # ---- assemble feats (x | a1 | a2 | a3 | a4) and the flat cotangent
    offs = [0] + [cin + growth * j for j in range(n_convs - 1)]
    for j, blocks in enumerate(src_blocks):
        c0 = offs[j]
        cs = cin if j == 0 else growth
        n = 0
        for b in blocks:
            for r in range(rows):
                if n < band_rows:
                    feat_ref[c0:c0 + cs, n * width:(n + 1) * width] = \
                        b[0, :, r, :]
                n += 1
    for r in range(rows):
        gflat_ref[:, r * width:(r + 1) * width] = \
            g_ref[0, :, r, :].astype(jnp.float32)

    dfeat_ref[:] = jnp.zeros_like(dfeat_ref)
    # residual identity: dx central += g
    dfeat_ref[0:cin, halo * width:(halo + rows) * width] = gflat_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, band_rows * width), 1) \
        % width

    for k in range(n_convs - 1, -1, -1):
        last = k == n_convs - 1
        cout = filters if last else growth
        out_rows = rows + 2 * (halo - k - 1)
        m_out = out_rows * width
        win = (out_rows + 2) * width
        c_in_k = cin + growth * k
        row0 = band_row0 - (halo - k - 1)

        if last:
            dout = gflat_ref[:] * res_scale            # (F, rows·W) f32
        else:
            sl = slice(cin + growth * k, cin + growth * (k + 1))
            lanes = slice((k + 1) * width, (k + 1) * width + m_out)
            da = dfeat_ref[sl, lanes]
            a = feat_ref[sl, lanes]
            dz_pre = da * jnp.where(a >= 0, 1.0, slope)
            g_row = (jax.lax.broadcasted_iota(
                jnp.int32, (1, m_out), 1) // width) + row0
            dout = jnp.where((g_row >= 0) & (g_row < h_img), dz_pre, 0.0)

        o_dbs[k][:] += jnp.sum(dout, axis=1)[None, :]

        # scatter dout into the (9F, win) dz buffer with reverse shifts
        dz_ref[0:9 * cout, 0:win] = jnp.zeros((9 * cout, win),
                                              dz_ref.dtype)
        colm = col[:, :m_out]
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                slab = dout
                if dx == 0:      # fwd rolled right & zeroed col 0
                    slab = jnp.where(colm < width - 1,
                                     pltpu.roll(slab, m_out - 1, 1), 0.0)
                elif dx == 2:    # fwd rolled left & zeroed last col
                    slab = jnp.where(colm > 0, pltpu.roll(slab, 1, 1), 0.0)
                dz_ref[t * cout:(t + 1) * cout,
                       dy * width:dy * width + m_out] = \
                    slab.astype(dz_ref.dtype)

        part = feat_ref[0:c_in_k, k * width:k * width + win]
        dzv = dz_ref[0:9 * cout, 0:win]
        # dW: contract the pixel axis (K = win, MXU-deep)
        o_dws[k][:] += jax.lax.dot_general(
            dzv, part, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dfeats: contract the packed-tap axis (K = 9F)
        dpart = jax.lax.dot_general(
            w_refs[k][:], dzv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        lanes_in = slice(k * width, k * width + win)
        dfeat_ref[0:c_in_k, lanes_in] = \
            dfeat_ref[0:c_in_k, lanes_in] + dpart

    o_dx[:] = dfeat_ref[0:cin, :].reshape(1, 1, cin, band_rows, width)


@functools.partial(jax.jit, static_argnames=("rows", "res_scale", "slope"))
def fused_dense_block_cf3_bwd(x, acts, weights, g, *, rows: int,
                              res_scale: float, slope: float):
    """Backward of :func:`fused_dense_block_cf3`: returns
    ``(dx, [dW_k HWIO], [db_k])`` given the saved activations."""
    batch, cin, h, w = x.shape
    n_convs = len(weights)
    growth = weights[0].shape[-1]
    filters = weights[-1].shape[-1]
    assert h % rows == 0, (h, rows)
    n_bands = h // rows
    halo = n_convs
    n_in_blocks = -(-(rows + 2 * halo) // rows)
    band_rows = rows + 2 * halo
    c_total = cin + (n_convs - 1) * growth

    pad_bottom = (n_bands + n_in_blocks - 1) * rows - h - halo
    pad = lambda a: jnp.pad(                                  # noqa: E731
        a, ((0, 0), (0, 0), (halo, pad_bottom), (0, 0)))
    srcs = [pad(x)] + [pad(a) for a in acts]
    wps = [pack_weights_cf(wk).astype(x.dtype) for wk in weights]

    kern = functools.partial(
        _kernel3_bwd, rows=rows, width=w, n_convs=n_convs, growth=growth,
        filters=filters, res_scale=res_scale, slope=slope, h_img=h,
        n_in_blocks=n_in_blocks, cin=cin)

    def in_block(chans, off):
        return pl.BlockSpec((1, chans, rows, w),
                            lambda b, i, o=off: (b, 0, i + o, 0),
                            memory_space=pltpu.VMEM)

    in_specs = []
    for j in range(n_convs):
        chans = cin if j == 0 else growth
        in_specs += [in_block(chans, o) for o in range(n_in_blocks)]
    in_specs.append(pl.BlockSpec((1, cin, rows, w),
                                 lambda b, i: (b, 0, i, 0),
                                 memory_space=pltpu.VMEM))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_convs

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct(
        (batch, n_bands, cin, band_rows, w), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1, cin, band_rows, w),
                              lambda b, i: (b, i, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    for k in range(n_convs):
        cout = filters if k == n_convs - 1 else growth
        out_shapes.append(jax.ShapeDtypeStruct(
            (9 * cout, cin + growth * k), jnp.float32))
        out_specs.append(const)
    for k in range(n_convs):
        cout = filters if k == n_convs - 1 else growth
        out_shapes.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
        out_specs.append(const)

    flops = 2 * 2 * batch * h * w * sum(9 * wk.shape[2] * wk.shape[3]
                                        for wk in weights)
    res = pl.pallas_call(
        kern,
        grid=(batch, n_bands),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c_total, band_rows * w), x.dtype),      # feats
            pltpu.VMEM((c_total, band_rows * w), jnp.float32),  # dfeats
            pltpu.VMEM((9 * max(filters, growth), band_rows * w),
                       x.dtype),                                # dz
            pltpu.VMEM((filters, rows * w), jnp.float32),       # g flat
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 8, transcendentals=0),
    )(*[s for src in srcs for s in [src] * n_in_blocks], g, *wps)

    dxw = res[0]
    dw9s = res[1:1 + n_convs]
    dbs = [b[0] for b in res[1 + n_convs:]]

    # overlap-add the widened per-band input gradients (halo rows of
    # neighboring bands both contribute to the same input rows)
    h_pad = (n_bands + n_in_blocks - 1) * rows
    dx_pad = jnp.zeros((batch, cin, h_pad + halo, w), jnp.float32)
    for i in range(n_bands):
        dx_pad = jax.lax.dynamic_update_slice(
            dx_pad,
            jax.lax.dynamic_slice(
                dx_pad, (0, 0, i * rows, 0),
                (batch, cin, band_rows, w)) + dxw[:, i],
            (0, 0, i * rows, 0))
    dx = dx_pad[:, :, halo:halo + h].astype(x.dtype)
    dws = [unpack_weight_grad(d) for d in dw9s]
    return dx, dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dense_block_cf_train(x, weights, biases, rows, res_scale, slope):
    """Differentiable fused dense block: Pallas forward AND backward.
    ``weights``/``biases`` are lists; grads flow to all three inputs.
    Forward is kernel v5 (dy-in-K/dx-in-M — the fastest measured variant,
    BENCHNOTES.md); the backward kernel consumes only the saved
    (x, weights, activations) residuals, so it is forward-agnostic."""
    return fused_dense_block_cf5(x, list(weights), list(biases), rows=rows,
                                 res_scale=res_scale, slope=slope)


def _train_fwd(x, weights, biases, rows, res_scale, slope):
    y, acts = fused_dense_block_cf5(x, list(weights), list(biases),
                                    rows=rows, res_scale=res_scale,
                                    slope=slope, save_acts=True)
    return y, (x, tuple(weights), tuple(acts))


def _train_bwd(rows, res_scale, slope, residuals, g):
    x, weights, acts = residuals
    dx, dws, dbs = fused_dense_block_cf3_bwd(
        x, list(acts), list(weights), g, rows=rows, res_scale=res_scale,
        slope=slope)
    # cotangent dtypes must match the primal inputs (weights may be bf16)
    dws = [d.astype(w.dtype) for d, w in zip(dws, weights)]
    dbs = [db.astype(jnp.float32) for db in dbs]
    return dx, list(dws), dbs


dense_block_cf_train.defvjp(_train_fwd, _train_bwd)
