"""Channels-first single 3×3 conv Pallas kernel (dy-in-K / dx-in-M).

The dense-block kernels (dense_block_cf.py) cover the RRDB trunk; this
kernel covers the remaining hot tail convs of RRDBNet — trunk_conv and
the post-upsample 64→64 convs at 2× and 4× resolution (upconv1/2,
hr_conv), which XLA runs at its generic conv-emitter rate.  Same geometry
as kernel v5: channels-first (C, H·W) flattened bands with W in lanes,
the three dy taps folded into K-accumulated matmuls over W-aligned lane
windows, the three dx taps packed in the matmul M dim (M = 3F) and
reduced with two masked lane rolls.  Optional fused LeakyReLU epilogue.

Gradients: :func:`conv3x3_cf` wraps the kernel in a ``jax.custom_vjp``
whose backward delegates to the lax convolution's VJP — training through
this op yields *exactly* the lax-path gradients while the forward runs
the Pallas kernel.  (The dense-block kernel has a hand-written Mosaic
backward because its fused chain saves VMEM-resident residuals; a single
conv has nothing to fuse, so the lax backward is already optimal there.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from super_resolution_tpu.ops.pallas.dense_block_cf import pack_weights_cf


def _kernel(*refs, rows, width, cout, slope, act, h_img, n_in_blocks,
            cin):
    blocks = refs[:n_in_blocks]
    w_ref, b_ref, o_ref, x_ref = refs[n_in_blocks:]
    band_row0 = pl.program_id(1) * rows

    for j, b in enumerate(blocks):
        x_ref[:, j * rows * width:(j + 1) * rows * width] = b[0]

    m_out = rows * width
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m_out), 1)
    col = lane % width

    acc = None
    for dy in range(3):
        part = x_ref[:, dy * width:dy * width + m_out]
        wdy = w_ref[dy * 3 * cout:(dy + 1) * 3 * cout, :]
        d = jnp.dot(wdy, part, preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d            # (3F, m_out)

    mid = acc[cout:2 * cout]
    left = jnp.where(col > 0, pltpu.roll(acc[0:cout], 1, 1), 0.0)
    right = jnp.where(col < width - 1,
                      pltpu.roll(acc[2 * cout:3 * cout], m_out - 1, 1),
                      0.0)
    # no row-validity mask needed: the caller zero-pads one halo row on
    # each side, and every output row of every band is in-image
    out = left + mid + right + b_ref[0][:, None]
    if act:
        out = jnp.where(out >= 0, out, slope * out)
    o_ref[:] = out[None].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "act", "slope",
                                             "out_dtype"))
def conv3x3_cf_fwd(x: jnp.ndarray, w_hwio: jnp.ndarray, bias: jnp.ndarray,
                   *, rows: int = 32, act: bool = False,
                   slope: float = 0.2, out_dtype=None) -> jnp.ndarray:
    """x: (B, C, H, W) channels-first; w: (3, 3, C, F) HWIO.
    Returns (B, F, H, W) = SAME-padded 3×3 conv (+bias, optional
    LeakyReLU)."""
    batch, cin, h, w = x.shape
    cout = w_hwio.shape[-1]
    assert h % rows == 0, (h, rows)
    n_bands = h // rows
    n_in_blocks = -(-(rows + 2) // rows)

    pad_bottom = (n_bands + n_in_blocks - 1) * rows - h - 1
    x_flat = jnp.pad(x, ((0, 0), (0, 0), (1, pad_bottom), (0, 0))) \
        .reshape(batch, cin, -1)
    wp = pack_weights_cf(w_hwio).astype(x.dtype)
    b2 = bias.reshape(1, -1).astype(jnp.float32)
    out_dtype = out_dtype or x.dtype

    kern = functools.partial(
        _kernel, rows=rows, width=w, cout=cout, slope=slope, act=act,
        h_img=h, n_in_blocks=n_in_blocks, cin=cin)

    in_block = lambda off: pl.BlockSpec(                      # noqa: E731
        (1, cin, rows * w), lambda b, i, o=off: (b, 0, i + o),
        memory_space=pltpu.VMEM)

    res = pl.pallas_call(
        kern,
        grid=(batch, n_bands),
        in_specs=[in_block(o) for o in range(n_in_blocks)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, cout, rows * w),
                               lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, cout, h * w), out_dtype),
        scratch_shapes=[pltpu.VMEM((cin, n_in_blocks * rows * w),
                                   x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * h * w * 9 * cin * cout,
            bytes_accessed=x.size * 2 + batch * cout * h * w * 2,
            transcendentals=0),
    )(*([x_flat] * n_in_blocks), wp, b2)
    return res.reshape(batch, cout, h, w)


def _lax_ref(x, w_hwio, bias, act, slope):
    # fp32 pins HIGHEST like models/rrdb.py:precision_for — the default
    # precision lowers f32 convs to reduced-precision passes and breaks
    # checkpoint parity on the odd-height fallback path
    prec = (jax.lax.Precision.HIGHEST
            if jnp.dtype(x.dtype) == jnp.float32 else None)
    y = jax.lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"), precision=prec)
    y = y + bias.astype(y.dtype)[None, :, None, None]
    return jnp.where(y >= 0, y, slope * y) if act else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_cf(x, w_hwio, bias, rows, act, slope):
    """Differentiable fused conv: Pallas forward, lax-VJP backward."""
    return conv3x3_cf_fwd(x, w_hwio, bias, rows=rows, act=act,
                          slope=slope)


def _fwd(x, w_hwio, bias, rows, act, slope):
    return conv3x3_cf(x, w_hwio, bias, rows, act, slope), \
        (x, w_hwio, bias)


def _bwd(rows, act, slope, res, g):
    x, w_hwio, bias = res
    _, vjp = jax.vjp(lambda a, b, c: _lax_ref(a, b, c, act, slope),
                     x, w_hwio, bias)
    return vjp(g.astype(x.dtype))


conv3x3_cf.defvjp(_fwd, _bwd)
