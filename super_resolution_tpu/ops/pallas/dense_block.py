"""Pallas TPU kernel: one fused ESRGAN dense block (5 chained 3×3 convs).

The per-conv packed-taps kernel (packed_conv.py) ties XLA's conv emitter
— the remaining levers are (a) the inter-conv HBM round trips (XLA
materializes every concat/activation; ~200 MB per dense block per
8×128² batch) and (b) per-op dispatch.  This kernel runs the whole dense
block

    x1 = lrelu(conv1(x));  x2 = lrelu(conv2([x, x1]));  ...
    y  = x + 0.2 · conv5([x, x1, x2, x3, x4])

inside one program: the input band is read from HBM once, every
intermediate lives in VMEM, and the output is written once.  Concats are
never materialized — ``conv_k(concat(parts))`` is computed as
``Σ_j dot(part_j, W_k[j-th channel slab])`` accumulated in the same
f32 z-buffer, with the packed-taps layout (N = 9F lanes) from
packed_conv.py and the shift-adds fused behind each matmul.

Chained 3×3 convs grow the halo: R output rows need R+10 input rows
(5 convs × 2).  The padded input is passed three times with block row
indices i, i+1, i+2 (R ≥ 8 ⇒ 3R ≥ R+10) and the kernel assembles the
band — the BlockSpec-overlap workaround from packed_conv.py, one block
deeper.

Numerics: matmuls accumulate f32 (MXU), activations stored bf16 (or the
input dtype), residual add in f32 — verified against the lax path to
fp32 tolerance in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from super_resolution_tpu.ops.pallas.packed_conv import pack_weights


def _conv_step(parts, z_ref, wps, bias, *, out_rows, width, wpad, cout,
               slope, act, dtype, row0, h_img):
    """One conv inside the block: parts are (rows_j, wpad, C_j) VMEM
    values whose row extents all cover [shrink .. shrink+out_rows+2);
    returns (out_rows, wpad, cout) with left/right column halo intact.

    ``row0`` is the global image row of the first output row.  Rows
    outside [0, h_img) are zeroed — chained SAME convs insert literal
    zero padding at the image boundary, NOT conv-of-padding values."""
    m = (out_rows + 2) * wpad
    acc = None
    for part, wp in zip(parts, wps):
        d = jnp.dot(part.reshape(m, part.shape[-1]), wp,
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    # z stored in the compute dtype (bf16 halves the dominant VMEM buffer;
    # the 9-tap sum below re-accumulates in f32)
    z_ref[:m, :9 * cout] = acc.astype(z_ref.dtype)

    z = z_ref[:m, :9 * cout].astype(jnp.float32).reshape(
        out_rows + 2, wpad, 9 * cout)
    out = None
    for dy in range(3):
        for dx in range(3):
            k = dy * 3 + dx
            part = z[dy:dy + out_rows, dx:dx + width,
                     k * cout:(k + 1) * cout]
            out = part if out is None else out + part
    out = out + bias
    if act:
        out = jnp.where(out >= 0, out, slope * out)
    g_row = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1, 1), 0) + row0
    out = jnp.where((g_row >= 0) & (g_row < h_img), out, 0.0)
    out = out.astype(dtype)
    # re-pad columns so the next conv sees a (rows, wpad, C) layout with
    # the same column geometry as the input band (zeros in the halo)
    return jnp.pad(out, ((0, 0), (1, wpad - width - 1), (0, 0)))


def _kernel(*refs, rows, width, wpad, cin, growth, filters, n_convs,
            res_scale, slope, h_img, n_in_blocks):
    blocks = refs[:n_in_blocks]
    wargs = refs[n_in_blocks:]
    n_w = n_convs
    w_refs = wargs[:n_w]
    b_refs = wargs[n_w:2 * n_w]
    o_ref = wargs[2 * n_w]
    z_ref = wargs[2 * n_w + 1]
    band_row0 = pl.program_id(1) * rows

    halo = n_convs  # rows of halo each side
    band = jnp.concatenate([b[0] for b in blocks],
                           axis=0)[: rows + 2 * halo]
    dtype = band.dtype

    # features[j] = (rows_j, wpad, C_j); rows_j shrinks by 2 per conv
    feats = [band]
    for k in range(n_convs):
        last = k == n_convs - 1
        cout = filters if last else growth
        wp_all = w_refs[k]          # (sum C_j, 9*cout) stacked channel slabs
        out_rows = rows + 2 * (halo - k - 1)
        # trim each part's rows to the current window: part j currently has
        # rows_j = rows + 2*(halo - j); need center out_rows + 2
        parts, wps = [], []
        off = 0
        for j, f in enumerate(feats):
            trim = (f.shape[0] - (out_rows + 2)) // 2
            parts.append(f[trim:trim + out_rows + 2])
            c_j = f.shape[-1]
            wps.append(wp_all[off:off + c_j])
            off += c_j
        out = _conv_step(parts, z_ref, wps, b_refs[k][0],
                         out_rows=out_rows, width=width, wpad=wpad,
                         cout=cout, slope=slope, act=not last, dtype=dtype,
                         row0=band_row0 - (halo - k - 1), h_img=h_img)
        feats.append(out)

    # residual: center rows of the original band
    x_center = band[halo:halo + rows, 1:1 + width, :]
    y = x_center.astype(jnp.float32) + res_scale * \
        feats[-1][:, 1:1 + width, :].astype(jnp.float32)
    o_ref[:] = y[None].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "res_scale", "slope"))
def fused_dense_block(x: jnp.ndarray,
                      weights: Sequence[jnp.ndarray],
                      biases: Sequence[jnp.ndarray],
                      *, rows: int = 16, res_scale: float = 0.2,
                      slope: float = 0.2) -> jnp.ndarray:
    """x: (B, H, W, C); weights[k]: (3, 3, C_k_in, C_k_out) HWIO with
    C_k_in = C + k·growth.  Returns x + res_scale·conv5(...)."""
    batch, h, w, cin = x.shape
    n_convs = len(weights)
    growth = weights[0].shape[-1]
    filters = weights[-1].shape[-1]
    assert h % rows == 0 and rows >= 2 * n_convs - 2, (h, rows)
    n_bands = h // rows
    halo = n_convs

    # band needs rows + 2*halo rows from consecutive R-row blocks:
    # 2 blocks suffice when rows >= 2*halo, else 3
    n_in_blocks = 2 if rows >= 2 * halo else 3
    wpad = w + 2 + ((-(w + 2)) % 8)
    pad_bottom = (n_bands + n_in_blocks - 1) * rows - h - halo
    x_pad = jnp.pad(x, ((0, 0), (halo, pad_bottom), (1, wpad - w - 1),
                        (0, 0)))

    wps = [pack_weights(wk).astype(x.dtype) for wk in weights]
    b2 = [bk.reshape(1, -1).astype(jnp.float32) for bk in biases]

    kern = functools.partial(
        _kernel, rows=rows, width=w, wpad=wpad, cin=cin, growth=growth,
        filters=filters, n_convs=n_convs, res_scale=res_scale, slope=slope,
        h_img=h, n_in_blocks=n_in_blocks)

    max_m = (rows + 2 * halo) * wpad
    max_n = 9 * max(growth, filters)
    in_block = lambda off: pl.BlockSpec(                       # noqa: E731
        (1, rows, wpad, cin), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)

    flops = 2 * batch * h * w * sum(9 * wk.shape[2] * wk.shape[3]
                                    for wk in weights)
    return pl.pallas_call(
        kern,
        grid=(batch, n_bands),
        in_specs=[in_block(o) for o in range(n_in_blocks)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_convs),
        out_specs=pl.BlockSpec((1, rows, w, filters),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, w, filters), x.dtype),
        scratch_shapes=[pltpu.VMEM((max_m, max_n), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 4, transcendentals=0),
    )(*([x_pad] * n_in_blocks), *wps, *b2)
