"""Pallas TPU kernel: 3×3 conv with taps packed into the MXU lane dim.

Why (SURVEY.md §7 stage 6; measured on v5e, see BENCHNOTES.md): the RRDB
dense-block convs emit only 32 output channels, so a direct conv runs the
MXU at ≤32/128 lane utilization (measured 5.6–7.9 TFLOP/s vs 24–38 for
wide convs — ~54% of generator FLOPs are stuck there).  This kernel
restructures conv3×3 as

    z = X · W_packed          # (M, C) × (C, 9F) — one matmul, N = 9F ≥ 128
    y[p] = Σ_tap z[p + δ_tap, tap]   # 9 shifted adds on the VPU (+bias,
                                     # +LeakyReLU fused)

so the matmul runs with full lanes while the cheap shift-adds ride the
VPU concurrently, and the wide ``z`` intermediate lives and dies in VMEM
(the same trick at XLA level loses — z round-trips HBM; measured).

Halo handling without overlapping blocks (Mosaic BlockSpecs cannot
overlap, and partial-lane manual DMA slices are rejected): the padded
input is partitioned into R-row blocks and passed TWICE with block row
indices i and i+1; the kernel concatenates ``cur`` with the first two
rows of ``next`` to form the (R+2)-row band.  Everything auto-pipelines.

Used for inference (the training path keeps ``lax.conv`` — no custom VJP
yet); opt-in via ``use_pallas`` plumbing with the lax path as the
always-correct fallback (tests/test_pallas.py compares both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) HWIO → (C, 9F), lane index = (dy*3+dx)*F + f."""
    k_h, k_w, c, f = w_hwio.shape
    assert (k_h, k_w) == (3, 3), w_hwio.shape
    return jnp.transpose(w_hwio, (2, 0, 1, 3)).reshape(c, 9 * f)


def _kernel(cur_ref, nxt_ref, wp_ref, b_ref, o_ref, z_ref,
            *, rows: int, width: int, wpad: int, cin: int, cout: int,
            slope: float, apply_act: bool):
    """One (batch, band) program: band = cur ++ nxt[:2] → matmul →
    9 shifted adds → bias → LeakyReLU."""
    band = jnp.concatenate([cur_ref[0], nxt_ref[0, :2]], axis=0)
    m = (rows + 2) * wpad
    z_ref[:] = jnp.dot(band.reshape(m, cin), wp_ref[:],
                       preferred_element_type=jnp.float32)

    z = z_ref[:].reshape(rows + 2, wpad, 9 * cout)
    acc = None
    for dy in range(3):
        for dx in range(3):
            k = dy * 3 + dx
            part = z[dy:dy + rows, dx:dx + width,
                     k * cout:(k + 1) * cout]
            acc = part if acc is None else acc + part
    acc = acc + b_ref[0].astype(jnp.float32)
    if apply_act:
        acc = jnp.where(acc >= 0, acc, slope * acc)
    o_ref[:] = acc[None].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("rows", "slope", "apply_act", "out_dtype"))
def packed_conv3x3(x: jnp.ndarray, w_hwio: jnp.ndarray, bias: jnp.ndarray,
                   *, rows: int = 16, slope: float = 0.2,
                   apply_act: bool = True, out_dtype=jnp.bfloat16):
    """SAME 3×3 conv (+bias, +optional LeakyReLU), NHWC.

    x: (B, H, W, C); H must be divisible by ``rows``.
    Returns (B, H, W, F) in ``out_dtype``.
    """
    batch, h, w, cin = x.shape
    cout = w_hwio.shape[-1]
    assert h % rows == 0, (h, rows)
    n_bands = h // rows

    wpad = w + 2 + ((-(w + 2)) % 8)     # sublane alignment
    # rows: 1 top pad + h + enough bottom pad to cover band n_bands-1's
    # halo read from block n_bands ((n_bands+1)*rows total rows)
    pad_bottom = (n_bands + 1) * rows - h - 1
    x_pad = jnp.pad(x, ((0, 0), (1, pad_bottom), (1, wpad - w - 1),
                        (0, 0)))
    wp = pack_weights(w_hwio).astype(x.dtype)
    bias2 = bias.reshape(1, cout).astype(jnp.float32)

    kern = functools.partial(
        _kernel, rows=rows, width=w, wpad=wpad, cin=cin, cout=cout,
        slope=slope, apply_act=apply_act)

    flops = 2 * batch * h * w * 9 * cin * cout
    return pl.pallas_call(
        kern,
        grid=(batch, n_bands),
        in_specs=[
            pl.BlockSpec((1, rows, wpad, cin), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, wpad, cin),
                         lambda b, i: (b, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # packed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (1, F)
        ],
        out_specs=pl.BlockSpec(
            (1, rows, w, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(((rows + 2) * wpad, 9 * cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 + wp.size * 2,
            transcendentals=0),
    )(x_pad, x_pad, wp, bias2)
