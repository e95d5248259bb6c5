"""Pallas TPU kernel: channels-first fused dense block, v5 (dy-in-K /
dx-in-M) — the production kernel behind ``conv_impl="pallas_cf"``.

Design (BENCHNOTES.md carries every measurement; 0.715 ms/block =
87.8 TF/s in-kernel = 46% MFU on v5e, 2.6x XLA's conv emitter per
canonical dense block):

- **Channels-first, flattened rows**: feature maps live as
  (C, rows*W) lane blocks — W in lanes means 32-channel tensors waste
  nothing, and concats along C are free outer-dim stacking.
- **Packed-K**: all feature maps accumulate into ONE growing
  (C_total, band*W) VMEM scratch, so conv k is a K = 64+32k
  contraction (healthy MXU depth) instead of per-slab K=32 passes.
- **dy-in-K**: the three row taps fold into the contraction as three
  accumulated matmuls over W-aligned lane windows of the scratch (a dy
  shift is a free aligned slice in the flattened layout).
- **dx-in-M**: only the three column taps stay packed in the matmul M
  dim (M = 3F), reduced by two masked lane rolls — 3x less post-matmul
  VPU traffic than the 9-tap packed-M form.
- **Band assembly**: the caller flattens x to (B, C, Hp*W) in XLA (free
  reshape) and the grid delivers (C, rows*W) lane blocks — a handful of
  big aligned stores per band instead of tens of per-row copies.

The superseded experiments (v3 packed-M 3D, v3b 2D-flattened, v4
packed-K, v6 dy-extended operand, v8 int8 MXU) live in
``experiments_dense_block.py`` with their measured verdicts; the
hand-written backward in v5 geometry is ``dense_block_cf_vjp.py``, and
the SPMD batch partitioning is ``partitioned.py``.

Replaces the reference family's cuDNN-backed ``nn.Conv2d`` dense blocks
(SURVEY.md §2.2 native-equivalents table) with a single fused MXU
program per block.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# bench/debug escape hatch for the DMA input-delivery path (see
# fused_dense_block_cf5); flipping it only changes how bands reach VMEM
DMA_IN_ENABLED = True

# Upward-halo carry (round-3 third session), read at TRACE time: bands
# after the first splice the previous band's already-computed activation
# rows (an intra-scratch aligned lane copy — the lane↔row mapping shifts
# by `rows` per band) and every conv then computes exactly `rows` rows
# instead of rows + 2·(halo−k−1): the per-band halo recompute disappears
# for bands > 0 (−31% trunk-fwd FLOPs at the folded rows=8 training
# geometry, −10% at rows=32 inference tiles).  The spliced rows are the
# same matmul results the band would have recomputed; the fresh rows
# come from narrower matmuls, which match the classic kernel to ~1 fp32
# ULP (bitwise at W = 128, 1-ULP interpret-mode accumulation variance
# at the folded W = 384).  Gated on DMA delivery, W % 128 == 0 (the
# splice offsets
# are multiples of W) and rows ≥ 2·(halo−1) (the carry source must lie
# inside the previous band's computed span).  Default ON since the
# round-3 on-chip campaign: the parity drill passes (grads == lax at
# the bf16 noise floor) and fwd+bwd carries together lift the GAN step
# 16.69 -> 17.93 it/s (+7.4%; 18.29 with v9 routing) while staying
# neutral-to-positive at inference rows (BENCHNOTES).
FWD_CARRY_ENABLED = True


def pack_weights_cf(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) HWIO → (9F, C): row (dy*3+dx)*F + f, col c."""
    k_h, k_w, c, f = w_hwio.shape
    assert (k_h, k_w) == (3, 3), w_hwio.shape
    return jnp.transpose(w_hwio, (0, 1, 3, 2)).reshape(9 * f, c)


# ---------------------------------------------------------------------------
# v5: dy-in-K, dx-in-M — attacks the two dominant non-MXU costs measured in
# v3b/v4 (BENCHNOTES.md):
#
#  (a) tap shift-adds: v4 packs all 9 taps into the matmul M dim, so after
#      the contraction the VPU reads 9F·win fp32 values to do the 9-way
#      shift-add.  Here the three *dy* (row) taps are folded into the
#      contraction itself as THREE accumulated matmuls over W-aligned lane
#      windows of the same feature scratch (a dy shift is a free aligned
#      slice in the flattened (C, rows·W) layout) — only the three *dx*
#      (column) taps stay packed in M (M = 3F), so the VPU shift-add
#      traffic drops 3× while the MXU pass count is unchanged (M=288→96
#      and 576→192 both sit at 75% M-tile utilization).
#  (b) band assembly: v4 flattens the input band with per-row lane stores
#      (band_rows ≈ 26–42 small (C, W) copies per band); here the caller
#      flattens x to (B, C, Hp·W) once in XLA (a free reshape) and the
#      grid delivers (C, rows·W) lane-blocks, so assembly is
#      ceil(band_rows/rows) big aligned stores.
# ---------------------------------------------------------------------------


# weight packing is pack_weights_cf unchanged — row (dy·3+dx)·F+f is
# dy-major, so the per-dy slab Wp[dy·3F:(dy+1)·3F] packs the three dx taps
# in M and the contraction accumulates over dy.


def _kernel5(*refs, rows, width, n_convs, growth, filters,
             res_scale, slope, h_img, n_in_blocks, cin, save_acts=False,
             img_w=None, flat_io=False, fwd_carry=False):
    # ``width`` is the LANE width of a row; ``img_w`` the per-image width.
    # They differ under batch-to-lane folding (g images side by side in
    # lanes so g·img_w % 128 == 0 → every dy-window slice below is
    # 128-aligned, no Mosaic relayouts at training widths like 48).  The
    # dx edge masks operate per image (col = lane % img_w), which also
    # keeps the roll from leaking pixels across fold boundaries.
    #
    # Input delivery (static, n_in_blocks == 0 ⟺ DMA): DMA mode reads
    # the band straight from the HBM-resident input into the scratch —
    # no double-buffered grid blocks, which frees enough VMEM for larger
    # rows (less halo recompute).  Needs band lanes and per-band stride
    # to be 128-multiples (always true folded / at W % 128 == 0).
    img_w = width if img_w is None else img_w
    dma_in = n_in_blocks == 0
    nb = 1 if dma_in else n_in_blocks
    blocks = refs[:nb]
    w_refs = refs[nb:nb + n_convs]
    b_refs = refs[nb + n_convs:nb + 2 * n_convs]
    o_ref = refs[nb + 2 * n_convs]
    act_refs = refs[nb + 2 * n_convs + 1:
                    nb + 2 * n_convs + n_convs] if save_acts \
        else ()
    if flat_io:
        feat_ref, in_sem, out_sems = refs[-3:]
    elif dma_in:
        feat_ref, in_sem = refs[-2:]
    else:
        feat_ref = refs[-1]
    band_row0 = pl.program_id(1) * rows

    halo = n_convs
    band_rows = rows + 2 * halo
    if dma_in:
        cp = pltpu.make_async_copy(
            blocks[0].at[pl.program_id(0), :,
                         pl.ds(pl.program_id(1) * rows * width,
                               band_rows * width)],
            feat_ref.at[pl.ds(0, cin), :],
            in_sem)
        cp.start()
        cp.wait()
        dtype = feat_ref.dtype
    else:
        # assemble the input band: nb aligned (cin, rows·W) stores
        for j, b in enumerate(blocks):
            feat_ref[0:cin,
                     j * rows * width:(j + 1) * rows * width] = b[0]
        dtype = blocks[0].dtype

    # hoisted per-kernel masks (conv 0 has the widest output window)
    m_max = (rows + 2 * (halo - 1)) * width
    lane_max = jax.lax.broadcasted_iota(jnp.int32, (1, m_max), 1)
    col_max = lane_max % img_w
    first_band = pl.program_id(1) == 0

    if fwd_carry:
        # Upward-halo carry (FWD_CARRY_ENABLED): the previous band
        # already computed every activation row this band's top halo
        # needs, but the scratch's lane↔row mapping shifted by `rows` —
        # splice them to their new lanes before any conv runs.  Slab
        # a_{k+1}'s carry is its last 2·(halo−k−1) computed rows
        # (disjoint from the destination when rows ≥ 2·(halo−1)).
        @pl.when(jnp.logical_not(first_band))
        def _splice_carry():
            for k in range(n_convs - 1):
                c0 = cin + growth * k
                nlanes = 2 * (halo - k - 1) * width
                src = (rows + k + 1) * width
                dst = (k + 1) * width
                feat_ref[c0:c0 + growth, dst:dst + nlanes] = \
                    feat_ref[c0:c0 + growth, src:src + nlanes]

    def _conv(k, coff, cout, last, row0, m_out, in_base):
        # dy taps: three accumulated matmuls over W-aligned lane windows
        acc = None
        for dy in range(3):
            part = feat_ref[0:coff,
                            in_base + dy * width:in_base + dy * width
                            + m_out]
            wdy = w_refs[k][dy * 3 * cout:(dy + 1) * 3 * cout, 0:coff]
            d = jnp.dot(wdy, part, preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d          # (3F, m_out)
        # NOTE: a bf16 epilogue (cast acc before the rolls to halve the
        # post-matmul traffic) is blocked by the toolchain: Mosaic's
        # tpu.dynamic_rotate only supports 32-bit element types
        # ("Rotate with non-32-bit data").

        # dx taps: three shift-adds (lane rolls + edge-column masks)
        col = col_max[:, :m_out]
        mid = acc[cout:2 * cout]
        left = jnp.where(col > 0, pltpu.roll(acc[0:cout], 1, 1), 0.0)
        right = jnp.where(col < img_w - 1,
                          pltpu.roll(acc[2 * cout:3 * cout],
                                     m_out - 1, 1), 0.0)
        out = left + mid + right + b_refs[k][0][:, None]
        if not last:
            out = jnp.where(out >= 0, out, slope * out)
        g_row = (lane_max[:, :m_out] // width) + row0
        out = jnp.where((g_row >= 0) & (g_row < h_img), out, 0.0)
        return out.astype(dtype)

    coff = cin
    for k in range(n_convs):
        last = k == n_convs - 1
        cout = filters if last else growth
        out_rows = rows + 2 * (halo - k - 1)
        m_out = out_rows * width
        row0 = band_row0 - (halo - k - 1)

        if last:
            # identical under the carry (halo−k−1 == 0: no shift, and
            # the a_* input rows it needs are carried+computed)
            out = _conv(k, coff, cout, True, row0, m_out, k * width)
            x_center = feat_ref[0:cin,
                                halo * width:(halo + rows) * width]
            y = x_center.astype(jnp.float32) + res_scale * \
                out.astype(jnp.float32)
            if flat_io:
                # park y in the (fully consumed) x slab's central rows;
                # the flat-output DMAs below read it from there
                feat_ref[0:cin, halo * width:(halo + rows) * width] = \
                    y.astype(feat_ref.dtype)
            else:
                o_ref[:] = y[None].astype(o_ref.dtype)
        elif fwd_carry:
            # band 0 computes the classic full span; later bands only
            # their own `rows` rows, shifted down by halo−k−1 so the
            # down-spill seeds the next band's carry
            @pl.when(first_band)
            def _full(k=k, coff=coff, cout=cout, row0=row0,
                      m_out=m_out):
                o = _conv(k, coff, cout, False, row0, m_out, k * width)
                feat_ref[coff:coff + cout,
                         (k + 1) * width:(k + 1) * width + m_out] = o

            @pl.when(jnp.logical_not(first_band))
            def _short(k=k, coff=coff, cout=cout):
                o = _conv(k, coff, cout, False,
                          band_row0 + (halo - k - 1), rows * width,
                          (2 * halo - k - 2) * width)
                feat_ref[coff:coff + cout,
                         (2 * halo - k - 1) * width:
                         (2 * halo - k - 1) * width + rows * width] = o

            if save_acts and not flat_io:
                # central rows live in the scratch either way (spliced
                # carry + fresh store)
                act_refs[k][:] = feat_ref[
                    coff:coff + cout,
                    halo * width:(halo + rows) * width][None]
            coff += cout
        else:
            out = _conv(k, coff, cout, False, row0, m_out, k * width)
            feat_ref[coff:coff + cout,
                     (k + 1) * width:(k + 1 + out_rows) * width] = out
            if save_acts and not flat_io:
                c0 = (halo - (k + 1)) * width
                act_refs[k][:] = out[:, c0:c0 + rows * width][None]
            coff += cout

    if flat_io:
        # Flat padded chaining (round 3): outputs live as
        # (B, C, (h+2·halo)·W) with image row 0 at lane halo·W — the
        # SAME layout every wrapper builds with jnp.pad before banding,
        # so consecutive dense blocks (and the Mosaic backward's
        # sources) exchange buffers with ZERO XLA pad/reshape traffic.
        # Every output's central band rows already sit at lanes
        # [halo·W, (halo+rows)·W) of its feat_ref slab (y parked in the
        # x slab; act k accumulated at window offset (k+1)·W with its
        # central rows at absolute lane halo·W), so each band is one
        # aligned DMA; the first/last bands zero the halo pad rows and
        # widen their DMA to cover them.
        is_first = pl.program_id(1) == 0
        is_last = pl.program_id(1) == pl.num_programs(1) - 1
        b_idx = pl.program_id(0)
        head = halo * width
        outs = [(o_ref, 0, cin)]
        if save_acts:
            c_act = cin
            for _k in range(n_convs - 1):
                outs.append((act_refs[_k], c_act, growth))
                c_act += growth

        @pl.when(is_first)
        def _zero_top_pad():
            for _, c0, cs in outs:
                feat_ref[c0:c0 + cs, 0:head] = jnp.zeros(
                    (cs, head), feat_ref.dtype)

        @pl.when(is_last)
        def _zero_bottom_pad():
            for _, c0, cs in outs:
                feat_ref[c0:c0 + cs, (halo + rows) * width:
                         (2 * halo + rows) * width] = jnp.zeros(
                    (cs, head), feat_ref.dtype)

        def _emit(src0, size, dst):
            copies = []
            for j, (ref, c0, cs) in enumerate(outs):
                cp = pltpu.make_async_copy(
                    feat_ref.at[pl.ds(c0, cs), pl.ds(src0, size)],
                    ref.at[b_idx, :, pl.ds(dst, size)],
                    out_sems.at[j])
                cp.start()
                copies.append(cp)
            for cp in copies:
                cp.wait()

        row0_dst = (halo + pl.program_id(1) * rows) * width

        @pl.when(jnp.logical_and(is_first, is_last))
        def _w_single():
            _emit(0, (2 * halo + rows) * width, 0)

        @pl.when(jnp.logical_and(is_first, jnp.logical_not(is_last)))
        def _w_first():
            _emit(0, (halo + rows) * width, 0)

        @pl.when(jnp.logical_and(is_last, jnp.logical_not(is_first)))
        def _w_last():
            _emit(halo * width, (halo + rows) * width, row0_dst)

        @pl.when(jnp.logical_and(jnp.logical_not(is_first),
                                 jnp.logical_not(is_last)))
        def _w_mid():
            _emit(halo * width, rows * width, row0_dst)


def flat_io_ok(h: int, w: int, rows: int, n_convs: int = 5) -> bool:
    """Whether the flat padded-chain layout is usable: DMA delivery
    alignment plus a lane-aligned halo offset ((halo·W) % 128 == 0 ⟺
    W % 128 == 0 since halo = 5 is coprime to 128)."""
    band_rows = rows + 2 * n_convs
    return ((band_rows * w) % 128 == 0 and (rows * w) % 128 == 0
            and (n_convs * w) % 128 == 0)


@functools.partial(jax.jit, static_argnames=("rows", "res_scale", "slope",
                                             "save_acts", "interpret",
                                             "img_w", "flat_h"))
def fused_dense_block_cf5(x: jnp.ndarray,
                          weights: Sequence[jnp.ndarray],
                          biases: Sequence[jnp.ndarray],
                          *, rows: int = 32, res_scale: float = 0.2,
                          slope: float = 0.2, save_acts: bool = False,
                          interpret: bool = False, img_w: int | None = None,
                          flat_h: int | None = None):
    """dy-in-K / dx-in-M fused dense block over (B, C, H, W)
    channels-first input.  With ``save_acts`` also returns the
    intermediate activations (custom-VJP residuals).

    ``img_w``: per-image width when the caller batch-folds g images
    side-by-side into the lane axis (W = g·img_w, chosen so W % 128 == 0
    at unaligned per-image widths — see models/rrdb.py fold logic); the
    dx edge masks then apply per image.  None = no fold (masks at the
    row width).

    ``flat_h``: flat padded chaining — x is (B, C, (h+2·halo)·W) with
    image row 0 at lane halo·W and ZERO pad rows, h = flat_h; the output
    (and acts) come back in the SAME layout with zeroed pads, so chained
    blocks skip the per-block jnp.pad/reshape entirely (round-3 trace:
    ~3 ms/step of pure pad/copy traffic at b16·192²).  Requires
    :func:`flat_io_ok`; elementwise residual adds between blocks keep
    the pad rows zero."""
    n_convs = len(weights)
    growth = weights[0].shape[-1]
    filters = weights[-1].shape[-1]
    halo = n_convs
    flat_io = flat_h is not None
    if flat_io:
        batch, cin, hpw = x.shape
        h = flat_h
        w = hpw // (h + 2 * halo)
        assert hpw == (h + 2 * halo) * w, (x.shape, flat_h)
        assert flat_io_ok(h, w, rows, n_convs), (h, w, rows)
        assert filters == cin, (filters, cin)
    else:
        batch, cin, h, w = x.shape
    assert h % rows == 0 and rows >= 5, (h, rows)
    n_bands = h // rows
    n_in_blocks = -(-(rows + 2 * halo) // rows)

    if flat_io:
        x_flat = x
    else:
        pad_bottom = (n_bands + n_in_blocks - 1) * rows - h - halo
        x_flat = jnp.pad(x, ((0, 0), (0, 0), (halo, pad_bottom), (0, 0))) \
            .reshape(batch, cin, -1)

    wps = [pack_weights_cf(wk).astype(x.dtype) for wk in weights]
    b2 = [bk.reshape(1, -1).astype(jnp.float32) for bk in biases]

    band_rows = rows + 2 * halo
    # DMA input delivery when lane-tile alignment allows (see _kernel5);
    # DMA_IN_ENABLED is a bench/debug escape hatch (tools/model_bench.py
    # A/B) — block delivery is always correct, just costs more VMEM
    dma_in = (DMA_IN_ENABLED and (band_rows * w) % 128 == 0
              and (rows * w) % 128 == 0)
    assert dma_in or not flat_io, (rows, w)
    # upward-halo carry: needs DMA delivery, lane-tile-aligned splice
    # offsets (multiples of w with w % 128 == 0) and a carry source
    # inside the previous band's computed span (rows ≥ 2·(halo−1))
    fwd_carry = (FWD_CARRY_ENABLED and dma_in and w % 128 == 0
                 and rows >= 2 * (halo - 1))

    kern = functools.partial(
        _kernel5, rows=rows, width=w, n_convs=n_convs,
        growth=growth, filters=filters, res_scale=res_scale, slope=slope,
        h_img=h, n_in_blocks=0 if dma_in else n_in_blocks, cin=cin,
        save_acts=save_acts, img_w=img_w, flat_io=flat_io,
        fwd_carry=fwd_carry)

    in_block = lambda off: pl.BlockSpec(                      # noqa: E731
        (1, cin, rows * w), lambda b, i, o=off: (b, 0, i + o),
        memory_space=pltpu.VMEM)

    flops = 2 * batch * h * w * sum(9 * wk.shape[2] * wk.shape[3]
                                    for wk in weights)
    c_total = cin + (n_convs - 1) * growth
    out_lanes = (h + 2 * halo) * w if flat_io else h * w
    out_shape = jax.ShapeDtypeStruct((batch, filters, out_lanes), x.dtype)
    if flat_io:
        out_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        act_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        out_spec = pl.BlockSpec((1, filters, rows * w),
                                lambda b, i: (b, 0, i),
                                memory_space=pltpu.VMEM)
        act_spec = pl.BlockSpec((1, growth, rows * w),
                                lambda b, i: (b, 0, i),
                                memory_space=pltpu.VMEM)
    out_shapes, out_specs = out_shape, out_spec
    if save_acts:
        act_shape = jax.ShapeDtypeStruct((batch, growth, out_lanes),
                                         x.dtype)
        out_shapes = [out_shape] + [act_shape] * (n_convs - 1)
        out_specs = [out_spec] + [act_spec] * (n_convs - 1)
    if dma_in:
        in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
        call_ins = [x_flat]
        feat_lanes = band_rows * w
        sem_scratch = [pltpu.SemaphoreType.DMA(())]
        if flat_io:
            n_outs = n_convs if save_acts else 1
            sem_scratch.append(pltpu.SemaphoreType.DMA((n_outs,)))
    else:
        in_specs = [in_block(o) for o in range(n_in_blocks)]
        call_ins = [x_flat] * n_in_blocks
        feat_lanes = n_in_blocks * rows * w
        sem_scratch = []
    res = pl.pallas_call(
        kern,
        grid=(batch, n_bands),
        in_specs=in_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_convs),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((c_total, feat_lanes), x.dtype)]
        + sem_scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 4, transcendentals=0),
        interpret=interpret,
    )(*call_ins, *wps, *b2)
    if flat_io:
        if save_acts:
            return res[0], list(res[1:])
        return res
    unflat = lambda a: a.reshape(batch, a.shape[1], h, w)     # noqa: E731
    if save_acts:
        return unflat(res[0]), [unflat(a) for a in res[1:]]
    return unflat(res)
