"""Pallas TPU kernel: dy-EXTENDED channels-first fused dense block (v9).

v5 (dense_block_cf.py) folds the three dy (row) taps of each 3×3 conv
into the contraction as THREE accumulated matmuls over W-aligned lane
windows of one feature scratch.  v9 removes the 3-way split by keeping
the scratch in *dy-extended* form: every feature slab is stored three
times, pre-shifted by (dy−1)·W lanes, laid out segment-major with dy
inner ([x·dy0 | x·dy1 | x·dy2 | a1·dy0 | a1·dy1 | a1·dy2 | …]), so
conv k is ONE matmul with K = 3·C_k over a single contiguous window:

- **~18% fewer MXU K-passes** at canonical channel counts
  (K = 192/288/384/480/576 → 2/3/3/4/5 K-tiles vs v5's
  3×(1/1/1/2/2) = 3/3/3/6/6), and one f32 accumulator instead of a
  3-way add chain.
- v6 (experiments_dense_block.py) built the same extended operand by
  COPYING the three dy windows per conv — measured a wash (the copies
  repaid the K-pass saving, BENCHNOTES round 2).  v9 builds it at
  *write* time instead: each activation store is issued three times at
  lane offsets (k+2−dy)·W — two extra (growth, m_out) stores per conv
  versus v6's (3·C_k, m_out)-sized copies, ~7× less overhead traffic —
  and the input x arrives pre-shifted for free as three DMAs of the
  same HBM buffer at lane offsets (dy−1)·W.
- No boundary conditionals: the first W lanes of every dy=0 slab and
  the last W lanes of every dy=2 slab are never read (conv k's read
  window starts at lane (k+1)·W ≥ W and ends at
  (rows+2·halo−k−1)·W ≤ (band_rows−1)·W), so the three x DMAs simply
  shrink by one row of lanes at the ends and stay in bounds for every
  band.

Requires W % 128 == 0 — the ±W DMA offsets and the shifted activation
stores must be lane-tile aligned.  That covers both production
geometries: the batch-to-lane folded training trunk (g·W multiple of
128 by construction) and the 128-wide inference tiles.  Unaligned
widths keep v5.

Same contract as :func:`dense_block_cf.fused_dense_block_cf5`
(including ``save_acts``, ``img_w`` folding and ``flat_h`` flat padded
chaining), so it drops into the ``partitioned.py`` SPMD wrappers and
the custom VJP unchanged.  Replaces the reference family's
cuDNN-backed dense blocks (SURVEY.md §2.2) like v5 does.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from super_resolution_tpu.ops.pallas.dense_block_cf import flat_io_ok


def pack_weights_cf9(w_hwio: jnp.ndarray, cin: int,
                     growth: int) -> jnp.ndarray:
    """(3, 3, C, F) HWIO → (3F, 3C) for the dy-extended operand layout:
    row dx·F + f; columns segment-major with dy inner — for channel
    segment s (sizes ``cin``, then ``growth`` each) the column of
    (dy, c_local) is 3·prefix_s + dy·size_s + c_local, matching the
    extended scratch's sublane layout."""
    k_h, k_w, c, f = w_hwio.shape
    assert (k_h, k_w) == (3, 3), w_hwio.shape
    # (dx, F, dy, C): [dx·F+f, dy, c] = w[dy, dx, c, f]
    wt = jnp.transpose(w_hwio, (1, 3, 0, 2)).reshape(3 * f, 3, c)
    sizes = [cin]
    while sum(sizes) < c:
        sizes.append(growth)
    assert sum(sizes) == c, (c, cin, growth)
    blocks, lo = [], 0
    for s in sizes:
        blocks.append(wt[:, :, lo:lo + s].reshape(3 * f, 3 * s))
        lo += s
    return jnp.concatenate(blocks, axis=1)


def _ext_off(seg: int, dy: int, cin: int, growth: int) -> int:
    """Sublane offset of (segment, dy) in the extended scratch."""
    pre = 0 if seg == 0 else cin + (seg - 1) * growth
    size = cin if seg == 0 else growth
    return 3 * pre + dy * size


def _kernel9(*refs, rows, width, n_convs, growth, filters,
             res_scale, slope, h_img, cin, save_acts=False,
             img_w=None, flat_io=False, fwd_carry=False):
    # See dense_block_cf._kernel5 for the shared geometry notes
    # (folding/img_w, flat chaining, row masks).  Differences: the
    # feature scratch is dy-extended (3 pre-shifted copies per segment),
    # each conv is a single K = 3·C_k matmul, and activations are
    # triple-written at lane offsets (k+2−dy)·W.
    img_w = width if img_w is None else img_w
    x_hbm = refs[0]
    w_refs = refs[1:1 + n_convs]
    b_refs = refs[1 + n_convs:1 + 2 * n_convs]
    o_ref = refs[1 + 2 * n_convs]
    act_refs = refs[2 + 2 * n_convs:2 + 2 * n_convs + n_convs - 1] \
        if save_acts else ()
    if flat_io:
        ext_ref, in_sems, out_sems = refs[-3:]
    else:
        ext_ref, in_sems = refs[-2:]

    band_row0 = pl.program_id(1) * rows
    b_idx = pl.program_id(0)
    halo = n_convs
    band_rows = rows + 2 * halo
    full = band_rows * width
    base = pl.program_id(1) * rows * width
    off = functools.partial(_ext_off, cin=cin, growth=growth)

    # x delivery: three DMAs of the same HBM band at lane offsets
    # (dy−1)·W.  dy=0 lands one row of lanes later in the slab (its
    # first W lanes are never read); dy=2 reads one row further into
    # HBM and drops its last W lanes (never read) — both stay in
    # bounds for the first/last band without conditionals.
    copies = [
        pltpu.make_async_copy(
            x_hbm.at[b_idx, :, pl.ds(base, full - width)],
            ext_ref.at[pl.ds(off(0, 0), cin), pl.ds(width, full - width)],
            in_sems.at[0]),
        pltpu.make_async_copy(
            x_hbm.at[b_idx, :, pl.ds(base, full)],
            ext_ref.at[pl.ds(off(0, 1), cin), :],
            in_sems.at[1]),
        pltpu.make_async_copy(
            x_hbm.at[b_idx, :, pl.ds(base + width, full - width)],
            ext_ref.at[pl.ds(off(0, 2), cin), pl.ds(0, full - width)],
            in_sems.at[2]),
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()
    dtype = ext_ref.dtype

    m_largest = (rows + 2 * (halo - 1)) * width
    lane_max = jax.lax.broadcasted_iota(jnp.int32, (1, m_largest), 1)
    col_max = lane_max % img_w
    first_band = pl.program_id(1) == 0

    if fwd_carry:
        # Upward-halo carry (dense_block_cf.FWD_CARRY_ENABLED; see the
        # v5 kernel for the scheme): splice the previous band's computed
        # rows to their new lanes — in v9 every activation segment has
        # THREE pre-shifted slabs, so the splice runs per (segment, dy);
        # the lane shift between frames is rows·W in every slab.
        @pl.when(jnp.logical_not(first_band))
        def _splice_carry():
            for k in range(n_convs - 1):
                nlanes = 2 * (halo - k - 1) * width
                for dy in range(3):
                    c0 = off(k + 1, dy)
                    dst = (k + 2 - dy) * width
                    ext_ref[c0:c0 + growth, dst:dst + nlanes] = \
                        ext_ref[c0:c0 + growth,
                                dst + rows * width:
                                dst + rows * width + nlanes]

    def _conv(k, coff, cout, last, row0, m_out, w0):
        # ONE matmul: the dy taps are pre-shifted into the extended
        # operand's sublanes, K = 3·coff
        acc = jnp.dot(w_refs[k][:, 0:3 * coff],
                      ext_ref[0:3 * coff, w0:w0 + m_out],
                      preferred_element_type=jnp.float32)    # (3F, m_out)

        # dx taps: identical to v5 (lane rolls + per-image edge masks)
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

    def _store(k, cout, out, m_out, out_row0):
        # triple-write: slab dy holds the activation pre-shifted by
        # (dy−1)·W, i.e. stored at lane (out_row0+1−dy)·W
        for dy in range(3):
            c0 = off(k + 1, dy)
            d0 = (out_row0 + 1 - dy) * width
            ext_ref[c0:c0 + cout, d0:d0 + m_out] = out

    for k in range(n_convs):
        last = k == n_convs - 1
        cout = filters if last else growth
        coff = cin + growth * k
        out_rows = rows + 2 * (halo - k - 1)
        m_out = out_rows * width
        row0 = band_row0 - (halo - k - 1)

        if last:
            # identical under the carry (halo−k−1 == 0: no shift)
            out = _conv(k, coff, cout, True, row0, m_out,
                        (k + 1) * width)
            c1 = off(0, 1)
            x_center = ext_ref[c1:c1 + cin,
                               halo * width:(halo + rows) * width]
            y = x_center.astype(jnp.float32) + res_scale * \
                out.astype(jnp.float32)
            if flat_io:
                # park y in the consumed x·dy1 slab's central rows for
                # the flat-output DMAs below
                ext_ref[c1:c1 + cin,
                        halo * width:(halo + rows) * width] = \
                    y.astype(ext_ref.dtype)
            else:
                o_ref[:] = y[None].astype(o_ref.dtype)
        elif fwd_carry:
            @pl.when(first_band)
            def _full(k=k, coff=coff, cout=cout, row0=row0,
                      m_out=m_out):
                o = _conv(k, coff, cout, False, row0, m_out,
                          (k + 1) * width)
                _store(k, cout, o, m_out, k + 1)

            @pl.when(jnp.logical_not(first_band))
            def _short(k=k, coff=coff, cout=cout):
                o = _conv(k, coff, cout, False,
                          band_row0 + (halo - k - 1), rows * width,
                          (2 * halo - k - 1) * width)
                _store(k, cout, o, rows * width, 2 * halo - k - 1)

            if save_acts and not flat_io:
                c1 = off(k + 1, 1)
                act_refs[k][:] = ext_ref[
                    c1:c1 + cout,
                    halo * width:(halo + rows) * width][None]
        else:
            out = _conv(k, coff, cout, False, row0, m_out,
                        (k + 1) * width)
            _store(k, cout, out, m_out, k + 1)
            if save_acts and not flat_io:
                s0 = (halo - (k + 1)) * width
                act_refs[k][:] = out[:, s0:s0 + rows * width][None]

    if flat_io:
        # flat padded chaining — identical emit structure to v5's, with
        # the dy=1 slab offsets as sources (dense_block_cf._kernel5)
        is_first = pl.program_id(1) == 0
        is_last = pl.program_id(1) == pl.num_programs(1) - 1
        head = halo * width
        outs = [(o_ref, off(0, 1), cin)]
        if save_acts:
            for _k in range(n_convs - 1):
                outs.append((act_refs[_k], off(_k + 1, 1), growth))

        @pl.when(is_first)
        def _zero_top_pad():
            for _, c0, cs in outs:
                ext_ref[c0:c0 + cs, 0:head] = jnp.zeros(
                    (cs, head), ext_ref.dtype)

        @pl.when(is_last)
        def _zero_bottom_pad():
            for _, c0, cs in outs:
                ext_ref[c0:c0 + cs, (halo + rows) * width:
                        (2 * halo + rows) * width] = jnp.zeros(
                    (cs, head), ext_ref.dtype)

        def _emit(src0, size, dst):
            emits = []
            for j, (ref, c0, cs) in enumerate(outs):
                cp = pltpu.make_async_copy(
                    ext_ref.at[pl.ds(c0, cs), pl.ds(src0, size)],
                    ref.at[b_idx, :, pl.ds(dst, size)],
                    out_sems.at[j])
                cp.start()
                emits.append(cp)
            for cp in emits:
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


def ext_ok(w: int) -> bool:
    """Whether the dy-extended kernel's geometry holds: every dy shift
    is a whole lane tile, so the three pre-shifted x DMAs and the
    (k+2−dy)·W activation stores are 128-aligned."""
    return w % 128 == 0


@functools.partial(jax.jit, static_argnames=("rows", "res_scale", "slope",
                                             "save_acts", "interpret",
                                             "img_w", "flat_h"))
def fused_dense_block_cf9(x: jnp.ndarray,
                          weights: Sequence[jnp.ndarray],
                          biases: Sequence[jnp.ndarray],
                          *, rows: int = 32, res_scale: float = 0.2,
                          slope: float = 0.2, save_acts: bool = False,
                          interpret: bool = False, img_w: int | None = None,
                          flat_h: int | None = None):
    """dy-extended fused dense block — same contract as
    :func:`dense_block_cf.fused_dense_block_cf5` (see module docstring
    for the v9 design).  Requires ``W % 128 == 0``."""
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
    assert ext_ok(w), (w, "dy-extended kernel needs W % 128 == 0")
    n_bands = h // rows
    n_in_blocks = -(-(rows + 2 * halo) // rows)

    if flat_io:
        x_flat = x
    else:
        pad_bottom = (n_bands + n_in_blocks - 1) * rows - h - halo
        x_flat = jnp.pad(x, ((0, 0), (0, 0), (halo, pad_bottom), (0, 0))) \
            .reshape(batch, cin, -1)

    wps = [pack_weights_cf9(wk, cin, growth).astype(x.dtype)
           for wk in weights]
    b2 = [bk.reshape(1, -1).astype(jnp.float32) for bk in biases]

    band_rows = rows + 2 * halo
    # upward-halo carry: same trace-time knob as v5
    # (dense_block_cf.FWD_CARRY_ENABLED); ext_ok already guarantees the
    # splice alignment, so only the carry-source gate remains
    from super_resolution_tpu.ops.pallas import dense_block_cf as _cf

    fwd_carry = (_cf.FWD_CARRY_ENABLED and rows >= 2 * (halo - 1))
    kern = functools.partial(
        _kernel9, rows=rows, width=w, n_convs=n_convs,
        growth=growth, filters=filters, res_scale=res_scale, slope=slope,
        h_img=h, cin=cin, save_acts=save_acts, img_w=img_w,
        flat_io=flat_io, fwd_carry=fwd_carry)

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

    sem_scratch = [pltpu.SemaphoreType.DMA((3,))]
    if flat_io:
        n_outs = n_convs if save_acts else 1
        sem_scratch.append(pltpu.SemaphoreType.DMA((n_outs,)))
    res = pl.pallas_call(
        kern,
        grid=(batch, n_bands),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_convs),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((3 * c_total, band_rows * w), x.dtype)]
        + sem_scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 4, transcendentals=0),
        interpret=interpret,
    )(x_flat, *wps, *b2)
    if flat_io:
        if save_acts:
            return res[0], list(res[1:])
        return res
    unflat = lambda a: a.reshape(batch, a.shape[1], h, w)     # noqa: E731
    if save_acts:
        return unflat(res[0]), [unflat(a) for a in res[1:]]
    return unflat(res)
