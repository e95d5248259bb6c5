"""Custom VJP for the channels-first fused dense block (v5 geometry).

Round-1 left training pinned to the lax conv path because the Pallas
kernels defined no VJP (train/steps.py forced ``conv_impl='lax'``); this
module closes that gap with a hand-written Mosaic *backward* kernel, so
the fused forward also runs under ``jax.grad``.

Both directions use the v5 layout (dense_block_cf.py): channels-first
flattened bands, the three dy (row) taps folded into the contraction as
matmuls over W-aligned lane windows, the three dx (column) taps packed in
the matmul M dim.  Backward math per conv k, in reverse:

- LeakyReLU grad from the saved activation sign (``a >= 0`` ⟺
  ``z >= 0``), and the forward's out-of-image row masking back-propagates
  as a row mask on the cotangent → ``dout`` (F, m_out).
- dx reversal: scatter ``dout`` into a (3F, m_out) buffer with the
  *opposite* lane rolls and mirrored edge-column masks → ``dacc``.
- dW: for each dy, ``dW_dy = dacc ·_pixels feats[:, (k+dy)·W …]^T`` —
  one matmul contracting the pixel axis (K = thousands, MXU-deep),
  written to the dy-major row slab of the packed (9F, C) gradient.
- dfeats: for each dy, ``dfeats[:, (k+dy)·W …] += W_dy^T ·_{3F} dacc``
  — one matmul with K = 3F, accumulated at the same aligned window
  offsets the forward read from.

The v4-geometry backward (per-row band assembly, all 9 taps in one
(9F, win) scatter buffer) compiled only for W a multiple of 128 — real-
hardware Mosaic rejects its many small unaligned lane stores, which is
exactly the training-patch regime (W = 48 for 192² HR patches).  The v5
geometry assembles bands with ceil(band/rows) aligned (C, rows·W) block
stores and compiles for the shapes training actually uses (found by the
round-2 GAN it/s bench, BENCHNOTES.md).

Band halos: the forward recomputes halo rows per band, so the gradient
w.r.t. the input carries per-band contributions that overlap ±halo rows
across band boundaries.  Under DMA delivery the kernel overlap-adds
*in place* across the sequential band grid with a VMEM carry: band i
adds band i-1's stashed halo tail to its head rows, DMAs its first
``rows`` rows — now final — to the (disjoint) output chunk, and stashes
its own tail for band i+1 (the last band flushes tail and chunk in one
DMA).  The wrapper's only post-processing is a static halo slice.  This
replaced two successive wrapper overlap-adds: the round-2 per-band
dynamic_update_slice chain (16.7% of the GAN step in the round-3 device
trace) and the round-3 vectorized shifted-pad form, whose 5-D
pad+chunk-reshape consumer MISCOMPILES on real TPU in the full
train-step graph (NaN/garbage dx rows; every pad-based reformulation
failed identically while the sequential DUS chain was clean —
BENCHNOTES round 3).  Weight/bias gradients
accumulate across the sequential TPU grid into constant-index output
blocks (zeroed on the first grid step — the standard Pallas accumulation
pattern).  The backward bands independently of the forward (it
recomputes everything from the saved full-plane residuals), so it picks
its own VMEM-safe ``rows``.

``BWD_CARRY_ENABLED`` (see the knob comment) additionally removes the
per-band halo *recompute*: each band then processes exactly ``rows``
completed cotangent rows per conv instead of rows + 2·(halo−k−1),
carrying the unfinished activation-grad tails between bands — the
backward twin of the forward's upward-halo carry.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from super_resolution_tpu.ops.pallas.dense_block_cf import (
    fused_dense_block_cf5,
    pack_weights_cf,
)

# Debug/bench escape hatch mirroring dense_block_cf.DMA_IN_ENABLED: False
# forces the round-2 grid-block input delivery in the backward kernel.
# Read at trace time — set before the first traced call in a process.
DMA_IN_ENABLED = True

# Run the train-path kernels under Pallas' GENERIC interpreter (read at
# trace time).  This is the only interpret mode that composes with
# custom_partitioning on a multi-device mesh: pltpu.force_tpu_interpret_
# mode() lowers every pallas_call through an ordered io_callback, whose
# OrderedIOEffect the SPMD partitioner refuses to stage — so CPU-mesh
# tests of DP × kernel training (tests/test_dp.py) set INTERPRET=True
# (plus the DMA/carry/v9 knobs OFF: manual DMAs need the TPU
# interpreter) and clear jit caches.  Never set on TPU.
INTERPRET = False

# Backward band-height lane caps, read at TRACE time by _bwd_rows (set
# before the first traced call, like DMA_IN_ENABLED).  The aligned cap
# bounds rows·w under DMA input delivery; 3072 (= rows=8 at the folded
# W=384 training geometry) is the everywhere-validated size — rows=12
# measured 7% faster in isolation but overflowed scoped VMEM by 205 KB
# inside the full train-step jit BEFORE the dfeats split below freed
# 393 KB (BENCHNOTES round 3).  Raise via tools' --bwd_cap to re-test
# on-chip.
BWD_LANE_CAP_ALIGNED = 3072
BWD_LANE_CAP_UNALIGNED = 2048

# Backward halo-recompute carry (round-3 fourth session), read at TRACE
# time.  The classic backward processes, per band, a cotangent window of
# rows + 2·(halo−k−1) rows for conv k — ~29% extra matmul FLOPs on the
# early convs at the folded rows=8 training geometry (the ROADMAP item-1
# halo recompute).  With the carry, every band processes exactly `rows`
# COMPLETED cotangent rows per conv (same window start, 2·(halo−k−1)
# rows shorter): the incomplete activation-grad tails (halo−k rows per
# segment) and the dx tail (halo+1 rows instead of 2·halo) ride VMEM
# carries to the next band, and the last band sweeps the leftover
# (halo−k−1)-row tail window per conv.  This is the exact adjoint of the
# forward's upward-halo carry (dense_block_cf.FWD_CARRY_ENABLED): a row
# of dout_k is complete once every band whose central cotangent reaches
# it has contributed, which under the sequential band grid is one band
# after the row's own — so conv k's processing lags by halo−k−1 rows,
# the same skew the forward runs forward.  Gated on DMA delivery,
# W % 128 == 0 (all carry offsets are multiples of W) and
# rows ≥ halo (the stash windows must fit above the next band's reads).
# Default ON since the round-3 on-chip campaign:
# tools/verify_grads_onchip.py passes with --bwd_carry alone AND with
# every knob combination (loss/gnorm identical to lax, reldiff at the
# bf16 noise floor), and the fwd+bwd carries together lift the GAN step
# +7.4% (BENCHNOTES; alone the bwd carry is a small regression — the
# FLOP saving only nets out once the forward stops recomputing its own
# halo, so the knobs ship as a pair).
BWD_CARRY_ENABLED = True

# Debug aid: zero every scratch buffer at the top of each grid iteration
# (interpret mode does this implicitly; hardware VMEM starts as garbage).
# Diagnoses read-before-write bugs — never enable in production.
DEBUG_INIT_SCRATCH = False


def bwd_carry_active(w: int, rows: int, n_convs: int = 5) -> bool:
    """Whether the halo-recompute carry engages at this geometry — the
    exact trace-time gate fused_dense_block_cf5_bwd applies (single
    source of truth; the test suite uses it to prove the carry path is
    really the one being compared, not a silent classic fallback)."""
    band_rows = rows + 2 * n_convs
    dma_in = (DMA_IN_ENABLED and (band_rows * w) % 128 == 0
              and (rows * w) % 128 == 0)
    return (BWD_CARRY_ENABLED and dma_in and w % 128 == 0
            and rows >= n_convs)


def unpack_weight_grad(dw9: jnp.ndarray) -> jnp.ndarray:
    """(9F, C) packed-layout gradient → (3, 3, C, F) HWIO (the inverse of
    :func:`pack_weights_cf`)."""
    nine_f, c = dw9.shape
    f = nine_f // 9
    return jnp.transpose(dw9.reshape(3, 3, f, c), (0, 1, 3, 2))


def _kernel5_bwd(*refs, rows, width, n_convs, growth, filters,
                 res_scale, slope, h_img, cin, img_w=None,
                 n_in_blocks=0, flat_io=False, bwd_carry=False):
    # width = lane width of a row; img_w = per-image width under
    # batch-to-lane folding (dense_block_cf._kernel5 docstring) — the dx
    # edge masks apply per image, all dy-window offsets j·width become
    # 128-aligned when the caller folds g = 128/gcd(W,128) images.
    #
    # Input delivery (static choice, n_in_blocks == 0 ⟺ DMA):
    # - DMA mode: srcs arrive as full (B, C_j, Hp·W) HBM refs and each
    #   band is copied straight into the feature scratch.  Grid-block
    #   delivery needed n_in_blocks double-buffered copies of every
    #   source (~8 MB of VMEM at the folded training geometry — the
    #   scoped-VMEM OOM found in round 3).  Requires the band lanes and
    #   the per-band stride to be 128-multiples (Mosaic DMA slice
    #   constraint) — always true folded, and at W % 128 == 0.
    # - block mode: the round-2 delivery, kept for unaligned unfolded
    #   widths (training routes those to lax anyway).
    img_w = width if img_w is None else img_w
    dma_in = n_in_blocks == 0
    n_srcs = n_convs              # x + a1..a4
    nb = 1 if dma_in else n_in_blocks
    srcs = refs[:n_srcs * nb]
    g_ref = refs[n_srcs * nb]
    w_refs = refs[n_srcs * nb + 1:n_srcs * nb + 1 + n_convs]
    outs = refs[n_srcs * nb + 1 + n_convs:
                n_srcs * nb + 1 + n_convs + 1 + 2 * n_convs]
    o_dx, o_dws, o_dbs = outs[0], outs[1:1 + n_convs], outs[1 + n_convs:]
    if flat_io:
        if bwd_carry:
            (feat_ref, dfeat_ref, dfa_ref, dz_ref, carry_ref, carry_fa,
             g_buf, in_sems, dx_sem, g_sem) = refs[-10:]
        else:
            (feat_ref, dfeat_ref, dfa_ref, dz_ref, carry_ref, g_buf,
             in_sems, dx_sem, g_sem) = refs[-9:]
    elif dma_in:
        if bwd_carry:
            (feat_ref, dfeat_ref, dfa_ref, dz_ref, carry_ref, carry_fa,
             in_sems, dx_sem) = refs[-8:]
        else:
            (feat_ref, dfeat_ref, dfa_ref, dz_ref, carry_ref,
             in_sems, dx_sem) = refs[-7:]
    else:
        feat_ref, dfeat_ref, dfa_ref, dz_ref = refs[-4:]

    b_idx = pl.program_id(0)
    band_row0 = pl.program_id(1) * rows
    halo = n_convs
    band_rows = rows + 2 * halo
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        for r in list(o_dws) + list(o_dbs):
            r[:] = jnp.zeros_like(r)

    if dma_in:
        # fresh image: no halo tail carried in from a previous band
        @pl.when(pl.program_id(1) == 0)
        def _zero_carry():
            carry_ref[:] = jnp.zeros_like(carry_ref)
            if bwd_carry:
                carry_fa[:] = jnp.zeros_like(carry_fa)

    if DEBUG_INIT_SCRATCH:
        feat_ref[:] = jnp.zeros_like(feat_ref)
        dz_ref[:] = jnp.zeros_like(dz_ref)

    # ---- assemble feats (x | a1 | .. | a4) into the scratch
    offs = [0] + [cin + growth * j for j in range(n_convs - 1)]
    if dma_in:
        start = pl.program_id(1) * rows * width
        copies = []
        for j, src in enumerate(srcs):
            c0 = offs[j]
            cs = cin if j == 0 else growth
            cp = pltpu.make_async_copy(
                src.at[b_idx, :, pl.ds(start, band_rows * width)],
                feat_ref.at[pl.ds(c0, cs), :],
                in_sems.at[j])
            cp.start()
            copies.append(cp)
        if flat_io:
            # the cotangent arrives flat-padded too (it IS the next
            # block's flat dx); read only this band's central rows —
            # its pad rows are cotangents of constant-zero pad rows
            g_cp = pltpu.make_async_copy(
                g_ref.at[b_idx, :,
                         pl.ds((halo + pl.program_id(1) * rows) * width,
                               rows * width)],
                g_buf, g_sem)
            g_cp.start()
            copies.append(g_cp)
        for cp in copies:
            cp.wait()
    else:
        # full aligned (C, rows·W) block stores; the scratch is sized
        # n_in_blocks·rows·W in this mode so the last store fits whole
        src_blocks = [srcs[j * nb:(j + 1) * nb] for j in range(n_srcs)]
        for j, blocks in enumerate(src_blocks):
            c0 = offs[j]
            cs = cin if j == 0 else growth
            for b_i, b in enumerate(blocks):
                feat_ref[c0:c0 + cs,
                         b_i * rows * width:(b_i + 1) * rows * width] = b[0]

    g_band = g_buf[:] if flat_io else g_ref[0]
    # dfeats is SPLIT to trim VMEM (the fp32 grad scratch is the hog):
    # dfeat_ref holds the dx channels over the full band; dfa_ref holds
    # the activation-grad segments, which are only ever touched at lanes
    # [w, (band_rows-1)·w) — stored at lane offset −w in a buffer two
    # rows narrower.  Saves (c_total−cin)·2w·4 bytes per band (393 KB at
    # the folded training geometry — the margin rows=12 was missing).
    dfeat_ref[:] = jnp.zeros_like(dfeat_ref)
    dfa_ref[:] = jnp.zeros_like(dfa_ref)
    # residual identity: dx central += g
    dfeat_ref[:, halo * width:(halo + rows) * width] = \
        g_band.astype(jnp.float32)

    if bwd_carry:
        # splice the carried activation-grad tails: segment k's tail —
        # rows [band_row0 − (halo−k−1), band_row0 + 1), the partial
        # sums the previous band's convs spilled below its windows —
        # lands at dfa lanes [k·W, halo·W) of THIS band (plain store:
        # dfa_ref was just zeroed; this band's convs accumulate on top)
        for k in range(n_convs - 1):
            c0 = growth * k
            dfa_ref[c0:c0 + growth, k * width:halo * width] = \
                carry_fa[c0:c0 + growth, 0:(halo - k) * width]

    m_iota = (rows if bwd_carry else rows + 2 * (halo - 1)) * width
    lane_max = jax.lax.broadcasted_iota(jnp.int32, (1, m_iota), 1)
    col_max = lane_max % img_w
    is_last_band = pl.program_id(1) == pl.num_programs(1) - 1

    def _win(k, base, m_out):
        # One cotangent window of conv k: dout rows
        # [band_row0 − (halo−k−1) + (base−k), … + m_out/width).  The
        # classic backward calls it once per conv with base = k and the
        # full rows + 2·(halo−k−1) extent; under the carry every band
        # calls it with the `rows`-row completed window (base = k) and
        # the last band once more with the (halo−k−1)-row leftover tail
        # (base = rows + k).  Every lane offset is (base+const)·W.
        last = k == n_convs - 1
        cout = filters if last else growth
        c_in_k = cin + growth * k
        row0 = band_row0 - (halo - k - 1) + (base - k)
        col = col_max[:, :m_out]

        if last:
            dout = g_band.astype(jnp.float32) * res_scale    # (F, rows·W)
        else:
            sl = slice(cin + growth * k, cin + growth * (k + 1))
            lanes = slice((base + 1) * width, (base + 1) * width + m_out)
            # activation-grad segments live in dfa_ref at lane offset −w
            da = dfa_ref[growth * k:growth * (k + 1),
                         base * width:base * width + m_out]
            a = feat_ref[sl, lanes]
            # arithmetic masks only: an i1 select on a value loaded from
            # an unaligned lane offset hits a Mosaic "invalid relayout"
            # (replicated-dimension) compile error at W % 128 != 0.
            # sign-based LeakyReLU grad: a > 0 → 1, a < 0 → slope; the
            # a == 0 kink gets slope instead of lax's 1.0 — a measure-
            # zero subgradient choice.
            leak = slope + (1.0 - slope) * jnp.maximum(
                jnp.sign(a.astype(jnp.float32)), 0.0)
            g_row = (lane_max[:, :m_out] // width) + row0
            rowmask = ((g_row >= 0) & (g_row < h_img)).astype(jnp.float32)
            dout = da * leak * rowmask

        o_dbs[k][:] += jnp.sum(dout, axis=1)[None, :]

        # dx reversal: the fwd's left tap rolled right & zeroed col 0 →
        # its adjoint rolls left & zeroes the last col (and vice versa).
        # Arithmetic 0/1 masks, not jnp.where — Mosaic rejects the
        # broadcast-i1 select feeding these stores with an "invalid
        # relayout: non-singleton dimension replicated" error.
        m_last = (col < img_w - 1).astype(jnp.float32)
        m_first = (col > 0).astype(jnp.float32)
        dz_ref[0:cout, 0:m_out] = (
            pltpu.roll(dout, m_out - 1, 1) * m_last).astype(dz_ref.dtype)
        dz_ref[cout:2 * cout, 0:m_out] = dout.astype(dz_ref.dtype)
        dz_ref[2 * cout:3 * cout, 0:m_out] = (
            pltpu.roll(dout, 1, 1) * m_first).astype(dz_ref.dtype)
        dacc = dz_ref[0:3 * cout, 0:m_out]

        for dy in range(3):
            lanes_dy = slice((base + dy) * width,
                             (base + dy) * width + m_out)
            part = feat_ref[0:c_in_k, lanes_dy]
            # dW_dy: contract the pixel axis (K = m_out, MXU-deep)
            o_dws[k][dy * 3 * cout:(dy + 1) * 3 * cout, 0:c_in_k] += \
                jax.lax.dot_general(
                    dacc, part, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # dfeats: contract the packed-dx axis (K = 3F)
            wdy = w_refs[k][dy * 3 * cout:(dy + 1) * 3 * cout, 0:c_in_k]
            dpart = jax.lax.dot_general(
                wdy, dacc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dfeat_ref[:, lanes_dy] = \
                dfeat_ref[:, lanes_dy] + dpart[0:cin]
            if k > 0:
                la = slice((base + dy - 1) * width,
                           (base + dy - 1) * width + m_out)
                dfa_ref[0:growth * k, la] = \
                    dfa_ref[0:growth * k, la] + dpart[cin:c_in_k]

    for k in range(n_convs - 1, -1, -1):
        lag = halo - k - 1
        if not bwd_carry:
            _win(k, k, (rows + 2 * lag) * width)
            continue
        _win(k, k, rows * width)
        if lag > 0:
            # leftover tail: rows [h − lag, h) are nobody's completed
            # window (there is no band after the last to finish them),
            # so the last band sweeps them — interleaved in the same
            # reverse-k order, so segment reads below stay complete
            @pl.when(is_last_band)
            def _tail(k=k, lag=lag):
                _win(k, rows + k, lag * width)

    if dma_in:
        # In-kernel overlap-add via the carry: the head rows of this
        # band's dfeat coincide with the unfinished tail of the previous
        # one (bands advance by `rows`), so adding the stashed tail
        # makes this band's first `rows` rows FINAL.  Classic: head =
        # 2·halo rows (each band writes a full ±halo-widened window).
        # bwd_carry: head = halo+1 rows — conv k's completed window only
        # spills halo−k−1+1 rows down, so the unfinished tail is rows
        # [band_end − halo, band_end + 1).  Outputs are disjoint
        # chunks → HBM by DMA (a grid-block output would double-buffer
        # another 3.5 MB of VMEM at the folded geometry).
        head = ((halo + 1) if bwd_carry else 2 * halo) * width
        dfeat_ref[:, 0:head] = (dfeat_ref[:, 0:head]
                                + carry_ref[:].astype(jnp.float32))
        # the carry lives at x.dtype: an fp32 carry blew scoped VMEM by
        # 357 KB at the folded training geometry, and the kernel's dacc
        # matmul operands are x.dtype already, so this adds no new
        # precision floor
        carry_ref[:] = dfeat_ref[:,
                                 rows * width:rows * width + head].astype(
                                     carry_ref.dtype)
        if bwd_carry:
            # stash the activation-grad tails for the next band: segment
            # k's incomplete rows [band_end − (halo−k−1), band_end + 1)
            # sit at dfa lanes [(rows+k)·W, (rows+halo)·W) — fp32, these
            # are partial sums still being accumulated
            for k in range(n_convs - 1):
                c0 = growth * k
                carry_fa[c0:c0 + growth, 0:(halo - k) * width] = \
                    dfa_ref[c0:c0 + growth,
                            (rows + k) * width:(rows + halo) * width]
        is_last = is_last_band

        @pl.when(jnp.logical_not(is_last))
        def _write_chunk():
            cp = pltpu.make_async_copy(
                dfeat_ref.at[pl.ds(0, cin), pl.ds(0, rows * width)],
                o_dx.at[b_idx, :,
                        pl.ds(pl.program_id(1) * (rows * width),
                              rows * width)],
                dx_sem)
            cp.start()
            cp.wait()

        @pl.when(is_last)
        def _write_chunk_and_tail():
            cp = pltpu.make_async_copy(
                dfeat_ref.at[pl.ds(0, cin), :],
                o_dx.at[b_idx, :,
                        pl.ds(pl.program_id(1) * (rows * width),
                              band_rows * width)],
                dx_sem)
            cp.start()
            cp.wait()
    else:
        o_dx[:] = dfeat_ref[:, 0:band_rows * width][None]


@functools.partial(jax.jit, static_argnames=("rows", "res_scale", "slope",
                                             "interpret", "img_w",
                                             "flat_h"))
def fused_dense_block_cf5_bwd(x, acts, weights, g, *, rows: int,
                              res_scale: float, slope: float,
                              interpret: bool = False,
                              img_w: int | None = None,
                              flat_h: int | None = None):
    """Backward of :func:`fused_dense_block_cf5`: returns
    ``(dx, [dW_k HWIO], [db_k])`` given the saved activations.

    ``flat_h``: flat padded chaining (see the forward) — x/acts/g arrive
    as (B, C, (h+2·halo)·W) and dx is returned in the same layout (the
    carry output already IS that layout; its pad rows carry adjoint
    spill values that every consumer ignores)."""
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
    else:
        batch, cin, h, w = x.shape
    assert h % rows == 0, (h, rows)
    n_bands = h // rows
    n_in_blocks = -(-(rows + 2 * halo) // rows)
    band_rows = rows + 2 * halo
    c_total = cin + (n_convs - 1) * growth

    if flat_io:
        srcs = [x] + list(acts)
        g_flat = g
    else:
        pad_bottom = (n_bands + n_in_blocks - 1) * rows - h - halo
        flat = lambda a: jnp.pad(                             # noqa: E731
            a, ((0, 0), (0, 0), (halo, pad_bottom), (0, 0))).reshape(
            a.shape[0], a.shape[1], -1)
        srcs = [flat(x)] + [flat(a) for a in acts]
        g_flat = g.reshape(batch, filters, h * w)
    wps = [pack_weights_cf(wk).astype(x.dtype) for wk in weights]

    # DMA input delivery needs the band slice and per-band stride to be
    # lane-tile (128) multiples — always true under the fold; unaligned
    # unfolded widths keep the round-2 grid-block delivery
    dma_in = (DMA_IN_ENABLED and (band_rows * w) % 128 == 0
              and (rows * w) % 128 == 0)
    assert dma_in or not flat_io, (rows, w)
    # halo-recompute carry: every carry offset is a multiple of W
    # (aligned only when W % 128 == 0) and the stash windows sit above
    # the next band's reads only when rows ≥ halo
    bwd_carry = bwd_carry_active(w, rows, n_convs)
    assert not bwd_carry or dma_in

    kern = functools.partial(
        _kernel5_bwd, rows=rows, width=w, n_convs=n_convs, growth=growth,
        filters=filters, res_scale=res_scale, slope=slope, h_img=h,
        cin=cin, img_w=img_w,
        n_in_blocks=0 if dma_in else n_in_blocks, flat_io=flat_io,
        bwd_carry=bwd_carry)

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    if dma_in:
        in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * n_convs
        call_srcs = list(srcs)
        dx_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        feat_lanes = band_rows * w
        dx_lanes = (h + 2 * halo) * w          # in-kernel overlap-add
        carry_lanes = ((halo + 1) if bwd_carry else 2 * halo) * w
        sem_scratch = [
            pltpu.VMEM((cin, carry_lanes), x.dtype),        # dx carry
        ]
        if bwd_carry:
            # activation-grad tail carry: segment k uses lanes
            # [0, (halo−k)·W) — fp32 partial sums
            sem_scratch.append(
                pltpu.VMEM((c_total - cin, halo * w), jnp.float32))
        if flat_io:
            sem_scratch.append(
                pltpu.VMEM((filters, rows * w), g.dtype))   # g band
        sem_scratch += [
            pltpu.SemaphoreType.DMA((n_convs,)),
            pltpu.SemaphoreType.DMA(()),
        ]
        if flat_io:
            sem_scratch.append(pltpu.SemaphoreType.DMA(()))  # g sem
    else:
        def in_block(chans, off):
            return pl.BlockSpec((1, chans, rows * w),
                                lambda b, i, o=off: (b, 0, i + o),
                                memory_space=pltpu.VMEM)

        in_specs = []
        for j in range(n_convs):
            chans = cin if j == 0 else growth
            in_specs += [in_block(chans, o) for o in range(n_in_blocks)]
        call_srcs = [s for src in srcs for s in [src] * n_in_blocks]
        dx_spec = pl.BlockSpec((1, cin, band_rows * w),
                               lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM)
        feat_lanes = n_in_blocks * rows * w
        dx_lanes = n_bands * band_rows * w     # widened disjoint bands
        sem_scratch = []
    if flat_io:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    else:
        in_specs.append(pl.BlockSpec((1, filters, rows * w),
                                     lambda b, i: (b, 0, i),
                                     memory_space=pltpu.VMEM))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_convs

    out_shapes = [jax.ShapeDtypeStruct(
        (batch, cin, dx_lanes), jnp.float32)]
    out_specs = [dx_spec]
    for k in range(n_convs):
        cout = filters if k == n_convs - 1 else growth
        out_shapes.append(jax.ShapeDtypeStruct(
            (9 * cout, cin + growth * k), jnp.float32))
        out_specs.append(const)
    for k in range(n_convs):
        cout = filters if k == n_convs - 1 else growth
        out_shapes.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
        out_specs.append(const)

    # widest window: the completed `rows`-row window under the carry
    # (tails are at most (halo−1)·W ≤ rows·W), the classic
    # rows + 2·(halo−1) span otherwise; the dfa scratch shrinks with it
    # (carry-mode accesses stop at lane (rows+halo)·W)
    m_max = (rows if bwd_carry else rows + 2 * (halo - 1)) * w
    dfa_lanes = ((rows + halo) if bwd_carry else band_rows - 2) * w
    flops = 2 * 2 * batch * h * w * sum(9 * wk.shape[2] * wk.shape[3]
                                        for wk in weights)
    res = pl.pallas_call(
        kern,
        grid=(batch, n_bands),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c_total, feat_lanes), x.dtype),          # feats
            pltpu.VMEM((cin, band_rows * w), jnp.float32),       # dfeats/dx
            # activation-grad segments: only lanes [w, (band_rows-1)·w)
            # are ever touched — two rows narrower, lane offset −w
            pltpu.VMEM((c_total - cin, dfa_lanes), jnp.float32),
            pltpu.VMEM((3 * max(filters, growth), m_max), x.dtype),  # dacc
        ] + sem_scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 8, transcendentals=0),
        interpret=interpret,
    )(*call_srcs, g_flat, *wps)

    dxw = res[0]
    dw9s = res[1:1 + n_convs]
    dbs = [b[0] for b in res[1 + n_convs:]]

    if flat_io:
        # stay flat: the consumer (the previous block's bwd / the chain
        # entry slice) ignores the pad rows' adjoint spill values
        dx = dxw.astype(x.dtype)
    elif dma_in:
        # the kernel already overlap-added across bands via the carry;
        # all that remains is dropping the halo rows
        dx_pad = dxw.reshape(batch, cin, h + 2 * halo, w)
        dx = dx_pad[:, :, halo:halo + h].astype(x.dtype)
    else:
        # block mode (interpret / debug): widened disjoint bands —
        # overlap-add with a sequential per-band dynamic_update_slice
        # chain.  NOT the vectorized shifted-pad form: its 5-D
        # pad+chunk-reshape consumer miscompiles on real TPU in the
        # full train-step graph (NaN dx rows — BENCHNOTES round 3).
        dxw = dxw.reshape(batch, cin, n_bands, band_rows, w)
        dx_pad = jnp.zeros((batch, cin, h + 2 * halo, w), jnp.float32)
        for i in range(n_bands):
            seg = jax.lax.dynamic_slice_in_dim(dx_pad, i * rows,
                                               band_rows, axis=2)
            dx_pad = jax.lax.dynamic_update_slice_in_dim(
                dx_pad, seg + dxw[:, :, i], i * rows, axis=2)
        dx = dx_pad[:, :, halo:halo + h].astype(x.dtype)
    dws = [unpack_weight_grad(d) for d in dw9s]
    return dx, dws, dbs


def _bwd_rows(h: int, w: int, rows_fwd: int) -> int:
    """The backward bands independently of the forward (it recomputes
    from full-plane residuals) — its fp32 dfeats scratch is the VMEM
    hog.  Cap rows·w at BWD_LANE_CAP_UNALIGNED lanes under grid-block
    input delivery; at lane-tile-aligned geometries the DMA delivery
    frees the staging buffers and the cap rises to BWD_LANE_CAP_ALIGNED
    (3072 = rows=8 at the folded W=384 training geometry).  rows=12
    there measured 7% faster in isolation but overflowed scoped VMEM by
    205 KB inside the full train-step jit — the margin is
    context-dependent, so the default stays at the everywhere-validated
    size; the dfeats split (session 3) freed 393 KB, so the rows=12
    retest (--bwd_cap 4608) is pending on-chip (BENCHNOTES round 3)."""
    for r in (32, 16, 12, 8):
        if h % r != 0:
            continue
        aligned = (r * w) % 128 == 0 and ((r + 10) * w) % 128 == 0
        if r * w <= (BWD_LANE_CAP_ALIGNED if aligned
                     else BWD_LANE_CAP_UNALIGNED):
            return r
    return min(rows_fwd, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def dense_block_cf_train(x, weights, biases, rows, res_scale, slope,
                         img_w=None, flat_h=None):
    """Differentiable fused dense block: Pallas forward AND backward
    (both v5 geometry).  ``weights``/``biases`` are lists; grads flow to
    all three inputs.

    The primal (inference) path is SPMD-partitioned on the batch dim
    (ops/pallas/partitioned.py), so batch-sharded DP inference runs the
    kernel per shard instead of gathering.

    ``img_w`` is the per-image width under batch-to-lane folding
    (models/rrdb.py folds g = 128/gcd(W,128) images into the lane axis
    at unaligned widths so every dy-window slice in BOTH directions is
    128-aligned — the round-2 relayout tax at W=48 training patches was
    exactly these unaligned offsets; BENCHNOTES.md round 3).

    ``flat_h``: flat padded chaining — x is (B, C, (h+2·halo)·W) with
    zero pad rows and the output comes back in the same layout, so the
    RRDB trunk chains blocks with no per-block pad/reshape (fwd OR bwd).

    Measured routing note (BENCHNOTES.md round 2, L2-cotangent fwd+bwd):
    the Mosaic backward wins 1.42× over lax autodiff at W % 128 == 0
    (73.9 vs 51.9 TF/s at 8×64×128²); at unaligned widths the fold
    restores alignment when the batch divides by g, and
    ``train/steps._training_cfg`` falls back to lax otherwise."""
    from super_resolution_tpu.ops.pallas.partitioned import (
        partitioned_dense_block,
    )

    fn = partitioned_dense_block(len(weights), rows, res_scale, slope,
                                 interpret=INTERPRET,
                                 img_w=img_w, flat_h=flat_h)
    return fn(x, *weights, *biases)


def _train_fwd(x, weights, biases, rows, res_scale, slope, img_w=None,
               flat_h=None):
    # batch-partitioned save-acts forward: under a batch-sharded DP jit
    # the kernel runs per shard (ops/pallas/partitioned.py)
    from super_resolution_tpu.ops.pallas.partitioned import (
        partitioned_dense_block_fwd,
    )

    res = partitioned_dense_block_fwd(len(weights), rows, res_scale,
                                      slope, interpret=INTERPRET,
                                      img_w=img_w,
                                      flat_h=flat_h)(
        x, *weights, *biases)
    y, acts = res[0], res[1:]
    return y, (x, tuple(weights), tuple(acts))


def _train_bwd(rows, res_scale, slope, img_w, flat_h, residuals, g):
    # batch-partitioned Mosaic backward: dx per shard, dW/db psum'd over
    # the mesh axis inside the partition — the DP gradient all-reduce
    from super_resolution_tpu.ops.pallas.partitioned import (
        partitioned_dense_block_bwd,
    )

    x, weights, acts = residuals
    n = len(weights)
    if flat_h is not None:
        h = flat_h
        w = x.shape[2] // (h + 2 * n)
    else:
        h, w = x.shape[2], x.shape[3]
    res = partitioned_dense_block_bwd(
        n, _bwd_rows(h, w, rows), res_scale, slope, interpret=INTERPRET,
        img_w=img_w, flat_h=flat_h)(x, *acts, g, *weights)
    dx, dws, dbs = res[0], res[1:1 + n], res[1 + n:]
    # cotangent dtypes must match the primal inputs (weights may be bf16)
    dws = [d.astype(w.dtype) for d, w in zip(dws, weights)]
    dbs = [db.astype(jnp.float32) for db in dbs]
    return dx, list(dws), list(dbs)


dense_block_cf_train.defvjp(_train_fwd, _train_bwd)
