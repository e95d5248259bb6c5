"""RRDBNet ×4 generator — Flax, NHWC, bf16-ready.

Architecture (SURVEY.md §2.1 "RRDB generator"; ESRGAN paper §3.1): a 3×3
conv stem, ``n_blocks`` Residual-in-Residual Dense Blocks, a trunk conv
with a global residual, two ×2 upsample stages, an HR conv and an output
conv.  No BatchNorm anywhere.  The canonical 23-block/64-filter/growth-32
model has exactly 16,697,987 parameters (SURVEY.md §2.1 [V]).

One parameterization covers both branches of the reference family:
``growth=32`` + ``upsampler='nearest_conv'`` is the xinntao/BasicSR
variant; ``growth=64`` + ``upsampler='pixelshuffle'`` is the
eriklindernoren variant (its dense-block convs all output ``filters``
channels, i.e. growth == filters).  Dense blocks run 5 convs where conv k
reads the concat of the input and all previous outputs; convs 1–4 emit
``growth`` channels followed by LeakyReLU, conv 5 emits ``filters``
channels with no activation; the block output is ``x + res_scale * conv5``
and each RRDB wraps 3 dense blocks with the same outer residual scaling.

TPU notes: ``dtype`` selects the conv compute dtype (bf16 on the MXU)
while params stay fp32.  ``cfg.conv_impl`` switches the conv
implementation (identical param trees throughout; BENCHNOTES.md has
every measurement): "lax" is XLA's conv emitter (NHWC, always-correct
default); "pallas_cf" routes the 69 dense blocks through the
channels-first fused Mosaic kernel v5 (ops/pallas/dense_block_cf.py) —
2.6× faster per block, ~2.5× end-to-end, with the whole trunk in NCHW
(two transposes total, hoisted out of the block loop), a custom Mosaic
VJP for aligned-width training, and SPMD batch partitioning for DP.
The stem/tail convs stay on lax (measured faster there);
"pallas"/"pallas_fused"/"pallas_cf_tail" are retained experiments.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_resolution_tpu.config import GeneratorConfig, resolve_conv_impl
from super_resolution_tpu.models.initializers import conv_inits
from super_resolution_tpu.ops.shuffle import nearest_upsample, pixel_shuffle


def precision_for(dtype):
    """fp32 means fp32: XLA's DEFAULT precision lowers f32 convs to faster
    reduced-precision passes, which breaks checkpoint parity — so fp32
    compute pins HIGHEST, while bf16 keeps the fast default MXU path."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)


class Conv3x3(nn.Module):
    """3×3 SAME conv with a switchable implementation: ``lax`` (XLA's TPU
    conv emitter — the default and fastest measured path, BENCHNOTES.md)
    or ``pallas`` (the packed-taps kernel in ops/pallas/packed_conv.py,
    kept as a flag-gated experiment per SURVEY.md §7 stage 6).  The param
    tree ({kernel: HWIO, bias}) is identical either way, so checkpoints
    are implementation-agnostic."""

    features: int
    scheme: str
    dtype: Any = jnp.float32
    impl: str = "lax"

    @nn.compact
    def __call__(self, x):
        kshape = (3, 3, x.shape[-1], self.features)
        kinit, binit = conv_inits(self.scheme, kshape)
        kernel = self.param("kernel", kinit, kshape, jnp.float32)
        bias = self.param("bias", binit, (self.features,), jnp.float32)
        if self.impl == "lax":
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision_for(self.dtype))
            return y + bias.astype(y.dtype)
        if self.impl == "pallas":
            from super_resolution_tpu.ops.pallas.packed_conv import (
                packed_conv3x3,
            )

            rows = next(r for r in (16, 8, 4, 2, 1)
                        if x.shape[1] % r == 0)
            return packed_conv3x3(
                x.astype(self.dtype), kernel.astype(self.dtype),
                bias, rows=rows, apply_act=False, out_dtype=self.dtype)
        raise ValueError(f"unknown conv impl {self.impl!r}")


def _fold_factor(batch: int, w: int) -> int:
    """Batch-to-lane fold factor: the smallest g with (g·w) % 128 == 0,
    when it divides the batch.  At unaligned widths (the 192²-patch
    training regime: LR W = 48 → g = 8) the trunk runs with g images
    concatenated along the lane axis, which 128-aligns every dy-window
    slice in the fused kernel AND its Mosaic backward — the round-2
    relayout tax that made kernel training lose at W=48 (BENCHNOTES.md).
    Returns 1 when already aligned or no valid fold exists."""
    import math

    if w % 128 == 0:
        return 1
    g = 128 // math.gcd(w, 128)
    return g if batch % g == 0 else 1


# Forward band-height lane cap, read at TRACE time by _pick_rows (the
# same convention as dense_block_cf_vjp.BWD_LANE_CAP_*): rows·w must
# stay under cap+1024 lanes with DMA delivery.  4096 is the
# everywhere-validated size — rows=16 at the folded W=384 save-acts
# geometry (6144 lanes) overflowed scoped VMEM by 564 KB inside the full
# train-step jit (BENCHNOTES round 3).  Tools raise it (--fwd_cap) to
# re-probe pure-inference contexts, whose VMEM margins are larger (no
# save-acts outputs, no surrounding grad graph).
FWD_LANE_CAP = 4096


def _pick_rows(h: int, w: int, cap: int | None = None, c_total: int = 192):
    """Band height for the channels-first Pallas kernels: the largest
    rows ∈ {32, 16, 8} dividing ``h`` with ``rows·w`` lanes under a
    VMEM budget — the kernels' fp32 accumulators and feature scratch
    scale with rows·w·channels.  The 4096-lane cap is calibrated for
    the canonical growth-32 block (c_total = 192 channels); wider
    blocks (the eriklindernoren growth-64 variant: c_total = 320)
    scale it down proportionally — measured: growth-64 at rows=32/W=128
    overflows the 16 MB scoped-VMEM limit by 304 KB.  When the band is
    lane-tile aligned, the kernel's DMA input delivery (no
    double-buffered grid blocks) frees VMEM — the budget rises to 5120
    lanes.  (6144 — rows=16 at the folded W=384 training geometry —
    compiled standalone but overflowed by 564 KB inside larger jit
    contexts, and measured no faster than rows=8 anyway; BENCHNOTES.md
    round 3.)  None → lax."""
    cap = FWD_LANE_CAP if cap is None else cap
    budget = cap * 192 // max(c_total, 1)
    dma_budget = (cap + 1024) * 192 // max(c_total, 1)
    for r in (32, 16, 8):
        if h % r != 0:
            continue
        aligned = (r * w) % 128 == 0 and ((r + 10) * w) % 128 == 0
        if r * w <= (dma_budget if aligned else budget):
            return r
    return None


def _conv3x3(x, features: int, *, name: str, scheme: str, dtype,
             impl: str = "lax"):
    if impl in ("pallas_fused", "pallas_cf", "pallas_cf_tail"):
        impl = "lax"   # fusion applies to dense blocks; stem/trunk stay lax
    return Conv3x3(features, scheme, dtype, impl, name=name)(x)


def _resolved(cfg: GeneratorConfig) -> GeneratorConfig:
    """cfg with ``conv_impl="auto"`` resolved for the current backend
    (config.resolve_conv_impl) — a no-op for explicit impls."""
    impl = resolve_conv_impl(cfg.conv_impl)
    if impl == cfg.conv_impl:
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, conv_impl=impl)


class _ConvParams(nn.Module):
    """Declares a Conv3x3-compatible {kernel, bias} pair without running a
    conv — lets the fused dense-block kernel consume the exact same param
    tree the per-conv path creates."""

    kshape: tuple
    scheme: str

    @nn.compact
    def __call__(self):
        kinit, binit = conv_inits(self.scheme, self.kshape)
        kernel = self.param("kernel", kinit, self.kshape, jnp.float32)
        bias = self.param("bias", binit, (self.kshape[-1],), jnp.float32)
        return kernel, bias


class DenseBlock(nn.Module):
    """5-conv dense block with residual scaling (ESRGAN paper §3.1).

    ``cfg.conv_impl='pallas_fused'`` routes the whole block through the
    fused Pallas kernel (ops/pallas/dense_block.py — one program, all
    intermediates VMEM-resident) with an identical param tree; requires
    the input height to be a multiple of 8, else falls back to the
    per-conv path."""

    cfg: GeneratorConfig
    dtype: Any = jnp.float32
    # per-image width when the trunk is batch-to-lane folded (RRDBNet
    # fold logic); None = unfolded input
    img_w: Any = None
    # flat padded chaining (RRDBNet trunk): x arrives as
    # (B, C, (h+2·halo)·W) with zero pad rows, h = flat_h — the fused
    # kernel reads/writes that layout directly, so chained blocks skip
    # the per-block pad/reshape (fwd AND bwd); None = (B, C, H, W)
    flat_h: Any = None

    def _declare_params(self, cin):
        """Declare the 5 conv param pairs (identical tree to the per-conv
        path) and return (weights, biases)."""
        cfg = self.cfg
        ws, bs = [], []
        for k in range(cfg.n_dense_convs):
            last = k == cfg.n_dense_convs - 1
            width = cfg.filters if last else cfg.growth
            kern, bias = _ConvParams((3, 3, cin, width), cfg.init,
                                     name=f"conv{k + 1}")()
            ws.append(kern.astype(self.dtype))
            bs.append(bias)
            if not last:
                cin += width
        return ws, bs

    @nn.compact
    def __call__(self, x):
        cfg = _resolved(self.cfg)
        c_total = x.shape[1] + (cfg.n_dense_convs - 1) * cfg.growth
        if self.flat_h is not None:
            # flat chained trunk: the RRDBNet caller already verified
            # the kernel path + alignment for this geometry
            from super_resolution_tpu.ops.pallas.dense_block_cf_vjp \
                import dense_block_cf_train

            h = self.flat_h
            w = x.shape[2] // (h + 2 * cfg.n_dense_convs)
            rows_cf = _pick_rows(h, w, c_total=c_total)
            assert rows_cf is not None, (h, w)
            ws, bs = self._declare_params(x.shape[1])
            return dense_block_cf_train(
                x.astype(self.dtype), ws, bs, rows_cf,
                cfg.res_scale, cfg.lrelu_slope, self.img_w, h)
        rows_cf = _pick_rows(x.shape[2], x.shape[3], c_total=c_total) \
            if cfg.conv_impl in ("pallas_cf", "pallas_cf_tail") else None
        if rows_cf is not None:
            # channels-first fused kernel, v5 (dy-in-K/dx-in-M) with a
            # custom Mosaic VJP (BENCHNOTES.md) — differentiable, so
            # training uses it too; x arrives as (B, C, H, W).  Heights
            # not divisible by 8 (or planes too wide for the VMEM budget)
            # fall through to the per-conv lax path below.
            from super_resolution_tpu.ops.pallas.dense_block_cf_vjp \
                import dense_block_cf_train

            ws, bs = self._declare_params(x.shape[1])
            return dense_block_cf_train(
                x.astype(self.dtype), ws, bs, rows_cf,
                cfg.res_scale, cfg.lrelu_slope, self.img_w)
        if cfg.conv_impl == "pallas_fused" and x.shape[1] % 8 == 0:
            from super_resolution_tpu.ops.pallas.dense_block import (
                fused_dense_block,
            )

            ws, bs = self._declare_params(x.shape[-1])
            rows = 16 if x.shape[1] % 16 == 0 else 8
            return fused_dense_block(
                x.astype(self.dtype), ws, bs, rows=rows,
                res_scale=cfg.res_scale, slope=cfg.lrelu_slope)

        # the folded layout exists only for the fused-kernel path — the
        # per-conv fallback below would convolve across fold boundaries
        assert self.img_w is None, \
            "folded trunk input requires the pallas_cf kernel path " \
            "(RRDBNet folds only when _pick_rows accepts the folded plane)"
        impl = "lax" if cfg.conv_impl in ("pallas_fused", "pallas_cf",
                                          "pallas_cf_tail") \
            else cfg.conv_impl
        # under pallas_cf the trunk runs NCHW; the per-conv fallback (odd
        # heights) works in NHWC, so transpose around it
        cf_fallback = cfg.conv_impl in ("pallas_cf", "pallas_cf_tail")
        feats = jnp.transpose(x, (0, 2, 3, 1)) if cf_fallback else x
        res_in = feats
        out = feats
        for k in range(cfg.n_dense_convs):
            last = k == cfg.n_dense_convs - 1
            width = cfg.filters if last else cfg.growth
            out = _conv3x3(feats, width, name=f"conv{k + 1}",
                           scheme=cfg.init, dtype=self.dtype,
                           impl=impl)
            if not last:
                out = nn.leaky_relu(out, cfg.lrelu_slope)
                feats = jnp.concatenate([feats, out], axis=-1)
        y = res_in + cfg.res_scale * out
        return jnp.transpose(y, (0, 3, 1, 2)) if cf_fallback else y


class RRDB(nn.Module):
    """Residual-in-Residual Dense Block: 3 dense blocks + outer residual."""

    cfg: GeneratorConfig
    dtype: Any = jnp.float32
    img_w: Any = None
    flat_h: Any = None

    @nn.compact
    def __call__(self, x):
        out = x
        for k in range(self.cfg.n_dense):
            out = DenseBlock(self.cfg, self.dtype, self.img_w,
                             self.flat_h, name=f"dense{k + 1}")(out)
        # elementwise residual — layout-agnostic, and under flat
        # chaining both operands have zero pad rows, so the sum does too
        return x + self.cfg.res_scale * out


class RRDBNet(nn.Module):
    """×4 super-resolution generator. Input/output NHWC in normalized space."""

    cfg: GeneratorConfig = GeneratorConfig()
    dtype: Any = jnp.float32

    def _conv_cf(self, x, features, *, name, act):
        """Tail conv on NCHW input.  Measured verdict (BENCHNOTES.md
        round 2): XLA's conv emitter WINS on the post-upsample planes —
        the Pallas single-conv kernel (ops/pallas/conv_cf.py) needs
        rows=8 bands at 512² to fit VMEM, and 512 tiny grid steps lose
        ~4 ms/batch vs XLA — so ``pallas_cf`` uses lax here (NCHW, fused
        LeakyReLU epilogue) and only the experimental ``pallas_cf_tail``
        takes the kernel.  Same {kernel, bias} param tree either way."""
        from super_resolution_tpu.ops.pallas.conv_cf import (
            conv3x3_cf,
            _lax_ref,
        )

        kern, bias = _ConvParams((3, 3, x.shape[1], features),
                                 self.cfg.init, name=name)()
        x = x.astype(self.dtype)
        kern = kern.astype(self.dtype)
        rows = (_pick_rows(x.shape[2], x.shape[3])
                if self.cfg.conv_impl == "pallas_cf_tail" else None)
        if rows is None:
            return _lax_ref(x, kern, bias, act, self.cfg.lrelu_slope)
        return conv3x3_cf(x, kern, bias, rows, act, self.cfg.lrelu_slope)

    @nn.compact
    def __call__(self, x):
        cfg = _resolved(self.cfg)
        x = x.astype(self.dtype)
        fea = _conv3x3(x, cfg.filters, name="conv_first", scheme=cfg.init,
                       dtype=self.dtype, impl=cfg.conv_impl)
        # the channels-first fused kernels run everything from the stem to
        # hr_conv in NCHW — two transposes total, hoisted out of the
        # 23-block trunk AND the upsample tail (odd heights fall back to
        # lax per-op inside DenseBlock/_conv_cf, still in NCHW)
        cf = cfg.conv_impl in ("pallas_cf", "pallas_cf_tail")
        if cf:
            fea = jnp.transpose(fea, (0, 3, 1, 2))
        trunk = fea
        img_w = None
        if cf:
            # batch-to-lane fold at unaligned widths: g images side by
            # side in lanes so the fused kernel (and its backward) see a
            # 128-aligned row width; elementwise RRDB residuals are
            # layout-agnostic, so the whole trunk runs folded and the
            # two reshapes amortize over all n_blocks·3 dense blocks.
            # Only fold when the folded plane passes the kernel's VMEM
            # row check — otherwise DenseBlock's per-conv fallback would
            # see a folded plane it cannot convolve.
            b_, c_, h_, w_ = trunk.shape
            g = _fold_factor(b_, w_)
            c_total = cfg.filters + (cfg.n_dense_convs - 1) * cfg.growth
            if g > 1 and _pick_rows(h_, g * w_, c_total=c_total) \
                    is not None:
                trunk = trunk.reshape(b_ // g, g, c_, h_, w_) \
                    .transpose(0, 2, 3, 1, 4) \
                    .reshape(b_ // g, c_, h_, g * w_)
                img_w = w_
        # flat padded chaining: when every block will take the fused
        # kernel at a lane-aligned width (W % 128 == 0 — always true
        # folded), pad the trunk with the blocks' halo ONCE and chain
        # the 3·n_blocks dense blocks in the flat (B, C, (h+2·halo)·W)
        # layout — no per-block pad/reshape in the forward OR backward
        # (the round-3 device trace priced those at ~3 ms/step of pure
        # copy traffic at b16·192²).
        flat_h = None
        if cf:
            from super_resolution_tpu.ops.pallas.dense_block_cf import (
                flat_io_ok,
            )
            from super_resolution_tpu.ops.pallas.dense_block_cf_vjp \
                import _bwd_rows

            bt, ct, ht, wt = trunk.shape
            c_total = cfg.filters + (cfg.n_dense_convs - 1) * cfg.growth
            halo = cfg.n_dense_convs
            rows_cf = _pick_rows(ht, wt, c_total=c_total)
            if (rows_cf is not None
                    and flat_io_ok(ht, wt, rows_cf, halo)
                    and flat_io_ok(ht, wt, _bwd_rows(ht, wt, rows_cf),
                                   halo)):
                flat_h = ht
                trunk = jnp.pad(
                    trunk, ((0, 0), (0, 0), (halo, halo), (0, 0))) \
                    .reshape(bt, ct, -1)
        for b in range(cfg.n_blocks):
            trunk = RRDB(cfg, self.dtype, img_w, flat_h,
                         name=f"block{b}")(trunk)
        if flat_h is not None:
            bt, ct, _ = trunk.shape
            halo = cfg.n_dense_convs
            hp = flat_h + 2 * halo
            wt = trunk.shape[2] // hp
            trunk = trunk.reshape(bt, ct, hp, wt)[:, :, halo:halo + flat_h]
        if img_w is not None:
            b_, c_, h_, w_ = fea.shape
            g = trunk.shape[3] // w_
            trunk = trunk.reshape(b_ // g, c_, h_, g, w_) \
                .transpose(0, 3, 1, 2, 4).reshape(b_, c_, h_, w_)
        if cf:
            fea = fea + self._conv_cf(trunk, cfg.filters,
                                      name="trunk_conv", act=False)
            for u in range(cfg.n_upsample):
                if cfg.upsampler == "nearest_conv":
                    if cfg.tail_up == "polyphase":
                        from super_resolution_tpu.ops.upsample_conv \
                            import nearest_up_conv_nchw

                        kern, bias = _ConvParams(
                            (3, 3, fea.shape[1], cfg.filters), cfg.init,
                            name=f"upconv{u + 1}")()
                        fea = nearest_up_conv_nchw(
                            fea.astype(self.dtype),
                            kern.astype(self.dtype), bias,
                            precision=precision_for(self.dtype))
                        fea = nn.leaky_relu(fea, cfg.lrelu_slope)
                    else:
                        fea = jnp.repeat(jnp.repeat(fea, 2, axis=2), 2,
                                         axis=3)
                        fea = self._conv_cf(fea, cfg.filters,
                                            name=f"upconv{u + 1}",
                                            act=True)
                elif cfg.upsampler == "pixelshuffle":
                    fea = self._conv_cf(fea, cfg.filters * 4,
                                        name=f"upconv{u + 1}", act=True)
                    b_, crr, h_, w_ = fea.shape
                    c_ = crr // 4
                    fea = fea.reshape(b_, c_, 2, 2, h_, w_) \
                        .transpose(0, 1, 4, 2, 5, 3) \
                        .reshape(b_, c_, h_ * 2, w_ * 2)
                else:
                    raise ValueError(f"unknown upsampler {cfg.upsampler!r}")
            fea = self._conv_cf(fea, cfg.filters, name="hr_conv", act=True)
            fea = jnp.transpose(fea, (0, 2, 3, 1))
            out = _conv3x3(fea, cfg.channels, name="conv_last",
                           scheme=cfg.init, dtype=self.dtype,
                           impl=cfg.conv_impl)
            return out.astype(jnp.float32)

        trunk = _conv3x3(trunk, cfg.filters, name="trunk_conv",
                         scheme=cfg.init, dtype=self.dtype,
                         impl=cfg.conv_impl)
        fea = fea + trunk

        for u in range(cfg.n_upsample):
            if cfg.upsampler == "nearest_conv":
                if cfg.tail_up == "polyphase":
                    from super_resolution_tpu.ops.upsample_conv import (
                        nearest_up_conv,
                    )

                    kern, bias = _ConvParams(
                        (3, 3, fea.shape[-1], cfg.filters), cfg.init,
                        name=f"upconv{u + 1}")()
                    fea = nearest_up_conv(
                        fea.astype(self.dtype), kern.astype(self.dtype),
                        bias, precision=precision_for(self.dtype))
                else:
                    fea = nearest_upsample(fea, 2)
                    fea = _conv3x3(fea, cfg.filters,
                                   name=f"upconv{u + 1}",
                                   scheme=cfg.init, dtype=self.dtype,
                                   impl=cfg.conv_impl)
                fea = nn.leaky_relu(fea, cfg.lrelu_slope)
            elif cfg.upsampler == "pixelshuffle":
                fea = _conv3x3(fea, cfg.filters * 4, name=f"upconv{u + 1}",
                               scheme=cfg.init, dtype=self.dtype,
                               impl=cfg.conv_impl)
                fea = nn.leaky_relu(fea, cfg.lrelu_slope)
                fea = pixel_shuffle(fea, 2)
            else:
                raise ValueError(f"unknown upsampler {cfg.upsampler!r}")

        fea = _conv3x3(fea, cfg.filters, name="hr_conv", scheme=cfg.init,
                       dtype=self.dtype, impl=cfg.conv_impl)
        fea = nn.leaky_relu(fea, cfg.lrelu_slope)
        out = _conv3x3(fea, cfg.channels, name="conv_last", scheme=cfg.init,
                       dtype=self.dtype, impl=cfg.conv_impl)
        return out.astype(jnp.float32)
