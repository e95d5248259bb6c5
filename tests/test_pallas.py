"""Pallas packed-taps conv kernel tests (interpret mode on CPU) and the
flag-gated RRDBNet integration (SURVEY.md §7 stage 6: lax fallback always
correct, pallas path verified against it)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from super_resolution_tpu.config import GeneratorConfig
from super_resolution_tpu.models import RRDBNet
from super_resolution_tpu.ops.pallas.packed_conv import (
    pack_weights,
    packed_conv3x3,
)


def _ref_conv(x, w, b, slope=0.2, act=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b
    return jnp.where(y >= 0, y, slope * y) if act else y


@pytest.mark.parametrize("shape,cout,rows", [
    ((2, 32, 100, 64), 32, 16),     # unaligned width
    ((1, 16, 128, 96), 32, 16),
    ((1, 32, 64, 160), 32, 8),
    ((2, 24, 48, 192), 64, 8),
    ((1, 8, 128, 3), 16, 8),        # RGB stem widths
])
def test_packed_conv_matches_lax(shape, cout, rows):
    kx, kw, kb = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (3, 3, shape[-1], cout), jnp.float32) * 0.05
    b = jax.random.normal(kb, (cout,), jnp.float32)
    ref = _ref_conv(x, w, b)
    with pltpu.force_tpu_interpret_mode():
        out = packed_conv3x3(x, w, b, rows=rows, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_packed_conv_no_activation():
    kx = jax.random.key(1)
    x = jax.random.normal(kx, (1, 16, 32, 32), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (3, 3, 32, 32),
                          jnp.float32) * 0.1
    b = jnp.zeros((32,))
    ref = _ref_conv(x, w, b, act=False)
    with pltpu.force_tpu_interpret_mode():
        out = packed_conv3x3(x, w, b, rows=8, apply_act=False,
                             out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pack_weights_layout():
    w = jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32).reshape(3, 3, 2, 4)
    wp = pack_weights(w)
    assert wp.shape == (2, 36)
    # lane (dy*3+dx)*F + f must equal w[dy, dx, c, f]
    for dy in range(3):
        for dx in range(3):
            for f in range(4):
                np.testing.assert_array_equal(
                    np.asarray(wp[:, (dy * 3 + dx) * 4 + f]),
                    np.asarray(w[dy, dx, :, f]))


def _ref_dense_block(x, ws, bs, slope=0.2, res_scale=0.2):
    feats = x
    for k, (w, b) in enumerate(zip(ws, bs)):
        y = jax.lax.conv_general_dilated(
            feats, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        if k < len(ws) - 1:
            y = jnp.where(y >= 0, y, slope * y)
            feats = jnp.concatenate([feats, y], -1)
    return x + res_scale * y


@pytest.mark.parametrize("shape,rows", [
    ((1, 16, 40, 32), 8),       # 3-input-block path (rows < 2*halo)
    ((2, 32, 64, 32), 16),      # 2-input-block path
    ((1, 24, 100, 32), 12),
])
def test_fused_dense_block_matches_lax(shape, rows):
    from super_resolution_tpu.ops.pallas.dense_block import (
        fused_dense_block,
    )

    nf, gc = shape[-1], 16
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(10 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(jax.random.key(20 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    ref = _ref_dense_block(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        out = fused_dense_block(x, ws, bs, rows=rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape,rows", [
    ((1, 16, 40, 32), 8),
    ((2, 32, 64, 32), 16),
])
def test_fused_dense_block_channels_first_matches_lax(shape, rows):
    """Kernel v3 (channels-first, packed-M, 3D contraction) —
    interpret-mode exact; compile-blocked on this Mosaic toolchain
    (the shipping variant is v3b below)."""
    from super_resolution_tpu.ops.pallas.experiments_dense_block \
        import fused_dense_block_cf

    nf, gc = shape[-1], 16
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(10 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(jax.random.key(20 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    ref = _ref_dense_block(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        ycf = fused_dense_block_cf(jnp.transpose(x, (0, 3, 1, 2)), ws, bs,
                                   rows=rows)
    out = jnp.transpose(ycf, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape,rows", [
    ((1, 16, 40, 32), 8),
    ((2, 32, 64, 32), 16),
    ((1, 24, 100, 32), 12),
])
def test_fused_dense_block_cf2_matches_lax(shape, rows):
    """Kernel v3b (2D-flattened channels-first) — the variant that BEATS
    XLA on-chip (BENCHNOTES.md: 1.35 vs 1.72 ms/block, 1.24x end-to-end
    model speedup)."""
    from super_resolution_tpu.ops.pallas.experiments_dense_block \
        import fused_dense_block_cf2

    nf, gc = shape[-1], 16
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(10 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(jax.random.key(20 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    ref = _ref_dense_block(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        ycf = fused_dense_block_cf2(jnp.transpose(x, (0, 3, 1, 2)), ws,
                                    bs, rows=rows)
    out = jnp.transpose(ycf, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape,rows", [
    ((1, 16, 40, 32), 8),
    ((2, 32, 64, 32), 16),
    ((1, 64, 48, 32), 32),
])
def test_fused_dense_block_cf3_matches_lax(shape, rows):
    """Kernel v4 (packed-K): one full-K matmul per conv instead of
    per-slab K=32 contractions."""
    from super_resolution_tpu.ops.pallas.experiments_dense_block \
        import fused_dense_block_cf3

    nf, gc = shape[-1], 16
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(10 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(jax.random.key(20 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    ref = _ref_dense_block(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        ycf = fused_dense_block_cf3(jnp.transpose(x, (0, 3, 1, 2)), ws,
                                    bs, rows=rows)
    out = jnp.transpose(ycf, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape,rows", [
    ((1, 16, 40, 32), 8),
    ((2, 32, 64, 32), 16),
    ((1, 64, 48, 32), 32),
])
def test_fused_dense_block_cf5_matches_lax(shape, rows):
    """Kernel v5 (dy-in-K / dx-in-M): the three dy taps fold into
    K-accumulated matmuls over aligned lane windows, leaving only three
    dx shift-adds on the VPU; band assembly is big aligned lane-block
    stores of the XLA-flattened input."""
    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        fused_dense_block_cf5,
    )

    nf, gc = shape[-1], 16
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(10 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(jax.random.key(20 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    ref = _ref_dense_block(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        ycf = fused_dense_block_cf5(jnp.transpose(x, (0, 3, 1, 2)), ws,
                                    bs, rows=rows)
    out = jnp.transpose(ycf, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.fast
def test_fused_dense_block_cf5_save_acts():
    """The save_acts activations (custom-VJP residuals) must equal the
    lax path's intermediate LeakyReLU outputs."""
    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        fused_dense_block_cf5,
    )

    nf, gc, rows = 16, 8, 8
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(50 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(60 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(7), (1, nf, 24, 16), jnp.float32)

    # lax intermediates
    feats = jnp.transpose(x, (0, 2, 3, 1))
    acts_ref = []
    for k, (w, b) in enumerate(zip(ws, bs)):
        y = jax.lax.conv_general_dilated(
            feats, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        if k < 4:
            y = jnp.where(y >= 0, y, 0.2 * y)
            feats = jnp.concatenate([feats, y], -1)
            acts_ref.append(jnp.transpose(y, (0, 3, 1, 2)))

    with pltpu.force_tpu_interpret_mode():
        _, acts = fused_dense_block_cf5(x, ws, bs, rows=rows,
                                        save_acts=True)
    for a, r in zip(acts, acts_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape,cout,rows,act", [
    ((1, 16, 32, 16), 16, 8, True),
    ((2, 8, 24, 24), 16, 8, False),
    ((1, 64, 40, 96), 32, 8, True),     # non-128 width
])
def test_conv3x3_cf_matches_lax(shape, cout, rows, act):
    """Single-conv channels-first kernel (ops/pallas/conv_cf.py) — the
    tail convs of the pallas_cf model path (trunk_conv, upconvs,
    hr_conv)."""
    from super_resolution_tpu.ops.pallas.conv_cf import (
        conv3x3_cf,
        _lax_ref,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[1], cout).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    ref = _lax_ref(x, w, b, act, 0.2)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_cf(x, w, b, rows, act, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_conv3x3_cf_grads_match_lax():
    """The custom VJP delegates to the lax conv's VJP — grads must be
    exactly the lax-path grads."""
    from super_resolution_tpu.ops.pallas.conv_cf import (
        conv3x3_cf,
        _lax_ref,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)

    def loss_k(x, w, b):
        return jnp.sum(conv3x3_cf(x, w, b, 8, True, 0.2) ** 2)

    def loss_r(x, w, b):
        return jnp.sum(_lax_ref(x, w, b, True, 0.2) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_dense_block_cf_custom_vjp_matches_lax_grads():
    """jax.grad through the fused block (Pallas fwd + Pallas bwd) must
    match lax-path grads to fp32 tolerance — the round-1 VERDICT item 2
    'Done' criterion."""
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    nf, gc, rows = 16, 8, 8
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(30 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(40 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(1), (2, nf, 24, 16), jnp.float32)
    tgt = jax.random.normal(jax.random.key(2), x.shape, jnp.float32)

    def loss_ref(x, ws, bs):
        y = _ref_dense_block(jnp.transpose(x, (0, 2, 3, 1)), ws, bs)
        return jnp.sum((jnp.transpose(y, (0, 3, 1, 2)) - tgt) ** 2)

    def loss_ker(x, ws, bs):
        return jnp.sum((dense_block_cf_train(x, ws, bs, rows, 0.2, 0.2)
                        - tgt) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(gk[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)
    for a, b in zip(gk[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_dense_block_cf_kernel_bwd_aligned_width():
    """W % 128 == 0 routes differentiation through the hand-written
    Mosaic backward (unaligned widths use the lax path instead — the
    width-dependent VJP routing measured in BENCHNOTES.md round 2).
    Grads must match lax to fp32 tolerance."""
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    nf, gc, rows = 8, 4, 8
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(70 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(80 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(9), (1, nf, 16, 128),
                          jnp.float32)
    tgt = jax.random.normal(jax.random.key(10), x.shape, jnp.float32)

    def loss_ref(x, ws, bs):
        y = _ref_dense_block(jnp.transpose(x, (0, 2, 3, 1)), ws, bs)
        return jnp.sum((jnp.transpose(y, (0, 3, 1, 2)) - tgt) ** 2)

    def loss_ker(x, ws, bs):
        return jnp.sum((dense_block_cf_train(x, ws, bs, rows, 0.2, 0.2)
                        - tgt) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(gk[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("save_acts", [False, True])
def test_dense_block_cf5_flat_io_matches_4d(save_acts):
    """Flat padded chaining (round 3): with ``flat_h`` the kernel
    consumes/produces (B, C, (h+2·halo)·W) buffers with zero pad rows —
    outputs must equal the 4-D path exactly, pad rows must come back
    zero (the next block's input contract), and acts likewise."""
    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        flat_io_ok,
        fused_dense_block_cf5,
    )

    nf, gc, rows, h, w = 8, 4, 8, 24, 128
    halo = 5
    assert flat_io_ok(h, w, rows)
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(90 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(95 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(7), (2, nf, h, w), jnp.float32)
    x_flat = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0))) \
        .reshape(2, nf, -1)

    with pltpu.force_tpu_interpret_mode():
        ref = fused_dense_block_cf5(x, ws, bs, rows=rows,
                                    save_acts=save_acts)
        got = fused_dense_block_cf5(x_flat, ws, bs, rows=rows,
                                    save_acts=save_acts, flat_h=h)
    if save_acts:
        ref, ref_acts = ref
        got, got_acts = got
    gp = np.asarray(got).reshape(2, nf, h + 2 * halo, w)
    np.testing.assert_allclose(gp[:, :, halo:halo + h], np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert np.all(gp[:, :, :halo] == 0) and np.all(gp[:, :, halo + h:] == 0)
    if save_acts:
        for a_ref, a_got in zip(ref_acts, got_acts):
            ap = np.asarray(a_got).reshape(2, gc, h + 2 * halo, w)
            np.testing.assert_allclose(ap[:, :, halo:halo + h],
                                       np.asarray(a_ref),
                                       atol=1e-5, rtol=1e-5)
            assert np.all(ap[:, :, :halo] == 0)
            assert np.all(ap[:, :, halo + h:] == 0)


@pytest.mark.parametrize("save_acts", [False, True])
@pytest.mark.parametrize("geom", [
    (16, 128, 8, 2, None, False),     # aligned width, 4-D
    (16, 384, 8, 2, 48, False),       # batch-to-lane folded (training)
    (8, 128, 8, 1, None, False),      # single band (first == last)
    (24, 128, 8, 2, None, True),      # flat padded chaining
])
def test_dense_block_cf9_matches_cf5(save_acts, geom):
    """The dy-extended kernel (v9, dense_block_cf_ext.py) must equal v5
    on every production geometry: 4-D aligned, batch-to-lane folded,
    single-band, and flat padded chaining (incl. the pad-row-zero
    contract and the save-acts residuals)."""
    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        fused_dense_block_cf5,
    )
    from super_resolution_tpu.ops.pallas.dense_block_cf_ext import (
        fused_dense_block_cf9,
    )

    h, w, rows, batch, img_w, flat = geom
    nf, gc, halo = 8, 4, 5
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(130 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(140 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(11), (batch, nf, h, w),
                          jnp.float32)
    if flat:
        x = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0))) \
            .reshape(batch, nf, -1)
    kw = dict(rows=rows, save_acts=save_acts, img_w=img_w,
              flat_h=h if flat else None)
    with pltpu.force_tpu_interpret_mode():
        r5 = fused_dense_block_cf5(x, ws, bs, **kw)
        r9 = fused_dense_block_cf9(x, ws, bs, **kw)
    if save_acts:
        (y5, a5), (y9, a9) = r5, r9
        for a, b in zip(a5, a9):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
    else:
        y5, y9 = r5, r9
    np.testing.assert_allclose(np.asarray(y5), np.asarray(y9),
                               atol=1e-5, rtol=1e-5)
    if flat:
        yp = np.asarray(y9).reshape(batch, nf, h + 2 * halo, w)
        assert np.all(yp[:, :, :halo] == 0)
        assert np.all(yp[:, :, halo + h:] == 0)


def test_dense_block_cf_train_flat_chain_grads_match_lax():
    """Two flat-chained blocks with an RRDB-style residual: grads of a
    slice-then-MSE loss must match the lax reference — the end-to-end
    contract of the flat trunk layout (pad-row cotangent spill values
    must never leak into real gradients)."""
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    nf, gc, rows, h, w = 8, 4, 8, 16, 128
    halo = 5

    def mk(seed):
        ws, bs = [], []
        cin = nf
        for k in range(5):
            cout = nf if k == 4 else gc
            ws.append(jax.random.normal(jax.random.key(seed + k),
                                        (3, 3, cin, cout),
                                        jnp.float32) * 0.1)
            bs.append(jax.random.normal(jax.random.key(seed + 50 + k),
                                        (cout,), jnp.float32) * 0.1)
            cin += gc
        return ws, bs

    ws1, bs1 = mk(300)
    ws2, bs2 = mk(400)
    x = jax.random.normal(jax.random.key(3), (2, nf, h, w), jnp.float32)
    tgt = jax.random.normal(jax.random.key(4), x.shape, jnp.float32)

    def loss_flat(x):
        t = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0))) \
            .reshape(2, nf, -1)
        t = t + 0.2 * dense_block_cf_train(t, ws1, bs1, rows, 0.2, 0.2,
                                           None, h)
        t = t + 0.2 * dense_block_cf_train(t, ws2, bs2, rows, 0.2, 0.2,
                                           None, h)
        y = t.reshape(2, nf, h + 2 * halo, w)[:, :, halo:halo + h]
        return jnp.mean((y - tgt) ** 2)

    def loss_ref(x):
        t = jnp.transpose(x, (0, 2, 3, 1))
        t = t + 0.2 * _ref_dense_block(t, ws1, bs1)
        t = t + 0.2 * _ref_dense_block(t, ws2, bs2)
        return jnp.mean((jnp.transpose(t, (0, 3, 1, 2)) - tgt) ** 2)

    gr = jax.grad(loss_ref)(x)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_flat)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("h", [8, 24])
def test_dense_block_cf_kernel_bwd_carry_band_counts(h):
    """The backward's in-kernel carry overlap-add across the band grid
    (round-3 fix for the on-chip overlap-add miscompile) at the edge
    band counts: n_bands=1 (the single band is first AND last — zero
    carry in, chunk+tail flushed in one DMA) and n_bands=3 (a 2·halo
    tail spans more than one future band, exercising the transitive
    carry).  Aligned W=128 keeps the DMA/carry path selected."""
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    nf, gc, rows = 8, 4, 8
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(170 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(180 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(19), (2, nf, h, 128),
                          jnp.float32)
    tgt = jax.random.normal(jax.random.key(20), x.shape, jnp.float32)

    def loss_ref(x, ws, bs):
        y = _ref_dense_block(jnp.transpose(x, (0, 2, 3, 1)), ws, bs)
        return jnp.sum((jnp.transpose(y, (0, 3, 1, 2)) - tgt) ** 2)

    def loss_ker(x, ws, bs):
        return jnp.sum((dense_block_cf_train(x, ws, bs, rows, 0.2, 0.2)
                        - tgt) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(gk[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)
    for a, b in zip(gk[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_training_through_pallas_cf_kernel():
    """conv_impl='pallas_cf' trains THROUGH the fused kernel (custom
    VJP) on a single chip when the LR width is lane-aligned: one
    pretrain step matches the lax-path step to fp32 tolerance, params
    included.  Unaligned widths and DP fall back to lax (measured
    routing, BENCHNOTES.md round 2)."""
    import sys
    sys.path.insert(0, "tests")
    from test_train import tiny_cfg

    import dataclasses

    from super_resolution_tpu.train import init_state, make_pretrain_step
    from super_resolution_tpu.train.steps import _training_cfg
    from super_resolution_tpu.data import SyntheticPatches

    base = tiny_cfg()
    cfg = dataclasses.replace(
        base, generator=dataclasses.replace(base.generator,
                                            conv_impl="pallas_cf"))
    # single-chip aligned width (LR 512/4 = 128): kernel path survives
    aligned = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, hr_patch=512))
    assert _training_cfg(aligned).generator.conv_impl == "pallas_cf"
    # unaligned training width (tiny_cfg default): measured slower -> lax
    assert _training_cfg(cfg).generator.conv_impl == "lax"
    # DP at aligned width: the partitioned bwd psums weight grads ->
    # the kernel path survives
    assert _training_cfg(dataclasses.replace(
        aligned, data_parallel=8)).generator.conv_impl == "pallas_cf"

    batch = jnp.asarray(next(iter(SyntheticPatches(cfg.data, seed=0))))
    state = init_state(cfg)
    with pltpu.force_tpu_interpret_mode():
        state_k, mk = make_pretrain_step(cfg)(state, batch)
    state_l, ml = make_pretrain_step(base)(init_state(base), batch)
    np.testing.assert_allclose(float(mk["loss_pixel"]),
                               float(ml["loss_pixel"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_k.g_params),
                    jax.tree.leaves(state_l.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_pallas_cf_odd_height_falls_back_to_lax():
    """Heights not divisible by 8 must not crash the pallas_cf path — the
    dense block AND the tail convs fall back to per-conv lax with
    identical params (ADVICE.md round 1: cli upscale --conv_impl
    pallas_cf --tile 100).  Interpret mode is needed because the
    ×2/×4-upsampled heights (40, 80) ARE divisible by 8, so the tail
    upconv/hr convs legitimately take the Pallas kernel."""
    cfg_lax = GeneratorConfig(n_blocks=1, filters=16, growth=8)
    cfg_pal = GeneratorConfig(n_blocks=1, filters=16, growth=8,
                              conv_impl="pallas_cf")
    x = jax.random.normal(jax.random.key(5), (1, 20, 24, 3))  # H=20: 20%8=4
    v = RRDBNet(cfg_lax).init(jax.random.key(6), x)
    ref = RRDBNet(cfg_lax).apply(v, x)
    with pltpu.force_tpu_interpret_mode():
        out = RRDBNet(cfg_pal).apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["pallas", "pallas_fused", "pallas_cf"])
def test_rrdbnet_pallas_impl_matches_lax(impl):
    """Same params, all conv implementations, same output — the param
    tree is implementation-agnostic."""
    cfg_lax = GeneratorConfig(n_blocks=1, filters=16, growth=8)
    cfg_pal = GeneratorConfig(n_blocks=1, filters=16, growth=8,
                              conv_impl=impl)
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 3))
    v = RRDBNet(cfg_lax).init(jax.random.key(4), x)
    ref = RRDBNet(cfg_lax).apply(v, x)
    with pltpu.force_tpu_interpret_mode():
        out = RRDBNet(cfg_pal).apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("shape,rows", [
    ((1, 16, 40, 32), 8),
    ((2, 32, 64, 32), 16),
])
def test_fused_dense_block_cf6_matches_lax(shape, rows):
    """Kernel v6 (dy-extended operand: one K=3C matmul per conv) —
    measured ≈ v5 within noise on-chip (BENCHNOTES.md); kept as a
    documented experiment."""
    from super_resolution_tpu.ops.pallas.experiments_dense_block \
        import fused_dense_block_cf6

    nf, gc = shape[-1], 16
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(10 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.05)
        bs.append(jax.random.normal(jax.random.key(20 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    ref = _ref_dense_block(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        ycf = fused_dense_block_cf6(jnp.transpose(x, (0, 3, 1, 2)), ws,
                                    bs, rows=rows)
    out = jnp.transpose(ycf, (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_dense_block_cf8_int8_accuracy():
    """Kernel v8 (int8 MXU, dynamic quantization): per-block error vs the
    fp32 kernel must stay in the ~1% relative class (per-channel weight
    scales + per-band activation scales)."""
    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        fused_dense_block_cf5,
    )
    from super_resolution_tpu.ops.pallas.experiments_dense_block \
        import fused_dense_block_cf8

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 32, 16).astype(np.float32))
    ws, bs = [], []
    cin = 16
    for k in range(5):
        cout = 16 if k == 4 else 8
        ws.append(jnp.asarray(
            rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05))
        bs.append(jnp.asarray(rng.randn(cout).astype(np.float32) * 0.05))
        if k < 4:
            cin += 8
    with pltpu.force_tpu_interpret_mode():
        ref = fused_dense_block_cf5(x, ws, bs, rows=8)
        got = fused_dense_block_cf8(x, ws, bs, rows=8)
    rel = float(jnp.abs(got - ref).max()) / float(jnp.abs(ref).max())
    assert rel < 0.02, rel


def _rand_block_params(nf, gc, seed=100):
    ws, bs = [], []
    cin = nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(seed + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(seed + 50 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    return ws, bs


def _fold_cf(x, g):
    """(B, C, H, W) → (B/g, C, H, g·W): g images side by side in lanes."""
    b, c, h, w = x.shape
    return jnp.transpose(x.reshape(b // g, g, c, h, w),
                         (0, 2, 3, 1, 4)).reshape(b // g, c, h, g * w)


def _unfold_cf(y, g):
    b, c, h, gw = y.shape
    w = gw // g
    return jnp.transpose(y.reshape(b, c, h, g, w),
                         (0, 3, 1, 2, 4)).reshape(b * g, c, h, w)


def test_fused_dense_block_cf5_batch_fold_matches_lax():
    """Batch-to-lane folding (img_w < lane width): g images concatenated
    along lanes must produce exactly the per-image results — the dx edge
    masks must not leak pixels across fold boundaries (round-3 aligned-
    width training design, BENCHNOTES.md)."""
    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        fused_dense_block_cf5,
    )

    nf, gc, g, rows = 16, 8, 4, 8
    ws, bs = _rand_block_params(nf, gc)
    x = jax.random.normal(jax.random.key(3), (4, 16, nf, 32), jnp.float32)
    x = jnp.transpose(x, (0, 2, 1, 3))          # (4, nf, 16, 32)
    ref = _ref_dense_block(jnp.transpose(x, (0, 2, 3, 1)), ws, bs)
    ref = jnp.transpose(ref, (0, 3, 1, 2))

    with pltpu.force_tpu_interpret_mode():
        y_fold = fused_dense_block_cf5(_fold_cf(x, g), ws, bs, rows=rows,
                                       img_w=32)
    out = _unfold_cf(y_fold, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_dense_block_cf_vjp_batch_fold_matches_lax_grads():
    """Grads through the folded kernel fwd+bwd == lax grads on the
    unfolded batch (dW/db sum over all images, dx per image)."""
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    nf, gc, g, rows = 16, 8, 4, 8
    ws, bs = _rand_block_params(nf, gc, seed=200)
    x = jax.random.normal(jax.random.key(4), (4, nf, 16, 32), jnp.float32)
    tgt = jax.random.normal(jax.random.key(5), x.shape, jnp.float32)

    def loss_ref(x, ws, bs):
        y = _ref_dense_block(jnp.transpose(x, (0, 2, 3, 1)), ws, bs)
        return jnp.sum((jnp.transpose(y, (0, 3, 1, 2)) - tgt) ** 2)

    def loss_fold(x, ws, bs):
        y = dense_block_cf_train(_fold_cf(x, g), ws, bs, rows, 0.2, 0.2,
                                 32)
        return jnp.sum((_unfold_cf(y, g) - tgt) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_fold, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=2e-4, rtol=1e-4)
    for a, b in zip(gk[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)
    for a, b in zip(gk[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_rrdbnet_pallas_cf_folds_unaligned_width():
    """End-to-end: RRDBNet with pallas_cf at an unaligned LR width folds
    the trunk automatically (g = 128/gcd(W,128)) and matches the lax
    model output AND gradients."""
    cfg_lax = GeneratorConfig(n_blocks=1, filters=16, growth=8,
                              conv_impl="lax")
    cfg_cf = GeneratorConfig(n_blocks=1, filters=16, growth=8,
                             conv_impl="pallas_cf")
    x = jax.random.normal(jax.random.key(6), (4, 16, 32, 3), jnp.float32)
    net_lax = RRDBNet(cfg_lax, dtype=jnp.float32)
    net_cf = RRDBNet(cfg_cf, dtype=jnp.float32)
    params = net_lax.init(jax.random.key(0), x[:1])

    y_ref = net_lax.apply(params, x)
    with pltpu.force_tpu_interpret_mode():
        y_cf = net_cf.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_cf), np.asarray(y_ref),
                               atol=5e-5, rtol=1e-4)

    tgt = jax.random.normal(jax.random.key(7),
                            (4, 64, 128, 3), jnp.float32)
    g_ref = jax.grad(
        lambda p: jnp.mean((net_lax.apply(p, x) - tgt) ** 2))(params)
    with pltpu.force_tpu_interpret_mode():
        g_cf = jax.grad(
            lambda p: jnp.mean((net_cf.apply(p, x) - tgt) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_cf), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=2e-3)


@pytest.mark.fast
def test_training_cfg_fold_routing():
    """_training_cfg keeps pallas_cf at unaligned widths when the
    batch-to-lane fold applies — single device OR under DP when every
    fold group is shard-local (batch divisible by g·dp, round 4) — and
    falls back to lax otherwise."""
    import dataclasses as dc

    from super_resolution_tpu.config import DataConfig, TrainConfig
    from super_resolution_tpu.train.steps import _training_cfg

    base = TrainConfig(
        generator=GeneratorConfig(conv_impl="pallas_cf"),
        data=DataConfig(hr_patch=192, batch_size=16))
    # W=48, g=8 | 16 → kernel stays
    assert _training_cfg(base).generator.conv_impl == "pallas_cf"
    # batch not divisible by g → lax
    b6 = dc.replace(base, data=dc.replace(base.data, batch_size=6))
    assert _training_cfg(b6).generator.conv_impl == "lax"
    # DP×fold (config 5): batch 64 over 8 shards → local batch 8 = g →
    # fold groups are shard-local → kernel stays (round-3 VERDICT item 2)
    dp64 = dc.replace(base, data_parallel=8,
                      data=dc.replace(base.data, batch_size=64))
    assert _training_cfg(dp64).generator.conv_impl == "pallas_cf"
    # DP with local batch < g (16/8 = 2 < 8): a fold group would
    # straddle shards → lax
    dp = dc.replace(base, data_parallel=8)
    assert _training_cfg(dp).generator.conv_impl == "lax"
    # aligned width → kernel regardless
    al = dc.replace(dp, data=dc.replace(base.data, hr_patch=512,
                                        batch_size=4))
    assert _training_cfg(al).generator.conv_impl == "pallas_cf"


@pytest.mark.fast
def test_cf9_dispatch_selection():
    """partitioned._fwd_kernel routes the fused forward to the
    dy-extended v9 kernel only when CF9_ENABLED is on, the width passes
    ext_ok (W % 128 == 0) and the 3× extended scratch fits the VMEM cap
    — everything else stays on v5 (incl. the backward, always v5)."""
    from super_resolution_tpu.ops.pallas import partitioned as pt
    from super_resolution_tpu.ops.pallas.dense_block_cf import (
        fused_dense_block_cf5,
    )
    from super_resolution_tpu.ops.pallas.dense_block_cf_ext import (
        fused_dense_block_cf9,
    )

    nf, gc = 8, 4
    ws, cin = [], nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jnp.zeros((3, 3, cin, cout), jnp.float32))
        cin += gc
    x128 = jnp.zeros((1, nf, 16, 128), jnp.float32)
    x48 = jnp.zeros((1, nf, 16, 48), jnp.float32)
    old = pt.CF9_ENABLED
    try:
        pt.CF9_ENABLED = False
        assert pt._fwd_kernel(x128, ws, 8, None) is fused_dense_block_cf5
        pt.CF9_ENABLED = True
        assert pt._fwd_kernel(x128, ws, 8, None) is fused_dense_block_cf9
        # unaligned width → v5
        assert pt._fwd_kernel(x48, ws, 8, None) is fused_dense_block_cf5
        # flat layout: W recovered from flat_h; aligned → v9
        xf = jnp.zeros((1, nf, (16 + 10) * 128), jnp.float32)
        assert pt._fwd_kernel(xf, ws, 8, 16) is fused_dense_block_cf9
        # extended scratch past the VMEM cap → v5
        xw = jnp.zeros((1, nf, 8, 128 * 1024), jnp.float32)
        assert pt._fwd_kernel(xw, ws, 8, None) is fused_dense_block_cf5
    finally:
        pt.CF9_ENABLED = old


def test_cf9_dispatch_train_grads_match_lax():
    """With CF9_ENABLED the custom-VJP *forward* (primal + save-acts)
    runs the v9 kernel while the backward stays v5 — v9's saved
    activations must drop into the v5 backward unchanged, so end-to-end
    grads of an L2 loss still match the lax reference.  A spy on the
    partitioned module's v9 binding proves the dispatch actually
    fired."""
    from super_resolution_tpu.ops.pallas import partitioned as pt
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    nf, gc, rows, h, w = 8, 4, 8, 16, 128
    ws, bs, cin = [], [], nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(500 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(510 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(21), (2, nf, h, w), jnp.float32)
    tgt = jax.random.normal(jax.random.key(22), x.shape, jnp.float32)

    def loss_ref(x, ws, bs):
        y = _ref_dense_block(jnp.transpose(x, (0, 2, 3, 1)), ws, bs)
        return jnp.sum((jnp.transpose(y, (0, 3, 1, 2)) - tgt) ** 2)

    def loss_ker(x, ws, bs):
        return jnp.sum((dense_block_cf_train(x, ws, bs, rows, 0.2, 0.2)
                        - tgt) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)

    calls = []
    real_cf9 = pt.fused_dense_block_cf9

    def spy(*a, **kw):
        calls.append(kw.get("save_acts", False))
        return real_cf9(*a, **kw)

    old = pt.CF9_ENABLED
    pt.fused_dense_block_cf9 = spy
    try:
        pt.CF9_ENABLED = True
        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(loss_ker, argnums=(0, 1, 2))(x, ws, bs)
    finally:
        pt.CF9_ENABLED = old
        pt.fused_dense_block_cf9 = real_cf9
        # drop the CF9=True traces: the flag is trace-time state, so a
        # later test reusing this jit signature would silently replay
        # the v9 dispatch with the flag off
        jax.clear_caches()

    assert True in calls, "v9 save-acts forward never dispatched"
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_rrdbnet_forward_with_cf9_dispatch_matches_lax():
    """CF9_ENABLED at model level: an aligned-width (W=128) RRDBNet
    forward — which takes the flat-chained trunk, so the v9 kernel sees
    the production flat layout through the real model wiring — must
    match the lax reference with the same params."""
    from super_resolution_tpu.ops.pallas import partitioned as pt

    cfg_lax = GeneratorConfig(n_blocks=1, filters=16, growth=8)
    cfg_pal = GeneratorConfig(n_blocks=1, filters=16, growth=8,
                              conv_impl="pallas_cf")
    x = jax.random.normal(jax.random.key(7), (1, 16, 128, 3))
    v = RRDBNet(cfg_lax).init(jax.random.key(8), x)
    ref = RRDBNet(cfg_lax).apply(v, x)

    calls = []
    real_cf9 = pt.fused_dense_block_cf9

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return real_cf9(*a, **kw)

    old = pt.CF9_ENABLED
    pt.fused_dense_block_cf9 = spy
    try:
        pt.CF9_ENABLED = True
        with pltpu.force_tpu_interpret_mode():
            out = RRDBNet(cfg_pal).apply(v, x)
    finally:
        pt.CF9_ENABLED = old
        pt.fused_dense_block_cf9 = real_cf9
        jax.clear_caches()     # see test_cf9_dispatch_train_grads note

    assert calls, "v9 never dispatched through the model"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("n_convs,nf,gc,h,w,rows", [
    (4, 8, 4, 16, 128, 8),      # non-default conv count, DMA mode
    (5, 16, 4, 16, 16, 8),      # unaligned width, block mode
    (3, 8, 8, 12, 128, 6),      # halo=3, growth==cin
])
def test_dense_block_cf_train_grads_general_geometries(n_convs, nf, gc,
                                                       h, w, rows):
    """The split dfeats scratch (dx channels full-band, activation-grad
    segments two rows narrower at lane offset −w) must hold for ANY
    conv count / channel mix, not just the canonical 5-conv block —
    grads of an L2 loss vs the lax reference."""
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        dense_block_cf_train,
    )

    ws, bs, cin = [], [], nf
    for k in range(n_convs):
        cout = nf if k == n_convs - 1 else gc
        ws.append(jax.random.normal(jax.random.key(600 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(620 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(23), (2, nf, h, w), jnp.float32)
    tgt = jax.random.normal(jax.random.key(24), x.shape, jnp.float32)

    def loss_ref(x, ws, bs):
        y = _ref_dense_block(jnp.transpose(x, (0, 2, 3, 1)), ws, bs)
        return jnp.sum((jnp.transpose(y, (0, 3, 1, 2)) - tgt) ** 2)

    def loss_ker(x, ws, bs):
        return jnp.sum((dense_block_cf_train(x, ws, bs, rows, 0.2, 0.2)
                        - tgt) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize("save_acts", [False, True])
@pytest.mark.parametrize("geom", [
    (24, 128, 8, 2, None, False),     # aligned width, 3 bands (steady)
    (16, 384, 8, 2, 48, False),       # batch-to-lane folded (training)
    (8, 128, 8, 1, None, False),      # single band (no carry runs)
    (24, 128, 8, 2, None, True),      # flat padded chaining
])
def test_fwd_carry_matches_classic(save_acts, geom):
    """FWD_CARRY_ENABLED (upward-halo carry): bands after the first
    splice the previous band's activation rows instead of recomputing
    them — the output must match the classic kernel on every production
    geometry.  The spliced rows are the very same matmul results, but
    the freshly computed rows come from narrower matmuls (m_out =
    rows·W), whose interpret-mode accumulation differs by ~1 fp32 ULP
    at W = 384 — hence allclose at 1e-6, not assert_array_equal.

    jax.clear_caches() after each flag flip is ESSENTIAL: the flag is
    read at trace time and both calls share one jit signature, so
    without it the second call replays the first trace and the test
    compares the classic kernel to itself (found vacuous in round 3,
    masking exactly this folded-geometry variance)."""
    from super_resolution_tpu.ops.pallas import dense_block_cf as mod

    h, w, rows, batch, img_w, flat = geom
    nf, gc, halo = 8, 4, 5
    ws, bs, cin = [], [], nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(700 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(720 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(25), (batch, nf, h, w),
                          jnp.float32)
    if flat:
        x = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0))) \
            .reshape(batch, nf, -1)
    kw = dict(rows=rows, save_acts=save_acts, img_w=img_w,
              flat_h=h if flat else None)

    old = mod.FWD_CARRY_ENABLED
    try:
        with pltpu.force_tpu_interpret_mode():
            mod.FWD_CARRY_ENABLED = False
            jax.clear_caches()
            ref = mod.fused_dense_block_cf5(x, ws, bs, **kw)
            mod.FWD_CARRY_ENABLED = True
            jax.clear_caches()
            got = mod.fused_dense_block_cf5(x, ws, bs, **kw)
    finally:
        mod.FWD_CARRY_ENABLED = old
        jax.clear_caches()

    ra = (list(ref[1]) + [ref[0]]) if save_acts else [ref]
    ga = (list(got[1]) + [got[0]]) if save_acts else [got]
    for a, b in zip(ga, ra):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("geom,n_convs", [
    ((24, 128, 8, 2, None, False), 5),   # aligned width, 3 bands
    ((8, 128, 8, 1, None, False), 5),    # single band (first AND last:
                                         # zero carries + tail sweep)
    ((16, 384, 8, 2, 48, False), 5),     # batch-to-lane folded (training)
    ((24, 128, 8, 2, None, True), 5),    # flat padded chaining
    ((16, 128, 8, 2, None, False), 4),   # non-default halo
    ((10, 128, 5, 1, None, False), 5),   # rows == halo (the gate
                                         # minimum: maximal stash/splice
                                         # overlap inside one band)
])
def test_bwd_carry_grads_match_classic(geom, n_convs):
    """BWD_CARRY_ENABLED (backward halo-recompute carry): every band
    processes exactly `rows` COMPLETED cotangent rows per conv, carrying
    the unfinished activation-grad/dx tails instead of recomputing the
    ±(halo−k−1)-row windows — grads of an L2 loss must match the
    classic Mosaic backward (itself lax-verified elsewhere) on every
    production geometry.  Same clear_caches() discipline as
    test_fwd_carry_matches_classic (the flag is trace-time state), and
    bwd_carry_active() proves the carry really engaged — without it a
    gate regression would silently compare classic to classic."""
    from super_resolution_tpu.ops.pallas import dense_block_cf_vjp as vjp
    from super_resolution_tpu.ops.pallas.dense_block_cf_vjp import (
        bwd_carry_active,
        dense_block_cf_train,
    )

    h, w, rows, batch, img_w, flat = geom
    nf, gc, halo = 8, 4, n_convs
    ws, bs, cin = [], [], nf
    for k in range(n_convs):
        cout = nf if k == n_convs - 1 else gc
        ws.append(jax.random.normal(jax.random.key(900 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(920 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(29), (batch, nf, h, w),
                          jnp.float32)
    tgt = jax.random.normal(jax.random.key(30), x.shape, jnp.float32)

    if flat:
        def loss(x, ws, bs):
            t = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0))) \
                .reshape(batch, nf, -1)
            y = dense_block_cf_train(t, ws, bs, rows, 0.2, 0.2, img_w, h)
            y = y.reshape(batch, nf, h + 2 * halo, w)[:, :, halo:halo + h]
            return jnp.sum((y - tgt) ** 2)
    else:
        def loss(x, ws, bs):
            y = dense_block_cf_train(x, ws, bs, rows, 0.2, 0.2, img_w)
            return jnp.sum((y - tgt) ** 2)

    old = vjp.BWD_CARRY_ENABLED
    try:
        with pltpu.force_tpu_interpret_mode():
            vjp.BWD_CARRY_ENABLED = False
            jax.clear_caches()
            g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
            vjp.BWD_CARRY_ENABLED = True
            assert bwd_carry_active(w, rows, n_convs), geom
            jax.clear_caches()
            g_car = jax.grad(loss, argnums=(0, 1, 2))(x, ws, bs)
    finally:
        vjp.BWD_CARRY_ENABLED = old
        jax.clear_caches()

    for a, b in zip(jax.tree.leaves(g_car), jax.tree.leaves(g_ref)):
        b = np.asarray(b)
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5,
                                   atol=1e-5 * (np.abs(b).max() + 1e-9))


@pytest.mark.parametrize("save_acts", [False, True])
@pytest.mark.parametrize("geom", [
    (24, 128, 8, 2, None, False),     # aligned width, 3 bands (steady)
    (16, 384, 8, 2, 48, False),       # batch-to-lane folded (training)
    (24, 128, 8, 2, None, True),      # flat padded chaining
])
def test_fwd_carry_v9_matches_classic(save_acts, geom):
    """The upward-halo carry ported to the dy-extended v9 kernel (the
    splice runs per (segment, dy) slab): output must match the classic
    v9 kernel on every production geometry (1-ULP interpret-mode
    tolerance and the clear_caches() discipline — see
    test_fwd_carry_matches_classic)."""
    from super_resolution_tpu.ops.pallas import dense_block_cf as cf
    from super_resolution_tpu.ops.pallas.dense_block_cf_ext import (
        fused_dense_block_cf9,
    )

    h, w, rows, batch, img_w, flat = geom
    nf, gc, halo = 8, 4, 5
    ws, bs, cin = [], [], nf
    for k in range(5):
        cout = nf if k == 4 else gc
        ws.append(jax.random.normal(jax.random.key(800 + k),
                                    (3, 3, cin, cout), jnp.float32) * 0.1)
        bs.append(jax.random.normal(jax.random.key(820 + k), (cout,),
                                    jnp.float32) * 0.1)
        cin += gc
    x = jax.random.normal(jax.random.key(27), (batch, nf, h, w),
                          jnp.float32)
    if flat:
        x = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0))) \
            .reshape(batch, nf, -1)
    kw = dict(rows=rows, save_acts=save_acts, img_w=img_w,
              flat_h=h if flat else None)

    old = cf.FWD_CARRY_ENABLED
    try:
        with pltpu.force_tpu_interpret_mode():
            cf.FWD_CARRY_ENABLED = False
            jax.clear_caches()
            ref = fused_dense_block_cf9(x, ws, bs, **kw)
            cf.FWD_CARRY_ENABLED = True
            jax.clear_caches()
            got = fused_dense_block_cf9(x, ws, bs, **kw)
    finally:
        cf.FWD_CARRY_ENABLED = old
        jax.clear_caches()

    ra = (list(ref[1]) + [ref[0]]) if save_acts else [ref]
    ga = (list(got[1]) + [got[0]]) if save_acts else [got]
    for a, b in zip(ga, ra):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.fast
def test_shipping_kernel_knob_defaults():
    """The shipped trace-time knob configuration IS the measured-winner
    config from the round-3 on-chip campaign (BENCHNOTES round-3
    fifth/sixth sessions): v9 dispatch + fwd/bwd halo carries ON (GAN
    b16·192² 18.3 it/s, inference 48.4 MP/s/chip; every combination
    passes tools/verify_grads_onchip.py), DMA band delivery ON, lane
    caps at the VMEM-margin values.  A silent default flip regresses
    the headline benches — change these only with a fresh on-chip
    grad gate + A/B."""
    from super_resolution_tpu.ops.pallas import (
        dense_block_cf,
        dense_block_cf_vjp,
        partitioned,
    )

    assert partitioned.CF9_ENABLED is True
    assert dense_block_cf.FWD_CARRY_ENABLED is True
    assert dense_block_cf.DMA_IN_ENABLED is True
    assert dense_block_cf_vjp.BWD_CARRY_ENABLED is True
    assert dense_block_cf_vjp.DMA_IN_ENABLED is True
    assert dense_block_cf_vjp.BWD_LANE_CAP_ALIGNED == 3072
    assert dense_block_cf_vjp.BWD_LANE_CAP_UNALIGNED == 2048
