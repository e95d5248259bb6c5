"""Distributed tests without a cluster (SURVEY.md §4.4): the identical
jitted train step runs with batch-sharded inputs over an 8-virtual-device
CPU mesh and must reproduce single-device global-batch semantics exactly
(grads, RaGAN means, BatchNorm stats)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.config import (
    DataConfig,
    DiscriminatorConfig,
    GeneratorConfig,
    LossConfig,
    TrainConfig,
    VGGConfig,
)
from super_resolution_tpu.data import SyntheticPatches
from super_resolution_tpu.parallel import (
    batch_sharded,
    make_mesh,
    pad_batch_to_mesh,
    shard_state,
)
from super_resolution_tpu.train import (
    init_state,
    make_gan_step,
    make_pretrain_step,
)


def dp_cfg():
    return TrainConfig(
        generator=GeneratorConfig(n_blocks=1, filters=16, growth=8),
        discriminator=DiscriminatorConfig(base_filters=8, n_scales=2),
        vgg=VGGConfig(arch=(8, "M", 16)),
        loss=LossConfig(use_perceptual=False),
        data=DataConfig(hr_patch=32, batch_size=8, n_workers=1),
        compute_dtype="float32",
        donate_buffers=False,
    )


def _batch(cfg):
    return jnp.asarray(next(iter(SyntheticPatches(cfg.data, seed=3))))


def _leaves_close(a, b, atol):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


@pytest.mark.fast
def test_pretrain_step_sharded_equals_single_device():
    cfg = dp_cfg()
    batch = _batch(cfg)
    step = make_pretrain_step(cfg)

    s_single, m_single = step(init_state(cfg), batch)

    mesh = make_mesh(8)
    state = shard_state(init_state(cfg), mesh)
    sharded_batch = jax.device_put(batch, batch_sharded(mesh))
    s_dp, m_dp = step(state, sharded_batch)

    assert len(s_dp.g_params["conv_first"]["kernel"].sharding.device_set) == 8
    np.testing.assert_allclose(float(m_dp["loss_pixel"]),
                               float(m_single["loss_pixel"]), atol=1e-6)
    _leaves_close(s_single.g_params, s_dp.g_params, atol=1e-5)


@pytest.mark.parametrize("dedup", [False, True])
def test_gan_step_sharded_equals_single_device(dedup):
    """RaGAN batch means and BN batch stats must be mesh-global under the
    sharded jit — large-batch semantics (SURVEY.md §7).  Both step
    shapes: the reference 4-forward step and the dedup_d_hr restructure
    (its jax.vjp chain must preserve the same psum semantics)."""
    import dataclasses

    cfg = dataclasses.replace(dp_cfg(), dedup_d_hr=dedup)
    batch = _batch(cfg)
    step = make_gan_step(cfg)

    s_single, m_single = step(init_state(cfg), batch)

    mesh = make_mesh(8)
    s_dp, m_dp = step(shard_state(init_state(cfg), mesh),
                      jax.device_put(batch, batch_sharded(mesh)))

    # tolerance: psum tree-reduction order vs sequential fp32 mean drifts
    # ~1e-4; a per-shard-mean semantics bug would be orders larger
    for k in ("loss_g", "loss_d", "loss_adv"):
        np.testing.assert_allclose(float(m_dp[k]), float(m_single[k]),
                                   atol=5e-4, err_msg=k)
    _leaves_close(s_single.g_params, s_dp.g_params, atol=1e-3)
    _leaves_close(s_single.d_params, s_dp.d_params, atol=1e-3)
    _leaves_close(s_single.d_stats, s_dp.d_stats, atol=1e-3)


def test_multi_step_sharded_training_stays_in_sync():
    cfg = dp_cfg()
    step = make_pretrain_step(cfg)
    mesh = make_mesh(8)
    it = iter(SyntheticPatches(cfg.data, seed=4))

    single = init_state(cfg)
    dp = shard_state(init_state(cfg), mesh)
    for _ in range(3):
        b = jnp.asarray(next(it))
        single, _ = step(single, b)
        dp, _ = step(dp, jax.device_put(b, batch_sharded(mesh)))
    _leaves_close(single.g_params, dp.g_params, atol=1e-4)


def test_pad_batch_to_mesh():
    mesh = make_mesh(8)
    b = np.zeros((5, 4, 4, 3), np.uint8)
    padded = pad_batch_to_mesh(b, mesh)
    assert padded.shape[0] == 8
    np.testing.assert_array_equal(padded[5:], np.repeat(b[-1:], 3, axis=0))


def test_mesh_construction_errors():
    import pytest

    with pytest.raises(ValueError, match="need 16 devices"):
        make_mesh(16)


def test_partitioned_dense_block_matches_single_device():
    """DP × Pallas (round 2): the custom_partitioning'd fused dense block
    under a batch-sharded 8-device jit must equal the single-device
    kernel — the partition rule runs the kernel per shard (no gather)."""
    from super_resolution_tpu.ops.pallas.partitioned import (
        partitioned_dense_block,
    )

    nf, gc, rows = 16, 8, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, nf, 16, 16).astype(np.float32))
    ws, bs, cin = [], [], nf
    for k in range(5):
        co = nf if k == 4 else gc
        ws.append(jnp.asarray(
            rng.randn(3, 3, cin, co).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.randn(co).astype(np.float32) * 0.1))
        if k < 4:
            cin += co

    fn = partitioned_dense_block(5, rows, 0.2, 0.2, interpret=True)
    single = np.asarray(jax.jit(fn)(x, *ws, *bs))

    mesh = make_mesh(8)
    xs = jax.device_put(x, batch_sharded(mesh))
    wrep = [jax.device_put(w, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())) for w in ws]
    brep = [jax.device_put(b, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())) for b in bs]
    sharded = np.asarray(jax.jit(fn)(xs, *wrep, *brep))
    np.testing.assert_allclose(sharded, single, atol=1e-5, rtol=1e-5)


def test_partitioned_dense_block_grads_match_single_device():
    """DP × kernel TRAINING (round 2): the batch-partitioned Mosaic
    backward must reproduce single-device grads exactly — dx per shard,
    dW/db psum'd over the mesh axis inside the partition (the DP
    gradient all-reduce)."""
    from super_resolution_tpu.ops.pallas.partitioned import (
        partitioned_dense_block_bwd,
        partitioned_dense_block_fwd,
    )

    nf, gc, rows = 16, 8, 8
    n = 5
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, nf, 16, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(8, nf, 16, 16).astype(np.float32))
    ws, bs, cin = [], [], nf
    for k in range(n):
        co = nf if k == n - 1 else gc
        ws.append(jnp.asarray(
            rng.randn(3, 3, cin, co).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.randn(co).astype(np.float32) * 0.1))
        if k < n - 1:
            cin += co

    fwd = partitioned_dense_block_fwd(n, rows, 0.2, 0.2, interpret=True)
    bwd = partitioned_dense_block_bwd(n, rows, 0.2, 0.2, interpret=True)

    res1 = jax.jit(fwd)(x, *ws, *bs)
    acts1 = res1[1:]
    ref = jax.jit(bwd)(x, *acts1, g, *ws)

    mesh = make_mesh(8)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    xs = jax.device_put(x, batch_sharded(mesh))
    gs = jax.device_put(g, batch_sharded(mesh))
    wrep = [jax.device_put(w, rep) for w in ws]
    brep = [jax.device_put(b, rep) for b in bs]
    res2 = jax.jit(fwd)(xs, *wrep, *brep)
    acts2 = res2[1:]
    got = jax.jit(bwd)(xs, *acts2, gs, *wrep)

    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fold_engaged_dp_training_matches_single_device():
    """DP × batch-to-lane fold (round-3 VERDICT item 2 / BASELINE
    config 5): at the canonical unaligned patch width (192² HR → LR
    W=48, g=8) with the local batch divisible by g, _training_cfg keeps
    pallas_cf, the model's fold reshape partitions shard-locally, and
    the sharded step reproduces single-device grads exactly.

    Knob hygiene: the manual-DMA delivery, the halo carries, and the v9
    dy-extension all stage ordered-IO effects that custom_partitioning
    cannot lower on a mesh off-hardware, so this test runs the kernels
    under the GENERIC Pallas interpreter (dense_block_cf_vjp.INTERPRET)
    with those knobs off — the partitioning seam and the fold reshape
    (what this test is about) are identical; the knobs' numerics are
    covered by test_pallas.py and on-chip by verify_grads_onchip."""
    import dataclasses

    from super_resolution_tpu.ops.pallas import (
        dense_block_cf,
        dense_block_cf_vjp,
        partitioned,
    )
    from super_resolution_tpu.train.steps import _training_cfg

    saved = (dense_block_cf.DMA_IN_ENABLED,
             dense_block_cf_vjp.DMA_IN_ENABLED,
             dense_block_cf.FWD_CARRY_ENABLED,
             dense_block_cf_vjp.BWD_CARRY_ENABLED,
             partitioned.CF9_ENABLED,
             dense_block_cf_vjp.INTERPRET,
             dense_block_cf.flat_io_ok)
    try:
        dense_block_cf.DMA_IN_ENABLED = False
        dense_block_cf_vjp.DMA_IN_ENABLED = False
        dense_block_cf.FWD_CARRY_ENABLED = False
        dense_block_cf_vjp.BWD_CARRY_ENABLED = False
        partitioned.CF9_ENABLED = False
        dense_block_cf_vjp.INTERPRET = True
        # flat chaining's output DMAs need the TPU interpreter too
        dense_block_cf.flat_io_ok = lambda *a, **k: False
        jax.clear_caches()

        cfg = dataclasses.replace(
            dp_cfg(),
            generator=GeneratorConfig(n_blocks=1, filters=16, growth=8,
                                      conv_impl="pallas_cf"),
            data=DataConfig(hr_patch=192, batch_size=16, n_workers=1),
            data_parallel=2,
        )
        # routing really keeps the kernel: W=48, g=8, 16 % (8·2) == 0
        assert _training_cfg(cfg).generator.conv_impl == "pallas_cf"

        batch = _batch(cfg)
        step = make_pretrain_step(cfg)
        s1, m1 = step(init_state(cfg), batch)

        mesh = make_mesh(2)
        s2, m2 = step(shard_state(init_state(cfg), mesh),
                      jax.device_put(batch, batch_sharded(mesh)))

        np.testing.assert_allclose(float(m2["loss_pixel"]),
                                   float(m1["loss_pixel"]), atol=1e-6)
        _leaves_close(s1.g_params, s2.g_params, atol=1e-5)
    finally:
        (dense_block_cf.DMA_IN_ENABLED,
         dense_block_cf_vjp.DMA_IN_ENABLED,
         dense_block_cf.FWD_CARRY_ENABLED,
         dense_block_cf_vjp.BWD_CARRY_ENABLED,
         partitioned.CF9_ENABLED,
         dense_block_cf_vjp.INTERPRET,
         dense_block_cf.flat_io_ok) = saved
        jax.clear_caches()


def test_partitioned_dense_block_flat_builders():
    """DP × flat padded chaining (round 3): the rank-3 flat layout's
    custom_partitioning builders must construct (Shardy rule strings
    parse at def_partition time) and be cached separately from the 4-D
    variants.  Multi-device runtime equality for the flat path is NOT
    testable off-hardware: the flat kernel's manual DMAs need the TPU
    interpret mode, whose ordered-IO effects custom_partitioning cannot
    stage under a mesh, and the generic interpret=True cannot emulate
    DMA semaphores — single-device flat correctness is covered in
    tests/test_pallas.py and on-chip by tools/verify_grads_onchip.py
    (the production folded training config runs exactly this path)."""
    from super_resolution_tpu.ops.pallas.partitioned import (
        partitioned_dense_block,
        partitioned_dense_block_bwd,
        partitioned_dense_block_fwd,
    )

    flat = [partitioned_dense_block(5, 8, 0.2, 0.2, flat_h=16),
            partitioned_dense_block_fwd(5, 8, 0.2, 0.2, flat_h=16),
            partitioned_dense_block_bwd(5, 8, 0.2, 0.2, flat_h=16)]
    four_d = [partitioned_dense_block(5, 8, 0.2, 0.2),
              partitioned_dense_block_fwd(5, 8, 0.2, 0.2),
              partitioned_dense_block_bwd(5, 8, 0.2, 0.2)]
    for f, g in zip(flat, four_d):
        assert callable(f) and callable(g) and f is not g
    # cached: same static config returns the same wrapped fn
    assert partitioned_dense_block(5, 8, 0.2, 0.2, flat_h=16) is flat[0]
