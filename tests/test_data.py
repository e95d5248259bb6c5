"""Data pipeline tests: normalization round-trip, augment statistics,
loader determinism/resume, prefetch (SURVEY.md §4)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from super_resolution_tpu.config import DataConfig
from super_resolution_tpu.data import (
    PatchLoader,
    SyntheticPatches,
    augment_batch,
    denormalize,
    device_prefetch,
    normalize,
    preprocess_batch,
    to_uint8_image,
)

CFG = DataConfig(hr_patch=32, batch_size=4, n_workers=2)


def test_normalize_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3),
                    dtype=jnp.float32)
    y = denormalize(normalize(x, CFG.normalize_mean, CFG.normalize_std),
                    CFG.normalize_mean, CFG.normalize_std)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_normalize_matches_torchvision_semantics():
    """(x - mean) / std per channel — the family's Normalize transform."""
    x = np.random.RandomState(1).rand(1, 4, 4, 3).astype(np.float32)
    out = np.asarray(normalize(jnp.asarray(x), CFG.normalize_mean,
                               CFG.normalize_std))
    for c in range(3):
        ref = (x[..., c] - CFG.normalize_mean[c]) / CFG.normalize_std[c]
        np.testing.assert_allclose(out[..., c], ref, rtol=1e-5)


@pytest.mark.fast
def test_preprocess_batch_shapes_and_stats():
    hr = jnp.asarray(np.random.RandomState(2).randint(
        0, 256, (4, 32, 32, 3), dtype=np.uint8))
    out = preprocess_batch(jax.random.key(0), hr, CFG)
    assert out["lr"].shape == (4, 8, 8, 3)
    assert out["hr"].shape == (4, 32, 32, 3)
    # normalized uniform-noise stats: mean ≈ (0.5 - mean)/std
    for c in range(3):
        expect = (0.5 - CFG.normalize_mean[c]) / CFG.normalize_std[c]
        assert float(out["hr"][..., c].mean()) == pytest.approx(expect,
                                                                abs=0.05)


def test_augment_is_pixel_permutation():
    x = jnp.asarray(np.random.RandomState(3).rand(8, 16, 16, 3),
                    dtype=jnp.float32)
    y = augment_batch(jax.random.key(1), x)
    # flips/rotations permute pixels within each sample: sorted values equal
    np.testing.assert_allclose(
        np.sort(np.asarray(y).reshape(8, -1), axis=1),
        np.sort(np.asarray(x).reshape(8, -1), axis=1), atol=0)
    # and with 8 samples × 3 coin flips, at least one sample must change
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 0


def test_augment_nonsquare_skips_rotation():
    x = jnp.asarray(np.random.RandomState(4).rand(4, 8, 16, 3),
                    dtype=jnp.float32)
    y = augment_batch(jax.random.key(2), x)   # must not raise
    assert y.shape == x.shape


def test_to_uint8_roundtrip():
    img = jnp.asarray(np.random.RandomState(5).randint(
        0, 256, (1, 8, 8, 3), dtype=np.uint8))
    norm = preprocess_batch(jax.random.key(0), img, CFG,
                            augment=False)["hr"]
    back = to_uint8_image(norm, CFG)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.RandomState(6)
    for i in range(3):
        arr = rng.randint(0, 256, (48 + 8 * i, 40 + 4 * i, 3),
                          dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"im{i}.png")
    return str(tmp_path)


@pytest.mark.fast
def test_patch_loader_shapes_and_determinism(image_dir):
    cfg = DataConfig(dataset_dir=image_dir, hr_patch=32, batch_size=4,
                     n_workers=1)
    a = iter(PatchLoader(cfg, seed=7))
    b = iter(PatchLoader(cfg, seed=7))
    for _ in range(3):
        ba, bb = next(a), next(b)
        assert ba.shape == (4, 32, 32, 3) and ba.dtype == np.uint8
        np.testing.assert_array_equal(ba, bb)


def test_patch_loader_resume(image_dir):
    cfg = DataConfig(dataset_dir=image_dir, hr_patch=16, batch_size=2,
                     n_workers=1)
    loader = PatchLoader(cfg, seed=8)
    it = iter(loader)
    next(it); next(it)
    state = loader.state_dict()

    resumed = PatchLoader(cfg, seed=0)
    resumed.load_state_dict(state)
    np.testing.assert_array_equal(next(iter(resumed)), next(it))


def test_patch_loader_small_images_padded(tmp_path):
    Image.fromarray(np.zeros((10, 10, 3), np.uint8)).save(tmp_path / "s.png")
    cfg = DataConfig(dataset_dir=str(tmp_path), hr_patch=32, batch_size=1,
                     n_workers=1)
    assert next(iter(PatchLoader(cfg))).shape == (1, 32, 32, 3)


def test_patch_loader_nonsquare(image_dir):
    """--hr_width (SURVEY.md reference CLI surface): non-square HR
    patches flow through crop, synthesis and the train step; rotation
    augmentation auto-disables (augment.py)."""
    cfg = DataConfig(dataset_dir=image_dir, hr_patch=32, hr_patch_w=16,
                     batch_size=2, n_workers=1)
    assert cfg.patch_hw == (32, 16) and cfg.lr_patch_hw == (8, 4)
    batch = next(iter(PatchLoader(cfg, seed=3)))
    assert batch.shape == (2, 32, 16, 3)
    out = preprocess_batch(jax.random.key(0), jnp.asarray(batch), cfg)
    assert out["hr"].shape == (2, 32, 16, 3)
    assert out["lr"].shape == (2, 8, 4, 3)


def test_nonsquare_pretrain_step():
    """One pretrain step on non-square patches end-to-end (generator,
    loss, metrics are all shape-agnostic)."""
    import dataclasses

    from super_resolution_tpu.config import (
        GeneratorConfig,
        TrainConfig,
    )
    from super_resolution_tpu.data import SyntheticPatches
    from super_resolution_tpu.train import init_state, make_pretrain_step

    cfg = TrainConfig(
        generator=GeneratorConfig(n_blocks=1, filters=8, growth=4),
        data=DataConfig(hr_patch=32, hr_patch_w=24, batch_size=2,
                        n_workers=0),
        donate_buffers=False,
    )
    batch = jnp.asarray(next(iter(SyntheticPatches(cfg.data, seed=0))))
    assert batch.shape == (2, 32, 24, 3)
    state, metrics = make_pretrain_step(cfg)(init_state(cfg), batch)
    assert np.isfinite(float(metrics["loss_pixel"]))


def test_synthetic_patches_deterministic():
    a = iter(SyntheticPatches(CFG, seed=1))
    b = iter(SyntheticPatches(CFG, seed=1))
    np.testing.assert_array_equal(next(a), next(b))


def test_device_prefetch_preserves_order_and_content():
    batches = [np.full((2, 4, 4, 3), i, np.uint8) for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, x in enumerate(out):
        assert isinstance(x, jax.Array)
        np.testing.assert_array_equal(np.asarray(x), batches[i])


def test_threaded_loader_yields_valid_batches(image_dir):
    cfg = DataConfig(dataset_dir=image_dir, hr_patch=16, batch_size=2,
                     n_workers=3)
    it = iter(PatchLoader(cfg, seed=9, deterministic=False))
    for _ in range(5):
        b = next(it)
        assert b.shape == (2, 16, 16, 3) and b.dtype == np.uint8


@pytest.fixture
def paired_dirs(tmp_path):
    """HR = 4x4-block-upsampled LR (kron), so crop alignment is exactly
    checkable; LR is NOT the bicubic of HR (it's the block mean source)."""
    hr_dir, lr_dir = tmp_path / "hr", tmp_path / "lr"
    hr_dir.mkdir(), lr_dir.mkdir()
    rng = np.random.RandomState(20)
    for i in range(3):
        lr = rng.randint(0, 256, (12 + 2 * i, 10 + 2 * i, 3), np.uint8)
        hr = np.kron(lr, np.ones((4, 4, 1), np.uint8))
        Image.fromarray(lr).save(lr_dir / f"f{i}.png")
        Image.fromarray(hr).save(hr_dir / f"f{i}.png")
    return str(hr_dir), str(lr_dir)


def test_pair_images_matches_by_stem(paired_dirs, tmp_path):
    from super_resolution_tpu.data.pipeline import pair_images

    hr_dir, lr_dir = paired_dirs
    pairs = pair_images(hr_dir, lr_dir)
    assert len(pairs) == 3
    for hp, lp in pairs:
        import os
        assert (os.path.splitext(os.path.basename(hp))[0]
                == os.path.splitext(os.path.basename(lp))[0])

    missing = tmp_path / "empty_lr"
    missing.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(missing / "x.png")
    with pytest.raises(FileNotFoundError, match="no LR partner"):
        pair_images(hr_dir, str(missing))


def test_paired_loader_crops_are_aligned(paired_dirs):
    """batch['hr'] must be the exact 4x-block expansion of batch['lr'] —
    crops cover the same field of view (SURVEY.md §2.1 paired mode)."""
    hr_dir, lr_dir = paired_dirs
    cfg = DataConfig(dataset_dir=hr_dir, lr_dir=lr_dir, hr_patch=16,
                     scale=4, batch_size=2, n_workers=1)
    batch = next(iter(PatchLoader(cfg, seed=21)))
    assert batch["hr"].shape == (2, 16, 16, 3)
    assert batch["lr"].shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(
        batch["hr"], np.kron(batch["lr"], np.ones((1, 4, 4, 1), np.uint8)))


def test_paired_loader_deterministic_and_multiworker(paired_dirs):
    hr_dir, lr_dir = paired_dirs
    mk = lambda n: DataConfig(dataset_dir=hr_dir, lr_dir=lr_dir,
                              hr_patch=16, scale=4, batch_size=2,
                              n_workers=n)
    a = iter(PatchLoader(mk(1), seed=22))
    b = iter(PatchLoader(mk(3), seed=22))
    for _ in range(4):
        ba, bb = next(a), next(b)
        np.testing.assert_array_equal(ba["hr"], bb["hr"])
        np.testing.assert_array_equal(ba["lr"], bb["lr"])


def test_preprocess_batch_paired_augment_consistency(paired_dirs):
    """The same flip/rot decisions must hit both resolutions: block-mean
    of the augmented HR equals the augmented LR exactly (kron pairs)."""
    from super_resolution_tpu.data.augment import denormalize, \
        preprocess_batch

    hr_dir, lr_dir = paired_dirs
    cfg = DataConfig(dataset_dir=hr_dir, lr_dir=lr_dir, hr_patch=16,
                     scale=4, batch_size=4, n_workers=1)
    batch = next(iter(PatchLoader(cfg, seed=23)))
    out = preprocess_batch(jax.random.key(3), batch, cfg, augment=True)
    hr = np.asarray(denormalize(out["hr"], cfg.normalize_mean,
                                cfg.normalize_std))
    lr = np.asarray(denormalize(out["lr"], cfg.normalize_mean,
                                cfg.normalize_std))
    blocks = hr.reshape(4, 4, 4, 4, 4, 3).mean((2, 4))
    np.testing.assert_allclose(blocks, lr, atol=1e-5)


def test_threaded_loader_order_matches_single_worker(image_dir):
    """The reorder-buffer pool must yield the bit-identical stream the
    single-worker path yields — multi-worker determinism is what makes
    4-worker resume exact (round-1 VERDICT weak #3)."""
    cfg1 = DataConfig(dataset_dir=image_dir, hr_patch=16, batch_size=2,
                      n_workers=1)
    cfg4 = DataConfig(dataset_dir=image_dir, hr_patch=16, batch_size=2,
                      n_workers=4)
    a = iter(PatchLoader(cfg1, seed=11))
    b = iter(PatchLoader(cfg4, seed=11))
    for _ in range(10):
        np.testing.assert_array_equal(next(a), next(b))


def test_threaded_loader_resume_exact(image_dir):
    """state_dict() mid-stream at n_workers=4 resumes on the exact next
    batch, despite workers having decoded ahead."""
    cfg = DataConfig(dataset_dir=image_dir, hr_patch=16, batch_size=2,
                     n_workers=4)
    loader = PatchLoader(cfg, seed=12)
    it = iter(loader)
    for _ in range(4):
        next(it)
    state = loader.state_dict()
    expected = next(it)

    resumed = PatchLoader(cfg, seed=0)
    resumed.load_state_dict(state)
    np.testing.assert_array_equal(next(iter(resumed)), expected)
