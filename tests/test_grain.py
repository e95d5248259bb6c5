"""Optional grain-backed input pipeline (SURVEY.md §2.4): determinism,
native-state resume, JSON-checkpointability, and train() integration."""

import json

import numpy as np
import pytest
from PIL import Image

from super_resolution_tpu.config import DataConfig
from super_resolution_tpu.data.grain_source import GrainPatchLoader


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                        ).save(tmp_path / f"i{i}.png")
    return str(tmp_path)


def _cfg(d):
    return DataConfig(dataset_dir=d, hr_patch=16, batch_size=2, n_workers=0)


@pytest.mark.fast
def test_grain_loader_shapes_and_determinism(image_dir):
    a = iter(GrainPatchLoader(_cfg(image_dir), seed=1))
    b = iter(GrainPatchLoader(_cfg(image_dir), seed=1))
    for _ in range(3):
        ba, bb = next(a), next(b)
        assert ba.shape == (2, 16, 16, 3) and ba.dtype == np.uint8
        np.testing.assert_array_equal(ba, bb)


def test_grain_loader_resume_and_json_state(image_dir):
    ld = GrainPatchLoader(_cfg(image_dir), seed=2)
    it = iter(ld)
    next(it)
    next(it)
    state = ld.state_dict()
    json.dumps(state)                      # must survive orbax JsonSave
    expected = next(it)

    ld2 = GrainPatchLoader(_cfg(image_dir), seed=2)
    ld2.load_state_dict(state)
    np.testing.assert_array_equal(next(iter(ld2)), expected)


def test_train_loop_with_grain_loader_resume(image_dir, tmp_path):
    """train() accepts the grain loader interchangeably and resumes on the
    exact next batch despite device prefetch running ahead."""
    import jax

    from super_resolution_tpu.train import train
    from test_train import tiny_cfg

    def make_loader():
        return GrainPatchLoader(
            DataConfig(dataset_dir=image_dir, hr_patch=32, batch_size=2,
                       n_workers=0), seed=3)

    cfg = tiny_cfg(checkpoint_dir=str(tmp_path / "a"),
                   checkpoint_interval=3, warmup_batches=10 ** 9)
    train(cfg, total_steps=3, data_loader=make_loader())
    resumed = train(cfg, total_steps=5, resume=True,
                    data_loader=make_loader())

    cfg_b = tiny_cfg(checkpoint_dir=str(tmp_path / "b"),
                     checkpoint_interval=3, warmup_batches=10 ** 9)
    straight = train(cfg_b, total_steps=5, data_loader=make_loader())

    for x, y in zip(jax.tree.leaves(resumed.g_params),
                    jax.tree.leaves(straight.g_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture
def paired_dirs(tmp_path):
    from test_train import _make_paired_dirs

    return _make_paired_dirs(tmp_path, n=3, lr_size=12)


def test_grain_loader_paired_mode(paired_dirs):
    """--loader grain + lr_dir yields real paired {hr, lr} dict batches
    (round-2 VERDICT missing #5: grain silently synthesized LR)."""
    hr_dir, lr_dir = paired_dirs
    cfg = DataConfig(dataset_dir=hr_dir, lr_dir=lr_dir, hr_patch=16,
                     batch_size=2, n_workers=0)
    ld = GrainPatchLoader(cfg, seed=1)
    batch = next(iter(ld))
    assert isinstance(batch, dict)
    assert batch["hr"].shape == (2, 16, 16, 3)
    assert batch["lr"].shape == (2, 4, 4, 3)
    assert batch["hr"].dtype == np.uint8
    # the fixture HRs are nearest-upsampled LRs, so every aligned crop
    # satisfies hr == kron(lr) — proof the LR came from the paired file,
    # not bicubic synthesis
    np.testing.assert_array_equal(
        batch["hr"], np.kron(batch["lr"], np.ones((1, 4, 4, 1), np.uint8)))


def test_grain_loader_paired_resume(paired_dirs):
    hr_dir, lr_dir = paired_dirs
    cfg = DataConfig(dataset_dir=hr_dir, lr_dir=lr_dir, hr_patch=16,
                     batch_size=2, n_workers=0)
    ld = GrainPatchLoader(cfg, seed=4)
    it = iter(ld)
    next(it)
    state = ld.state_dict()
    json.dumps(state)
    expected = next(it)

    ld2 = GrainPatchLoader(cfg, seed=4)
    ld2.load_state_dict(state)
    got = next(iter(ld2))
    np.testing.assert_array_equal(got["hr"], expected["hr"])
    np.testing.assert_array_equal(got["lr"], expected["lr"])


def test_train_loop_with_grain_paired_loader(paired_dirs, tmp_path):
    """Full train() pass over grain dict batches (prefetch, steps,
    checkpointing) — the CLI `--loader grain --lr_dir` path."""
    hr_dir, lr_dir = paired_dirs
    from super_resolution_tpu.train import train
    from test_train import tiny_cfg

    dcfg = DataConfig(dataset_dir=hr_dir, lr_dir=lr_dir, hr_patch=32,
                      batch_size=2, n_workers=0)
    cfg = tiny_cfg(checkpoint_dir=str(tmp_path / "ck"), data=dcfg,
                   warmup_batches=10 ** 9)
    state = train(cfg, data_loader=GrainPatchLoader(dcfg, seed=5),
                  total_steps=2)
    assert int(state.step) == 2
