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
