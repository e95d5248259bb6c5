"""Metric correctness: SSIM properties + known values, Y-channel luma,
logger behavior."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.metrics import (
    MetricLogger,
    Throughput,
    eval_metrics,
    psnr01,
    rgb_to_y,
    ssim,
)


@pytest.mark.fast
def test_ssim_identity_is_one():
    x = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3),
                    dtype=jnp.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(48, 48, 3), dtype=jnp.float32)
    small = x + 0.01 * jnp.asarray(rng.randn(48, 48, 3), jnp.float32)
    big = x + 0.2 * jnp.asarray(rng.randn(48, 48, 3), jnp.float32)
    s_small, s_big = float(ssim(small, x)), float(ssim(big, x))
    assert 1.0 > s_small > s_big > 0.0


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage.metrics")
    rng = np.random.RandomState(2)
    a = rng.rand(64, 64).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(64, 64).astype(np.float32), 0, 1)
    ref = skimage.structural_similarity(
        a, b, gaussian_weights=True, sigma=1.5, use_sample_covariance=False,
        data_range=1.0)
    ours = float(ssim(jnp.asarray(a)[..., None], jnp.asarray(b)[..., None]))
    assert ours == pytest.approx(ref, abs=5e-3)


def test_rgb_to_y_bt601():
    white = jnp.ones((1, 1, 3))
    assert float(rgb_to_y(white)[0, 0]) == pytest.approx(235 / 255, abs=1e-3)
    black = jnp.zeros((1, 1, 3))
    assert float(rgb_to_y(black)[0, 0]) == pytest.approx(16 / 255, abs=1e-3)


@pytest.mark.fast
def test_eval_metrics_keys():
    x = jnp.asarray(np.random.RandomState(3).rand(16, 16, 3),
                    dtype=jnp.float32)
    m = eval_metrics(x, x)
    assert set(m) == {"psnr_rgb", "psnr_y", "ssim"}
    assert float(m["psnr_rgb"]) > 60


def test_metric_logger_jsonl_and_log_once(tmp_path):
    lg = MetricLogger(str(tmp_path))
    lg.update({"a": jnp.asarray(1.0)})
    lg.update({"a": jnp.asarray(3.0)})
    out = lg.flush(10, "train", extra={"thr": 5.0})
    assert out["a"] == 2.0 and out["thr"] == 5.0
    lg.log_once(11, "eval", {"val_psnr": 30.0, "n_images": 2})
    lg.close()
    lines = [json.loads(ln)
             for ln in open(tmp_path / "metrics.jsonl")]
    assert lines[0] == {"step": 10, "prefix": "train", "a": 2.0,
                        "thr": 5.0}
    assert lines[1]["prefix"] == "eval" and lines[1]["val_psnr"] == 30.0


def test_metric_logger_writes_tensorboard_events(tmp_path):
    """Scalars and images must land in <log_dir>/tb event files readable
    by tensorboard (SURVEY.md §5.5 — the promised clu/tensorboard
    surface)."""
    import numpy as np

    lg = MetricLogger(str(tmp_path))
    lg.update({"loss": jnp.asarray(0.5)})
    lg.flush(1, "train")
    lg.log_once(2, "eval", {"val_psnr": 31.0})
    lg.log_image(3, "samples/grid",
                 np.zeros((8, 8, 3), np.uint8))
    lg.close()

    tb_dir = tmp_path / "tb"
    event_files = list(tb_dir.glob("events.out.tfevents.*"))
    assert event_files, "no tensorboard event files written"

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tb_dir))
    acc.Reload()
    tags = acc.Tags()
    assert "train/loss" in tags["scalars"]
    assert "eval/val_psnr" in tags["scalars"]
    assert "samples/grid" in tags["images"]
    assert acc.Scalars("train/loss")[0].value == 0.5


def test_throughput_meter():
    t = Throughput(n_chips=2)
    t.add(4_000_000)
    assert t.mp_per_sec_per_chip() > 0
