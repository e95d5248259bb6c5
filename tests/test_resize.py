"""Bicubic parity vs PIL — SURVEY.md §7 flags this as the silent dominator
of PSNR deltas, so it is tested first and tightest (SURVEY.md §4.2)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from super_resolution_tpu.ops import bicubic_downsample, bicubic_resize


def _pil_resize_float(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Per-channel float-mode PIL bicubic resize (no uint8 quantization)."""
    chans = []
    for c in range(arr.shape[-1]):
        im = Image.fromarray(arr[..., c].astype(np.float32), mode="F")
        chans.append(np.asarray(im.resize((out_w, out_h), Image.BICUBIC)))
    return np.stack(chans, axis=-1)


@pytest.mark.parametrize("hw_in,hw_out", [
    ((192, 192), (48, 48)),     # the reference's ÷4 LR synthesis
    ((64, 96), (16, 24)),
    ((48, 48), (192, 192)),     # ×4 upsample
    ((50, 70), (33, 21)),       # non-integer ratios
])
def test_bicubic_matches_pil_float(hw_in, hw_out):
    rng = np.random.RandomState(0)
    x = rng.rand(*hw_in, 3).astype(np.float32)
    ref = _pil_resize_float(x, hw_out[1], hw_out[0])
    out = np.asarray(bicubic_resize(jnp.asarray(x), *hw_out))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.fast
def test_bicubic_uint8_path_within_quantization():
    """The reference resizes uint8 PIL images then ToTensor()s (÷255).
    PIL's uint8 path uses fixed-point int16 coefficients + rounding, so it
    deviates from exact float resampling by up to ~1 LSB beyond pure
    output quantization; our float path must stay within 2/255."""
    rng = np.random.RandomState(1)
    img = (rng.rand(192, 192, 3) * 255).astype(np.uint8)
    ref = np.asarray(
        Image.fromarray(img).resize((48, 48), Image.BICUBIC),
        dtype=np.float32) / 255.0
    out = np.asarray(bicubic_downsample(
        jnp.asarray(img.astype(np.float32) / 255.0), 4))
    assert np.abs(out - ref).max() <= 2.0 / 255.0


@pytest.mark.fast
def test_downsample_preserves_constant():
    x = jnp.full((1, 64, 64, 3), 0.37)
    y = bicubic_downsample(x, 4)
    assert y.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(y), 0.37, atol=1e-6)
