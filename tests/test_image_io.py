"""Mode-preserving inference IO (data/image_io.py): transparency must
survive upscale/serve instead of being flattened by the RGB decode."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

from super_resolution_tpu.cli import main
from super_resolution_tpu.data.image_io import (
    merge_alpha,
    split_alpha,
    upscale_alpha,
)
from torch_spec import RRDBNetTorch

SMALL_ARGS = ["--residual_blocks", "1", "--dtype", "float32"]


def _rgba(h=24, w=20, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 4), dtype=np.uint8)
    img[..., 3] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    return img


@pytest.mark.fast
def test_split_alpha_modes(tmp_path):
    rgba = _rgba()
    # RGBA: bands pass through untouched
    rgb, a = split_alpha(Image.fromarray(rgba))
    assert np.array_equal(rgb, rgba[..., :3])
    assert np.array_equal(a, rgba[..., 3])
    # LA: gray expands to 3 identical channels, alpha survives
    la = Image.fromarray(rgba[..., :2], mode="LA")
    rgb, a = split_alpha(la)
    assert rgb.shape == (24, 20, 3)
    assert np.array_equal(rgb[..., 0], rgba[..., 0])
    assert np.array_equal(a, rgba[..., 1])
    # plain RGB / L: no alpha returned
    for im in (Image.fromarray(rgba[..., :3]),
               Image.fromarray(rgba[..., 0], mode="L")):
        rgb, a = split_alpha(im)
        assert a is None and rgb.shape == (24, 20, 3)


def test_split_alpha_palette_transparency(tmp_path):
    """Palette PNGs carry transparency in the tRNS chunk, not a band."""
    rgba = _rgba()
    rgba[..., 3] = np.where(rgba[..., 0] > 128, 0, 255)
    p = str(tmp_path / "pal.png")
    Image.fromarray(rgba).convert("P").save(p)
    with Image.open(p) as im:
        assert im.mode == "P" and "transparency" in im.info
        rgb, a = split_alpha(im)
    assert a is not None and rgb.shape == (24, 20, 3)
    # the quantized palette keeps the binary mask exactly
    ref = np.asarray(Image.open(p).convert("RGBA"))
    assert np.array_equal(a, ref[..., 3])


def test_upscale_alpha_matches_pil_bicubic():
    a = _rgba()[..., 3]
    hr = upscale_alpha(a, 4)
    assert hr.shape == (96, 80) and hr.dtype == np.uint8
    ref = Image.fromarray(a).resize((80, 96), Image.BICUBIC)
    # ops/resize is PIL float-parity; uint8 rounding differs by ≤2 LSB
    assert np.abs(hr.astype(int) - np.asarray(ref, int)).max() <= 2


@pytest.mark.fast
def test_merge_alpha_shapes():
    sr = np.zeros((96, 80, 3), np.uint8)
    assert merge_alpha(sr, None, 4) is sr
    out = merge_alpha(sr, _rgba()[..., 3], 4)
    assert out.shape == (96, 80, 4)
    with pytest.raises(ValueError, match="does not match"):
        merge_alpha(sr, np.zeros((10, 10), np.uint8), 4)


@pytest.fixture
def small_pth(tmp_path):
    torch.manual_seed(0)
    p = str(tmp_path / "g.pth")
    torch.save(RRDBNetTorch(nf=16, nb=1, gc=8).state_dict(), p)
    return p


def test_upscale_cli_preserves_alpha(tmp_path, small_pth, capsys):
    """End-to-end: an RGBA input yields an RGBA PNG whose RGB planes are
    bit-identical to upscaling the same pixels saved without alpha."""
    rgba = _rgba(40, 48)
    src_rgba = str(tmp_path / "in_rgba.png")
    src_rgb = str(tmp_path / "in_rgb.png")
    Image.fromarray(rgba).save(src_rgba)
    Image.fromarray(rgba[..., :3]).save(src_rgb)

    out_rgba, out_rgb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    for src, dst in ((src_rgba, out_rgba), (src_rgb, out_rgb)):
        rc = main(["upscale", "--image", src, "--checkpoint", small_pth,
                   "--out", dst, "--tile", "48", *SMALL_ARGS])
        assert rc == 0

    got = np.asarray(Image.open(out_rgba))
    ref = np.asarray(Image.open(out_rgb))
    assert got.shape == (160, 192, 4) and ref.shape == (160, 192, 3)
    assert np.array_equal(got[..., :3], ref)
    assert np.array_equal(got[..., 3], upscale_alpha(rgba[..., 3], 4))


def test_upscale_cli_jpeg_out_drops_alpha_with_warning(tmp_path, small_pth,
                                                       capsys):
    src = str(tmp_path / "in.png")
    Image.fromarray(_rgba(40, 48)).save(src)
    dst = str(tmp_path / "out.jpg")
    rc = main(["upscale", "--image", src, "--checkpoint", small_pth,
               "--out", dst, "--tile", "48", *SMALL_ARGS])
    assert rc == 0
    assert "transparency dropped" in capsys.readouterr().out
    with Image.open(dst) as im:
        assert im.mode == "RGB" and im.size == (192, 160)


def test_serve_preserves_alpha(tmp_path, small_pth):
    watch, out = str(tmp_path / "w"), str(tmp_path / "o")
    os.makedirs(watch)
    Image.fromarray(_rgba(40, 48)).save(os.path.join(watch, "f.png"))
    rc = main(["serve", "--watch", watch, "--out", out,
               "--checkpoint", small_pth, "--once", "--tile", "48",
               "--dtype", "float32"])
    assert rc == 0
    with Image.open(os.path.join(out, "f_x4.png")) as im:
        assert im.mode == "RGBA" and im.size == (192, 160)
