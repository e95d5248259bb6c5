"""Checkpoint-conditioned halo admissibility (ROADMAP round-5 candidate
3): the sweep picks the minimal halo clearing the deviation threshold,
the release-metadata sidecar round-trips, and the CLI surface
(``export --halo_sweep`` / ``--stamp_halo`` → ``upscale --halo auto``)
carries the stamp end-to-end."""

import json
import os

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from super_resolution_tpu.cli import main
from super_resolution_tpu.config import GeneratorConfig
from super_resolution_tpu.halo_sweep import (
    halo_meta_path,
    read_admissible_halo,
    select_admissible,
    structured_probe,
    sweep_admissible_halo,
    write_halo_meta,
)
from super_resolution_tpu.models import RRDBNet
from torch_spec import RRDBNetTorch

SMALL_ARGS = ["--residual_blocks", "1", "--dtype", "float32"]


def _tiny_infer():
    cfg = GeneratorConfig(n_blocks=1, filters=8, growth=4)
    g = RRDBNet(cfg)
    v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    return jax.jit(lambda x: g.apply(v, x))


@pytest.mark.fast
def test_probe_is_structured_and_deterministic():
    p = structured_probe(64)
    assert p.shape == (64, 64, 3) and p.dtype == np.float32
    assert 0.0 <= p.min() and p.max() <= 1.0
    np.testing.assert_array_equal(p, structured_probe(64))
    # structured: neighboring-pixel correlation far above white noise
    flat = p[:, :-1, 0].ravel()
    nxt = p[:, 1:, 0].ravel()
    assert np.corrcoef(flat, nxt)[0, 1] > 0.5


def test_sweep_selects_minimal_admissible_halo():
    meta = sweep_admissible_halo(_tiny_infer(), scale=4, frame=96,
                                 tile_w=32, halos=(2, 4, 8),
                                 threshold_db=55.0)
    sel = meta["admissible_halo"]
    # a random-init 1-block generator has a short effective RF — some
    # candidate must clear 55 dB tiled-vs-whole
    assert sel in (2, 4, 8)
    psnrs = {r["halo"]: r["psnr_vs_whole_db"] for r in meta["sweep"]}
    assert psnrs[sel] >= 55.0
    # minimality: every smaller candidate failed the threshold
    for h, p in psnrs.items():
        if h < sel:
            assert p < 55.0
    assert meta["sweep"][0]["uint8_lsb_max"] >= 0


def test_sweep_threshold_unachievable_returns_none():
    meta = sweep_admissible_halo(_tiny_infer(), scale=4, frame=64,
                                 tile_w=32, halos=(2,),
                                 threshold_db=1000.0)
    assert meta["admissible_halo"] is None


def test_sweep_rejects_untiled_probe():
    with pytest.raises(ValueError):
        sweep_admissible_halo(_tiny_infer(), frame=32, tile_w=32)


@pytest.mark.fast
def test_meta_sidecar_roundtrip(tmp_path):
    p = str(tmp_path / "release.pth")
    open(p, "wb").close()
    assert read_admissible_halo(p) is None          # no stamp yet
    assert halo_meta_path(p) == p + ".meta.json"
    write_halo_meta(p, {"admissible_halo": 4})
    assert read_admissible_halo(p) == 4
    # orbax-style directory checkpoints keep the stamp inside
    d = str(tmp_path / "ck")
    os.makedirs(d)
    assert halo_meta_path(d) == os.path.join(d, "release_meta.json")
    write_halo_meta(d, {"admissible_halo": None})   # sweep found none
    assert read_admissible_halo(d) is None


def _small_pth(tmp_path):
    torch.manual_seed(0)
    p = str(tmp_path / "gen.pth")
    torch.save(RRDBNetTorch(nf=16, nb=1, gc=8).state_dict(), p)
    return p


def test_export_halo_sweep_then_auto(tmp_path, capsys):
    """End-to-end: export stamps the sweep result; upscale --halo auto
    reads it back."""
    out = str(tmp_path / "release.pth")
    rc = main(["export", "--checkpoint", _small_pth(tmp_path), "--out",
               out, "--halo_sweep", "--sweep_frame", "96",
               "--sweep_tile_w", "32", "--sweep_halos", "2,4,8",
               *SMALL_ARGS])
    assert rc == 0
    with open(out + ".meta.json") as f:
        meta = json.load(f)
    assert meta["admissible_halo"] in (2, 4, 8)
    assert meta["method"] == "structured_probe_sweep"
    assert len(meta["sweep"]) == 3

    img = (np.random.RandomState(0).rand(40, 40, 3) * 255
           ).astype(np.uint8)
    ip = str(tmp_path / "in.png")
    Image.fromarray(img).save(ip)
    op = str(tmp_path / "sr.png")
    rc = main(["upscale", "--image", ip, "--checkpoint", out, "--out",
               op, "--tile", "32", "--halo", "auto", *SMALL_ARGS])
    assert rc == 0
    assert (f"halo={meta['admissible_halo']} from release metadata"
            in capsys.readouterr().out)
    with Image.open(op) as im:
        assert im.size == (160, 160)


def test_export_stamp_halo_without_sweep(tmp_path):
    out = str(tmp_path / "release.pth")
    rc = main(["export", "--checkpoint", _small_pth(tmp_path), "--out",
               out, "--stamp_halo", "4", *SMALL_ARGS])
    assert rc == 0
    with open(out + ".meta.json") as f:
        meta = json.load(f)
    assert meta == {"admissible_halo": 4, "method": "stamped",
                    "scale": 4}
    assert read_admissible_halo(out) == 4


def test_halo_auto_without_stamp_falls_back(tmp_path, capsys):
    pth = _small_pth(tmp_path)
    img = (np.random.RandomState(1).rand(24, 24, 3) * 255
           ).astype(np.uint8)
    ip = str(tmp_path / "in.png")
    Image.fromarray(img).save(ip)
    op = str(tmp_path / "sr.png")
    rc = main(["upscale", "--image", ip, "--checkpoint", pth, "--out",
               op, "--tile", "32", "--halo", "auto", *SMALL_ARGS])
    assert rc == 0
    out = capsys.readouterr().out
    assert "using conservative halo=8" in out
    assert "no release-metadata sidecar" in out


@pytest.mark.fast
def test_select_admissible_requires_passing_suffix():
    """Round-4 ADVICE: a small halo that clears the threshold while a
    LARGER one fails is probe noise, not admissibility — the pick must
    be the smallest halo of the largest passing suffix."""
    rows = [{"halo": 2, "psnr_vs_whole_db": 56.0},   # noise "pass"
            {"halo": 4, "psnr_vs_whole_db": 54.0},   # fails
            {"halo": 6, "psnr_vs_whole_db": 57.0},
            {"halo": 8, "psnr_vs_whole_db": 60.0}]
    assert select_admissible(rows, 55.0) == 6
    # clean monotone case: minimal passing halo
    rows = [{"halo": 2, "psnr_vs_whole_db": 50.0},
            {"halo": 4, "psnr_vs_whole_db": 56.0},
            {"halo": 8, "psnr_vs_whole_db": 60.0}]
    assert select_admissible(rows, 55.0) == 4
    # nothing passes
    assert select_admissible(rows, 90.0) is None
    # everything passes → smallest
    assert select_admissible(rows, 40.0) == 2


@pytest.mark.fast
def test_halo_arg_rejects_malformed(capsys):
    """Round-4 ADVICE: '8x' must be an argparse usage error at parse
    time, not a ValueError traceback from _resolve_halo."""
    with pytest.raises(SystemExit) as ei:
        main(["upscale", "--image", "x.png", "--checkpoint", "c.pth",
              "--out", "y.png", "--halo", "8x"])
    assert ei.value.code == 2
    assert "integer or 'auto'" in capsys.readouterr().err


def test_export_stamps_by_default_and_auto_is_default(tmp_path, capsys):
    """Round-4 VERDICT weak #5: export must stamp WITHOUT extra flags,
    and upscale's default --halo must resolve it (auto is the
    default)."""
    out = str(tmp_path / "release.pth")
    rc = main(["export", "--checkpoint", _small_pth(tmp_path), "--out",
               out, "--sweep_frame", "96", "--sweep_tile_w", "32",
               "--sweep_halos", "2,4,8", *SMALL_ARGS])
    assert rc == 0
    assert os.path.exists(out + ".meta.json")
    with open(out + ".meta.json") as f:
        meta = json.load(f)
    assert meta["method"] == "structured_probe_sweep"
    capsys.readouterr()

    img = (np.random.RandomState(0).rand(40, 40, 3) * 255
           ).astype(np.uint8)
    ip = str(tmp_path / "in.png")
    Image.fromarray(img).save(ip)
    op = str(tmp_path / "sr.png")
    # NO --halo flag: auto is the default and reads the stamp
    rc = main(["upscale", "--image", ip, "--checkpoint", out, "--out",
               op, "--tile", "32", *SMALL_ARGS])
    assert rc == 0
    assert (f"halo={meta['admissible_halo']} from release metadata"
            in capsys.readouterr().out)


def test_export_no_halo_sweep_skips_sidecar(tmp_path):
    out = str(tmp_path / "release.pth")
    rc = main(["export", "--checkpoint", _small_pth(tmp_path), "--out",
               out, "--no-halo_sweep", *SMALL_ARGS])
    assert rc == 0
    assert os.path.exists(out)
    assert not os.path.exists(out + ".meta.json")


def test_halo_auto_with_null_stamp_distinct_message(tmp_path, capsys):
    """Round-4 ADVICE: sidecar-with-admissible_halo=null must message
    differently from no-sidecar (the sweep RAN and found nothing)."""
    pth = _small_pth(tmp_path)
    write_halo_meta(pth, {"admissible_halo": None, "threshold_db": 55.0})
    img = (np.random.RandomState(1).rand(24, 24, 3) * 255
           ).astype(np.uint8)
    ip = str(tmp_path / "in.png")
    Image.fromarray(img).save(ip)
    op = str(tmp_path / "sr.png")
    rc = main(["upscale", "--image", ip, "--checkpoint", pth, "--out",
               op, "--tile", "32", *SMALL_ARGS])
    assert rc == 0
    out = capsys.readouterr().out
    assert "found NO admissible halo" in out
    assert "no release-metadata sidecar" not in out


def test_export_val_dir_contract_in_sidecar(tmp_path, capsys):
    """--val_dir wires the tools/halo_parity.py contract-level
    measurement (PSNR-vs-GT whole vs tiled on real images) into the
    release sidecar."""
    vd = tmp_path / "val"
    vd.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)
                        ).save(vd / f"{i}.png")
    out = str(tmp_path / "release.pth")
    rc = main(["export", "--checkpoint", _small_pth(tmp_path), "--out",
               out, "--sweep_frame", "96", "--sweep_tile_w", "32",
               "--sweep_halos", "2,4,8", "--val_dir", str(vd),
               "--val_max_images", "2", *SMALL_ARGS])
    assert rc == 0
    with open(out + ".meta.json") as f:
        meta = json.load(f)
    vc = meta["val_contract"]
    assert vc["n_images"] == 2
    assert vc["halo"] == meta["admissible_halo"]
    assert vc["psnr_gt_whole_db"] > 0 and vc["psnr_gt_tiled_db"] > 0
    # the contract statement: tiling at the stamped halo moves
    # PSNR-vs-GT by far less than the 0.1 dB parity budget
    assert abs(vc["delta_db"]) < 0.1
