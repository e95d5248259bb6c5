"""CLI surface tests (SURVEY.md §1 L8): the reference's train/eval/upscale
commands plus interp, driven in-process over real files."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

from super_resolution_tpu.cli import main
from torch_spec import RRDBNetTorch

SMALL_ARGS = ["--residual_blocks", "1", "--dtype", "float32"]


@pytest.fixture
def data_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        yy, xx = np.mgrid[0:64, 0:64]
        img = np.stack([(yy * 4) % 256, (xx * 4) % 256,
                        rng.randint(0, 256, (64, 64))], -1).astype(np.uint8)
        Image.fromarray(img).save(d / f"im{i}.png")
    return str(d)


@pytest.fixture
def small_pth(tmp_path):
    torch.manual_seed(0)
    tm = RRDBNetTorch(nf=16, nb=1, gc=8)
    p = str(tmp_path / "gen.pth")
    torch.save(tm.state_dict(), p)
    return p


def test_train_cli_writes_checkpoint(data_dir, tmp_path):
    ck = str(tmp_path / "ck")
    rc = main(["train", "--dataset_dir", data_dir, "--steps", "2",
               "--batch_size", "2", "--hr_height", "32",
               "--warmup_batches", "10", "--no_perceptual",
               "--checkpoint_interval", "2", "--checkpoint_dir", ck,
               "--n_cpu", "1", *SMALL_ARGS])
    assert rc == 0
    assert os.path.isdir(os.path.join(ck, "2"))


@pytest.mark.fast
def test_upscale_cli_pth(data_dir, small_pth, tmp_path, capsys):
    out = str(tmp_path / "sr.png")
    rc = main(["upscale", "--image", os.path.join(data_dir, "im0.png"),
               "--checkpoint", small_pth, "--out", out,
               "--tile", "48", "--halo", "8", *SMALL_ARGS])
    assert rc == 0
    with Image.open(out) as im:
        assert im.size == (256, 256)
    assert "256x256" in capsys.readouterr().out


def test_eval_cli_pth_json(data_dir, small_pth, capsys):
    rc = main(["eval", "--dataset_dir", data_dir, "--checkpoint",
               small_pth, "--tile", "48", "--json", *SMALL_ARGS])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["n_images"] == 2
    assert 0 < out["psnr_rgb"] < 60 and 0 <= out["ssim"] <= 1
    assert "psnr_y" in out


def test_eval_cli_orbax_checkpoint(data_dir, tmp_path, capsys):
    ck = str(tmp_path / "ck")
    main(["train", "--dataset_dir", data_dir, "--steps", "1",
          "--batch_size", "2", "--hr_height", "32", "--warmup_batches",
          "10", "--no_perceptual", "--checkpoint_interval", "1",
          "--checkpoint_dir", ck, "--n_cpu", "1", *SMALL_ARGS])
    rc = main(["eval", "--dataset_dir", data_dir, "--checkpoint", ck,
               "--tile", "48", "--max_images", "1", "--json", *SMALL_ARGS])
    assert rc == 0
    import json

    lines = capsys.readouterr().out.splitlines()
    assert json.loads(lines[-1])["n_images"] == 1


def test_upscale_cli_orbax_infers_arch(data_dir, tmp_path):
    """Orbax-dir inference must not require re-passing the architecture
    flags: the checkpoint tree determines n_blocks/filters/growth (like
    the .pth branch), and the template-free restore must come back as
    host numpy leaves so TPU-trained checkpoints open on CPU boxes."""
    ck = str(tmp_path / "ck")
    main(["train", "--dataset_dir", data_dir, "--steps", "1",
          "--batch_size", "2", "--hr_height", "32", "--warmup_batches",
          "10", "--no_perceptual", "--checkpoint_interval", "1",
          "--checkpoint_dir", ck, "--n_cpu", "1", *SMALL_ARGS])

    import jax

    from super_resolution_tpu.checkpoint import restore_generator_trees

    g, ema, step = restore_generator_trees(ck)
    assert step == 1 and ema is not None
    assert all(isinstance(l, np.ndarray) for l in jax.tree.leaves(g))

    out = str(tmp_path / "sr.png")
    # note: NO --residual_blocks here — arch must come from the tree
    rc = main(["upscale", "--image", os.path.join(data_dir, "im0.png"),
               "--checkpoint", ck, "--out", out, "--dtype", "float32"])
    assert rc == 0
    with Image.open(out) as im:
        assert im.size == (256, 256)


def test_interp_cli_roundtrip(tmp_path, small_pth):
    torch.manual_seed(1)
    other = str(tmp_path / "gen2.pth")
    torch.save(RRDBNetTorch(nf=16, nb=1, gc=8).state_dict(), other)
    out = str(tmp_path / "blend.pth")
    rc = main(["interp", "--psnr_ckpt", small_pth, "--gan_ckpt", other,
               "--alpha", "0.5", "--out", out, *SMALL_ARGS])
    assert rc == 0

    from super_resolution_tpu.import_torch import import_generator, load_pth

    va, _ = import_generator(load_pth(small_pth))
    vb, _ = import_generator(load_pth(other))
    vm, _ = import_generator(load_pth(out))
    k = lambda v: np.asarray(v["params"]["conv_first"]["kernel"])  # noqa
    np.testing.assert_allclose(k(vm), 0.5 * (k(va) + k(vb)), atol=1e-6)


def test_interp_cli_orbax_vs_pth(data_dir, tmp_path):
    """interp honors the module contract: orbax dirs accepted everywhere
    a checkpoint is read — blend a trained orbax checkpoint against a
    torch .pth (round-2 VERDICT weak #4).  The orbax side is EMA
    maturity-gated like every read surface (round-5): a step-1
    checkpoint blends its RAW params, so the oracle restores with the
    same gate."""
    ck = str(tmp_path / "ck")
    main(["train", "--dataset_dir", data_dir, "--steps", "1",
          "--batch_size", "2", "--hr_height", "32", "--warmup_batches",
          "10", "--no_perceptual", "--checkpoint_interval", "1",
          "--checkpoint_dir", ck, "--n_cpu", "1", *SMALL_ARGS])
    # torch model matching the CLI's default arch (nf=64, gc=32, nb=1)
    torch.manual_seed(2)
    other = str(tmp_path / "gan.pth")
    torch.save(RRDBNetTorch(nf=64, nb=1, gc=32).state_dict(), other)
    out = str(tmp_path / "blend.pth")
    rc = main(["interp", "--psnr_ckpt", ck, "--gan_ckpt", other,
               "--alpha", "0.25", "--out", out, *SMALL_ARGS])
    assert rc == 0

    from super_resolution_tpu.checkpoint import restore_generator_params
    from super_resolution_tpu.import_torch import import_generator, load_pth

    pa, _ = restore_generator_params(ck, ema_decay=0.999)
    vb, _ = import_generator(load_pth(other))
    vm, _ = import_generator(load_pth(out))
    np.testing.assert_allclose(
        np.asarray(vm["params"]["conv_first"]["kernel"]),
        0.75 * np.asarray(pa["conv_first"]["kernel"])
        + 0.25 * np.asarray(vb["params"]["conv_first"]["kernel"]),
        atol=1e-6)


def test_interp_cli_rejects_mismatched_arch(tmp_path, small_pth):
    other = str(tmp_path / "big.pth")
    torch.save(RRDBNetTorch(nf=16, nb=2, gc=8).state_dict(), other)
    with pytest.raises(SystemExit, match="architectures differ"):
        main(["interp", "--psnr_ckpt", small_pth, "--gan_ckpt", other,
              "--alpha", "0.5", "--out", str(tmp_path / "x.pth"),
              *SMALL_ARGS])


def test_export_cli_release_shape(data_dir, tmp_path, capsys):
    """cli export of a SHORT run strips the immature params_ema by
    default (importers prefer params_ema, and an EMA inside its
    5/(1−decay) maturity horizon is the run's worst weights — round-4
    VERDICT weak #6); --ema forces the full BasicSR release shape
    {params, params_ema}, whose import then yields the EMA tree."""
    ck = str(tmp_path / "ck")
    main(["train", "--dataset_dir", data_dir, "--steps", "2",
          "--batch_size", "2", "--hr_height", "32", "--warmup_batches",
          "10", "--no_perceptual", "--checkpoint_interval", "2",
          "--checkpoint_dir", ck, "--n_cpu", "1", *SMALL_ARGS])
    out = str(tmp_path / "release.pth")
    # default: step 2 << 3000 maturity horizon → raw-only release
    rc = main(["export", "--checkpoint", ck, "--out", out,
               "--no-halo_sweep", *SMALL_ARGS])
    assert rc == 0
    assert "EMA maturity horizon" in capsys.readouterr().out
    sd = torch.load(out, weights_only=True)
    # no EMA tree → the bare flat state-dict convention (no params_ema
    # for importers to prefer)
    assert "params_ema" not in sd
    assert "conv_first.weight" in sd

    # --ema forces the family release shape
    rc = main(["export", "--checkpoint", ck, "--out", out, "--ema",
               "--no-halo_sweep", *SMALL_ARGS])
    assert rc == 0
    sd = torch.load(out, weights_only=True)
    assert set(sd) == {"params", "params_ema"}
    assert "conv_first.weight" in sd["params_ema"]

    from super_resolution_tpu.checkpoint import restore_generator_params
    from super_resolution_tpu.import_torch import import_generator, load_pth

    v, _ = import_generator(load_pth(out))     # prefers params_ema
    ema, _ = restore_generator_params(ck)      # ungated: EMA tree
    np.testing.assert_allclose(
        np.asarray(v["params"]["conv_first"]["kernel"]),
        np.asarray(ema["conv_first"]["kernel"]), atol=1e-7)
    raw, _ = restore_generator_params(ck, prefer_ema=False)
    assert np.abs(np.asarray(ema["conv_first"]["kernel"])
                  - np.asarray(raw["conv_first"]["kernel"])).max() > 0
    # the maturity-gated restore (what eval/upscale CLI passes) matches
    # the raw tree for this immature checkpoint
    gated, _ = restore_generator_params(ck, ema_decay=0.999)
    np.testing.assert_array_equal(
        np.asarray(gated["conv_first"]["kernel"]),
        np.asarray(raw["conv_first"]["kernel"]))


def test_export_import_roundtrip():
    """Generator exporter: flax → BasicSR .pth naming → importer → same
    tree (framework ↔ reference checkpoint interchange)."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.config import GeneratorConfig
    from super_resolution_tpu.import_torch import (
        export_generator,
        import_generator,
    )
    from super_resolution_tpu.models import RRDBNet

    cfg = GeneratorConfig(n_blocks=2, filters=16, growth=8)
    v = RRDBNet(cfg).init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    sd = export_generator(v["params"], cfg)
    assert "body.1.rdb3.conv5.weight" in sd
    v2, cfg2 = import_generator(sd)
    assert cfg2.n_blocks == 2 and cfg2.filters == 16
    for a, b in zip(jax.tree.leaves(v["params"]),
                    jax.tree.leaves(v2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_keeps_ema_for_warm_started_runs(data_dir, tmp_path,
                                                capsys):
    """The canonical fine-tune flow (pretrain → train --init_g_from):
    the fine-tune's EMA is seeded from the warm-start weights, so a
    short warm-started checkpoint must export WITH params_ema (round-5
    review — the step-count gate alone stripped it), while the
    from-scratch pretrain stays gated."""
    pre = str(tmp_path / "pre")
    main(["train", "--dataset_dir", data_dir, "--steps", "2",
          "--batch_size", "2", "--hr_height", "32", "--warmup_batches",
          "10", "--no_perceptual", "--checkpoint_interval", "2",
          "--checkpoint_dir", pre, "--n_cpu", "1", *SMALL_ARGS])
    ft = str(tmp_path / "ft")
    main(["train", "--dataset_dir", data_dir, "--steps", "2",
          "--batch_size", "2", "--hr_height", "32", "--warmup_batches",
          "10", "--no_perceptual", "--checkpoint_interval", "2",
          "--checkpoint_dir", ft, "--init_g_from", pre,
          "--n_cpu", "1", *SMALL_ARGS])
    capsys.readouterr()

    out = str(tmp_path / "rel.pth")
    rc = main(["export", "--checkpoint", ft, "--out", out,
               "--no-halo_sweep", *SMALL_ARGS])
    assert rc == 0
    assert "maturity horizon" not in capsys.readouterr().out
    sd = torch.load(out, weights_only=True)
    assert set(sd) == {"params", "params_ema"}


def test_export_val_dir_requires_a_halo_source(data_dir, tmp_path,
                                               capsys):
    """--val_dir with --no-halo_sweep and no --stamp_halo has no halo
    to measure at — must be a usage error, not a silent skip (round-5
    review)."""
    with pytest.raises(SystemExit) as ei:
        main(["export", "--checkpoint", str(tmp_path / "ck"),
              "--out", str(tmp_path / "r.pth"), "--no-halo_sweep",
              "--val_dir", data_dir, *SMALL_ARGS])
    assert ei.value.code == 2
    assert "needs a halo" in capsys.readouterr().err


def test_export_ema_flag_warns_on_pth_input(small_pth, tmp_path,
                                            capsys):
    """--ema/--no-ema cannot act on a .pth input (the import already
    collapsed it to one tree) — warn instead of silently ignoring."""
    rc = main(["export", "--checkpoint", small_pth,
               "--out", str(tmp_path / "r.pth"), "--ema",
               "--no-halo_sweep", *SMALL_ARGS])
    assert rc == 0
    assert "no effect on a .pth input" in capsys.readouterr().out
