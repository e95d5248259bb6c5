"""Golden-tensor parity: Flax models vs the torch-side executable spec
(SURVEY.md §4.1) — identical weights via the ``.pth`` importer, identical
inputs, fp32-tolerance outputs."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from super_resolution_tpu.config import DiscriminatorConfig, GeneratorConfig
from super_resolution_tpu.import_torch import (
    import_discriminator,
    import_generator,
    import_vgg,
)
from super_resolution_tpu.models import Discriminator, RRDBNet, VGGFeatures

from torch_spec import DiscriminatorTorch, RRDBNetTorch, VGGFeaturesTorch


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


SMALL = dict(nf=32, nb=2, gc=16)


@pytest.mark.parametrize("upsampler", ["nearest_conv", "pixelshuffle"])
def test_generator_parity(upsampler):
    torch.manual_seed(0)
    tm = RRDBNetTorch(upsampler=upsampler, **SMALL).eval()
    variables, cfg = import_generator(tm.state_dict())
    assert cfg.n_blocks == SMALL["nb"]
    assert cfg.filters == SMALL["nf"]
    assert cfg.growth == SMALL["gc"]
    assert cfg.upsampler == upsampler

    fm = RRDBNet(cfg)
    x = torch.randn(2, 3, 24, 20)
    with torch.no_grad():
        ref = _nhwc(tm(x))
    out = np.asarray(fm.apply(variables, jnp.asarray(_nhwc(x))))
    assert out.shape == ref.shape == (2, 96, 80, 3)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.fast
def test_generator_parity_full_size_single_block():
    """Full-width (nf=64, gc=32) single-block generator — exercises the
    canonical channel widths without the 23-block compile cost."""
    torch.manual_seed(1)
    tm = RRDBNetTorch(nf=64, nb=1, gc=32).eval()
    variables, cfg = import_generator(tm.state_dict())
    fm = RRDBNet(cfg)
    x = torch.randn(1, 3, 48, 48)
    with torch.no_grad():
        ref = _nhwc(tm(x))
    out = np.asarray(fm.apply(variables, jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.fast
def test_discriminator_parity_eval():
    torch.manual_seed(2)
    tm = DiscriminatorTorch()
    # randomize running stats so eval-mode BN is actually exercised
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    variables, cfg = import_discriminator(tm.state_dict())
    fm = Discriminator(cfg)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = _nhwc(tm(x))
    out = np.asarray(fm.apply(variables, jnp.asarray(_nhwc(x)),
                              train=False))
    assert out.shape == ref.shape == (2, 4, 4, 1)
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_discriminator_parity_train_mode():
    """Train-mode BN (batch statistics) must also match — the GAN step
    runs D in train mode (SURVEY.md §3.1)."""
    torch.manual_seed(3)
    tm = DiscriminatorTorch().train()
    variables, cfg = import_discriminator(tm.state_dict())
    fm = Discriminator(cfg)
    x = torch.randn(4, 3, 32, 32)
    with torch.no_grad():
        ref = _nhwc(tm(x))
    out, _ = fm.apply(variables, jnp.asarray(_nhwc(x)), train=True,
                      mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-3)


def test_vgg_parity():
    torch.manual_seed(4)
    tm = VGGFeaturesTorch().eval()
    variables = import_vgg(tm.state_dict())
    fm = VGGFeatures()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = _nhwc(tm(x))
    out = np.asarray(fm.apply(variables, jnp.asarray(_nhwc(x))))
    assert out.shape == ref.shape == (1, 4, 4, 512)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def _rewrite_basicsr_to_xinntao_old(sd, nb):
    out = {}
    for k, v in sd.items():
        k = k.replace("conv_first", "model.0")
        k = k.replace("conv_body", f"model.1.sub.{nb}")
        k = k.replace("conv_up1", "model.3").replace("conv_up2", "model.6")
        k = k.replace("conv_hr", "model.8").replace("conv_last", "model.10")
        if k.startswith("body."):
            _, b, rdb, conv, leaf = k.split(".")
            k = f"model.1.sub.{b}.{rdb.upper()}.{conv}.0.{leaf}"
        out[k] = v
    return out


def _rewrite_basicsr_to_erik(sd):
    out = {}
    for k, v in sd.items():
        k = k.replace("conv_first", "conv1").replace("conv_body", "conv2")
        k = k.replace("conv_up1", "upsampling.0")
        k = k.replace("conv_up2", "upsampling.3")
        k = k.replace("conv_hr", "conv3.0").replace("conv_last", "conv3.2")
        if k.startswith("body."):
            _, b, rdb, conv, leaf = k.split(".")
            k = (f"res_blocks.{b}.dense_blocks.{int(rdb[3]) - 1}."
                 f"b{conv[4]}.0.{leaf}")
        out[k] = v
    return out


@pytest.mark.parametrize("rewrite", ["xinntao_old", "erik"])
def test_importer_alternate_namings(rewrite):
    """All family naming conventions import to the identical flax tree."""
    torch.manual_seed(5)
    tm = RRDBNetTorch(**SMALL)
    sd = tm.state_dict()
    ref_vars, ref_cfg = import_generator(sd)
    if rewrite == "xinntao_old":
        sd2 = _rewrite_basicsr_to_xinntao_old(sd, SMALL["nb"])
    else:
        sd2 = _rewrite_basicsr_to_erik(sd)
    got_vars, got_cfg = import_generator(sd2)
    if rewrite == "erik":
        # the erik lineage's nn.LeakyReLU() default slope is inferred
        import dataclasses
        assert got_cfg.lrelu_slope == 0.01
        got_cfg = dataclasses.replace(got_cfg, lrelu_slope=0.2)
    assert got_cfg == ref_cfg
    import jax
    ref_leaves = jax.tree.leaves_with_path(ref_vars)
    got_leaves = jax.tree.leaves_with_path(got_vars)
    assert len(ref_leaves) == len(got_leaves)
    for (pa, va), (pb, vb) in zip(ref_leaves, got_leaves):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_generator_parity_erik_default_slope():
    """The eriklindernoren branch's generator uses nn.LeakyReLU() (slope
    0.01); importing its naming must set lrelu_slope=0.01 and match the
    torch forward (ADVICE.md round 1, medium)."""
    torch.manual_seed(8)
    tm = RRDBNetTorch(upsampler="pixelshuffle", slope=0.01, **SMALL).eval()
    sd = _rewrite_basicsr_to_erik(tm.state_dict())
    variables, cfg = import_generator(sd)
    assert cfg.lrelu_slope == 0.01
    fm = RRDBNet(cfg)
    x = torch.randn(1, 3, 24, 24)
    with torch.no_grad():
        ref = _nhwc(tm(x))
    out = np.asarray(fm.apply(variables, jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_importer_params_ema_and_mixed_dtype(tmp_path):
    """BasicSR {'params_ema': …} wrapping (preferred over 'params') and
    fp16/bf16 tensors must import (VERDICT round 1, missing #1)."""
    from super_resolution_tpu.import_torch import load_pth

    torch.manual_seed(9)
    tm = RRDBNetTorch(**SMALL)
    sd_ema = {k: v.to(torch.bfloat16) for k, v in tm.state_dict().items()}
    sd_stale = {k: torch.zeros_like(v) for k, v in tm.state_dict().items()}
    path = str(tmp_path / "g.pth")
    torch.save({"params": sd_stale, "params_ema": sd_ema}, path)

    flat = load_pth(path)
    variables, cfg = import_generator(flat)
    assert cfg.n_blocks == SMALL["nb"]
    # params_ema (non-zero) must win over params (zeros)
    k = np.asarray(variables["params"]["conv_first"]["kernel"])
    assert np.abs(k).max() > 0
    assert k.dtype == np.float32


def test_importer_strict_false_ignores_extra_keys():
    torch.manual_seed(10)
    tm = RRDBNetTorch(**SMALL)
    sd = dict(tm.state_dict())
    sd["step"] = torch.tensor(12345)
    with pytest.raises(ValueError, match="unmapped"):
        import_generator(sd)
    variables, cfg = import_generator(sd, strict=False)
    assert cfg.n_blocks == SMALL["nb"]


def test_discriminator_export_roundtrip_through_torch():
    """flax D → export → torch module → outputs match (both directions of
    the interchange are exact)."""
    from super_resolution_tpu.config import DiscriminatorConfig
    from super_resolution_tpu.import_torch import export_discriminator

    import jax
    import jax.numpy as jnp

    cfg = DiscriminatorConfig(base_filters=8, n_scales=2)
    fm = Discriminator(cfg)
    variables = fm.init(jax.random.key(7), jnp.zeros((1, 32, 32, 3)),
                        train=False)
    sd = export_discriminator(variables, cfg)

    tm = DiscriminatorTorch(base=8, n_scales=2)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()})
    tm.eval()

    x = torch.randn(2, 3, 32, 32)
    ref = _nhwc(tm(x))
    out = np.asarray(fm.apply(variables, jnp.asarray(_nhwc(x)),
                              train=False))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_importer_rejects_config_mismatch():
    torch.manual_seed(6)
    tm = RRDBNetTorch(**SMALL)
    with pytest.raises(ValueError, match="n_blocks"):
        import_generator(tm.state_dict(), GeneratorConfig(n_blocks=23,
                                                          filters=32,
                                                          growth=16))
