"""Shape/param-count unit tests (SURVEY.md §4.2: 16,697,987 params for the
canonical 23-block generator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_resolution_tpu.config import DiscriminatorConfig, GeneratorConfig
from super_resolution_tpu.models import Discriminator, RRDBNet, VGGFeatures
from super_resolution_tpu.ops import nearest_upsample, pixel_shuffle


def _n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


@pytest.mark.fast
def test_canonical_generator_param_count():
    g = RRDBNet(GeneratorConfig())
    params = jax.eval_shape(
        lambda k: g.init(k, jnp.zeros((1, 8, 8, 3))), jax.random.key(0))
    assert _n_params(params) == 16_697_987


@pytest.mark.fast
def test_generator_output_shape_and_scale():
    cfg = GeneratorConfig(n_blocks=1, filters=16, growth=8)
    g = RRDBNet(cfg)
    v = g.init(jax.random.key(0), jnp.zeros((2, 12, 10, 3)))
    y = g.apply(v, jnp.zeros((2, 12, 10, 3)))
    assert y.shape == (2, 48, 40, 3)
    assert y.dtype == jnp.float32


def test_generator_bf16_close_to_fp32():
    cfg = GeneratorConfig(n_blocks=1, filters=16, growth=8)
    v = RRDBNet(cfg).init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 3))
    y32 = RRDBNet(cfg, dtype=jnp.float32).apply(v, x)
    y16 = RRDBNet(cfg, dtype=jnp.bfloat16).apply(v, x)
    assert y16.dtype == jnp.float32          # outputs upcast
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=0.1)


def test_discriminator_param_count_and_logit_map():
    d = Discriminator(DiscriminatorConfig())
    v = jax.eval_shape(
        lambda k: d.init(k, jnp.zeros((1, 192, 192, 3))), jax.random.key(0))
    assert _n_params(v["params"]) == 4_693_697
    d_small = Discriminator()
    vs = d_small.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    y = d_small.apply(vs, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.shape == (1, 4, 4, 1)           # (H/16, W/16) logit map


def test_vgg_param_count():
    v = VGGFeatures()
    params = jax.eval_shape(
        lambda k: v.init(k, jnp.zeros((1, 32, 32, 3))), jax.random.key(0))
    assert _n_params(params) == 20_024_384


def test_pixel_shuffle_matches_torch_semantics():
    import torch

    x = np.random.RandomState(0).randn(2, 3, 4, 16).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


def test_nearest_upsample_matches_torch():
    import torch

    x = np.random.RandomState(1).randn(1, 5, 7, 4).astype(np.float32)
    ours = np.asarray(nearest_upsample(jnp.asarray(x), 2))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
        mode="nearest").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("scale", [2, 8])
def test_generator_other_scales(scale):
    """×2 and ×8 variants (1 and 3 upsample stages) — the config's scale
    is a power of two, not hardwired to 4."""
    cfg = GeneratorConfig(n_blocks=1, filters=8, growth=4, scale=scale)
    g = RRDBNet(cfg)
    v = g.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    y = g.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert y.shape == (1, 8 * scale, 8 * scale, 3)
    n_up = {2: 1, 8: 3}[scale]
    assert f"upconv{n_up}" in v["params"]
    assert f"upconv{n_up + 1}" not in v["params"]


def test_generator_rejects_non_power_of_two_scale():
    cfg = GeneratorConfig(scale=3)
    with pytest.raises(AssertionError):
        cfg.n_upsample


@pytest.mark.parametrize("scheme", ["torch_default", "msra_scaled"])
def test_init_schemes_statistics(scheme):
    cfg = GeneratorConfig(n_blocks=1, filters=64, growth=32, init=scheme)
    v = RRDBNet(cfg).init(jax.random.key(3), jnp.zeros((1, 8, 8, 3)))
    k = v["params"]["block0"]["dense1"]["conv2"]["kernel"]
    fan_in = 9 * k.shape[2]
    if scheme == "torch_default":
        bound = 1.0 / np.sqrt(fan_in)
        assert float(jnp.abs(k).max()) <= bound + 1e-6
        assert float(jnp.std(k)) == pytest.approx(bound / np.sqrt(3), rel=0.1)
    else:
        assert float(jnp.std(k)) == pytest.approx(
            0.1 * np.sqrt(2.0 / fan_in), rel=0.1)
        assert float(jnp.abs(v["params"]["block0"]["dense1"]["conv2"]
                             ["bias"]).max()) == 0.0


def test_tail_up_polyphase_matches_naive_model():
    """GeneratorConfig.tail_up='polyphase' shares the param tree with
    the naive repeat→conv form and produces the same output (fp32)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.config import GeneratorConfig
    from super_resolution_tpu.models import RRDBNet

    cfg = GeneratorConfig(n_blocks=1, filters=16, growth=8,
                          tail_up="naive")
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 10, 3)
                    .astype(np.float32))
    net_a = RRDBNet(cfg, dtype=jnp.float32)
    params = net_a.init(jax.random.key(0), x)
    net_b = RRDBNet(dataclasses.replace(cfg, tail_up="polyphase"),
                    dtype=jnp.float32)
    ya = net_a.apply(params, x)
    yb = net_b.apply(params, x)          # same tree accepted
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               atol=2e-5, rtol=1e-4)


def test_conv_impl_auto_resolution(monkeypatch):
    """conv_impl='auto' (the GeneratorConfig default) resolves by
    backend: pallas_cf on TPU, lax elsewhere — so the CLI/default path
    gets the fastest measured implementation without a flag, and CPU
    runs never touch Mosaic.  Explicit impls pass through untouched."""
    from super_resolution_tpu.config import TrainConfig, resolve_conv_impl
    from super_resolution_tpu.train.steps import _training_cfg

    assert GeneratorConfig().conv_impl == "auto"
    # this suite forces the CPU backend (conftest)
    assert resolve_conv_impl("auto") == "lax"
    assert resolve_conv_impl("pallas_cf") == "pallas_cf"
    assert resolve_conv_impl("lax") == "lax"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_conv_impl("auto") == "pallas_cf"
    monkeypatch.undo()

    # _training_cfg resolves auto before its width routing (CPU → lax)
    cfg = _training_cfg(TrainConfig())
    assert cfg.generator.conv_impl == "lax"

    # model-level: auto on CPU behaves exactly like explicit lax
    import dataclasses

    gcfg = GeneratorConfig(n_blocks=1, filters=16, growth=8)
    assert gcfg.conv_impl == "auto"
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 3)
                    .astype(np.float32))
    net = RRDBNet(gcfg, dtype=jnp.float32)
    params = net.init(jax.random.key(0), x)
    y_auto = net.apply(params, x)
    net_lax = RRDBNet(dataclasses.replace(gcfg, conv_impl="lax"),
                      dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y_auto),
                                  np.asarray(net_lax.apply(params, x)))
