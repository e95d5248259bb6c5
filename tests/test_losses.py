"""Loss unit tests: RaGAN math vs hand computation and vs torch
BCEWithLogits (SURVEY.md §4.2), gradient-flow properties, PSNR formula."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.losses import (
    _bce_with_logits,
    l1_loss,
    perceptual_loss,
    psnr,
    ragan_discriminator_loss,
    ragan_generator_loss,
    ragan_generator_loss_two_sided,
)


def test_bce_with_logits_matches_torch():
    logits = np.random.RandomState(0).randn(64).astype(np.float32) * 5
    for target in (0.0, 1.0):
        ours = float(_bce_with_logits(jnp.asarray(logits), target))
        ref = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits),
            torch.full((64,), target)).item()
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


@pytest.mark.fast
def test_ragan_losses_match_reference_recipe():
    """SURVEY.md §3.1: G: BCE(pf − mean(pr), 1);
    D: ½[BCE(pr − mean(pf), 1) + BCE(pf − mean(pr), 0)]."""
    rng = np.random.RandomState(1)
    pr = rng.randn(8, 4, 4, 1).astype(np.float32)
    pf = rng.randn(8, 4, 4, 1).astype(np.float32)
    tpr, tpf = torch.from_numpy(pr), torch.from_numpy(pf)
    bce = torch.nn.functional.binary_cross_entropy_with_logits

    g_ref = bce(tpf - tpr.mean(0, keepdim=True),
                torch.ones_like(tpf)).item()
    d_ref = 0.5 * (bce(tpr - tpf.mean(0, keepdim=True),
                       torch.ones_like(tpr)).item()
                   + bce(tpf - tpr.mean(0, keepdim=True),
                         torch.zeros_like(tpf)).item())

    g = float(ragan_generator_loss(jnp.asarray(pr), jnp.asarray(pf)))
    d = float(ragan_discriminator_loss(jnp.asarray(pr), jnp.asarray(pf)))
    np.testing.assert_allclose(g, g_ref, rtol=1e-5)
    np.testing.assert_allclose(d, d_ref, rtol=1e-5)


def test_ragan_generator_two_sided_matches_xinntao_recipe():
    """xinntao/paper G loss: ½[BCE(pr_detached − mean(pf), 0) +
    BCE(pf − mean(pr_detached), 1)] (ESRGAN paper §3.2)."""
    rng = np.random.RandomState(3)
    pr = rng.randn(8, 4, 4, 1).astype(np.float32)
    pf = rng.randn(8, 4, 4, 1).astype(np.float32)
    tpr, tpf = torch.from_numpy(pr), torch.from_numpy(pf)
    bce = torch.nn.functional.binary_cross_entropy_with_logits

    ref = 0.5 * (bce(tpr - tpf.mean(0, keepdim=True),
                     torch.zeros_like(tpr)).item()
                 + bce(tpf - tpr.mean(0, keepdim=True),
                       torch.ones_like(tpf)).item())
    got = float(ragan_generator_loss_two_sided(jnp.asarray(pr),
                                               jnp.asarray(pf)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ragan_generator_two_sided_gradient_flow():
    """Real logits are detached; fake logits get gradient through BOTH
    terms (the first via −E[D(x_f)])."""
    pr = jnp.asarray(np.random.RandomState(4).randn(4, 2).astype(np.float32))
    pf = jnp.asarray(np.random.RandomState(5).randn(4, 2).astype(np.float32))
    g_real = jax.grad(
        lambda r: ragan_generator_loss_two_sided(r, pf))(pr)
    g_fake = jax.grad(
        lambda f: ragan_generator_loss_two_sided(pr, f))(pf)
    assert float(jnp.abs(g_real).max()) == 0.0
    assert float(jnp.abs(g_fake).max()) > 0.0

    # torch cross-check of the fake-side gradient
    tpr = torch.from_numpy(np.asarray(pr))
    tpf = torch.from_numpy(np.asarray(pf)).requires_grad_(True)
    bce = torch.nn.functional.binary_cross_entropy_with_logits
    loss = 0.5 * (bce(tpr - tpf.mean(0, keepdim=True),
                      torch.zeros_like(tpr))
                  + bce(tpf - tpr.mean(0, keepdim=True),
                        torch.ones_like(tpf)))
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_fake), tpf.grad.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_ragan_two_sided_global_mean_matches_large_batch():
    from jax.sharding import Mesh
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(6)
    pr = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    pf = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    whole = float(ragan_generator_loss_two_sided(pr, pf))
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = shard_map(
        lambda r, f: jax.lax.pmean(
            ragan_generator_loss_two_sided(r, f, axis_name="dp"), "dp"),
        mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P())
    np.testing.assert_allclose(float(sharded(pr, pf)), whole, rtol=1e-5)


def test_ragan_generator_loss_stops_gradient_through_real():
    """Only fake logits should carry gradient on the G side (real logits
    come from D(hr) which G cannot influence)."""
    pr = jnp.ones((4, 2)) * 0.3
    pf = jnp.ones((4, 2)) * -0.2
    g_real = jax.grad(
        lambda r: ragan_generator_loss(r, pf))(pr)
    g_fake = jax.grad(
        lambda f: ragan_generator_loss(pr, f))(pf)
    assert float(jnp.abs(g_real).max()) == 0.0
    assert float(jnp.abs(g_fake).max()) > 0.0


def test_ragan_global_mean_matches_large_batch():
    """With axis_name, sharded RaGAN must equal single-device large-batch
    semantics (SURVEY.md §7 'GAN step as one jit')."""
    from jax.sharding import Mesh
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(2)
    pr = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    pf = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    whole_g = float(ragan_generator_loss(pr, pf))
    whole_d = float(ragan_discriminator_loss(pr, pf))

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = shard_map(
        lambda r, f: (
            jax.lax.pmean(ragan_generator_loss(r, f, axis_name="dp"), "dp"),
            jax.lax.pmean(ragan_discriminator_loss(r, f, axis_name="dp"),
                          "dp"),
        ),
        mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=(P(), P()))
    g, d = sharded(pr, pf)
    np.testing.assert_allclose(float(g), whole_g, rtol=1e-5)
    np.testing.assert_allclose(float(d), whole_d, rtol=1e-5)


def test_psnr_formula():
    a = jnp.zeros((4, 4))
    b = jnp.full((4, 4), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)
    assert float(psnr(a, a)) > 100.0


def test_l1():
    a, b = jnp.asarray([1.0, -2.0]), jnp.asarray([0.0, 0.0])
    assert float(l1_loss(a, b)) == 1.5


@pytest.mark.fast
def test_feature_matching_loss_math_and_gradient():
    """Per-scale L1 normalized by the detached target magnitude; target
    side carries no gradient."""
    from super_resolution_tpu.losses import feature_matching_loss

    fp = [jnp.full((2, 4, 4, 8), 2.0), jnp.full((2, 2, 2, 16), 1.0)]
    ft = [jnp.full((2, 4, 4, 8), 4.0), jnp.full((2, 2, 2, 16), 3.0)]
    # scale 1: L1=2, denom=4 -> 0.5 ; scale 2: L1=2, denom=3 -> 2/3
    got = float(feature_matching_loss(fp, ft))
    np.testing.assert_allclose(got, 0.5 * (2 / 4 + 2 / 3), rtol=1e-5)

    g_t = jax.grad(lambda t: feature_matching_loss(
        fp, [t, ft[1]]))(ft[0])
    g_p = jax.grad(lambda p: feature_matching_loss(
        [p, fp[1]], ft))(fp[0])
    assert float(jnp.abs(g_t).max()) == 0.0
    assert float(jnp.abs(g_p).max()) > 0.0


def test_perceptual_loss_detaches_target():
    calls = []

    def fake_vgg(params, x):
        calls.append(x)
        return x * 2.0

    x = jnp.ones((2, 4, 4, 3))
    y = jnp.zeros((2, 4, 4, 3))
    grad = jax.grad(
        lambda t: perceptual_loss(fake_vgg, None, x, t))(y)
    assert float(jnp.abs(grad).max()) == 0.0   # target side is detached
    gx = jax.grad(lambda p: perceptual_loss(fake_vgg, None, p, y))(x)
    assert float(jnp.abs(gx).max()) > 0.0
