"""ESRGAN loss suite as pure functions (SURVEY.md §2.1 "Loss suite").

Total generator loss (ESRGAN paper §3.3, SURVEY.md §3.1 call stack):

    L_G = L_percep + lambda_adv * L_RaGAN + lambda_pixel * L1

- pixel L1:       ``mean |G(x) - y|``                    (weight 1e-2)
- perceptual L1:  ``mean |phi(G(x)) - stop_grad(phi(y))|`` on VGG-19
                  conv5_4 pre-activation features         (weight 1)
- relativistic-average GAN (paper §3.2): the generator side uses the
  fake-vs-mean-real direction ``BCEwithLogits(D(x_f) - E[D(x_r)], 1)``;
  the discriminator loss is the mean of both directions.

Under data parallelism the ``E[D(.)]`` batch means must be *global* to
match large-batch single-device semantics — pass ``axis_name`` and the
means are ``lax.pmean``'d over the mesh (SURVEY.md §7 "GAN step as one
jit").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (SURVEY.md §3.3)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _bce_with_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Numerically stable BCEWithLogits against a constant 0/1 target."""
    # log(1+exp(-|x|)) + max(x,0) - x*target
    return jnp.mean(
        jnp.logaddexp(0.0, -jnp.abs(logits))
        + jnp.maximum(logits, 0.0) - logits * target
    )


def _batch_mean(logits: jnp.ndarray,
                axis_name: Optional[str]) -> jnp.ndarray:
    """E over the batch axis (axis 0), optionally global across the mesh."""
    m = jnp.mean(logits, axis=0, keepdims=True)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
    return m


def ragan_generator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray,
                         axis_name: Optional[str] = None) -> jnp.ndarray:
    """Relativistic-average adversarial loss, generator side.

    The family's train step uses the single fake-vs-E[real] direction
    (SURVEY.md §3.1: ``BCEwithLogits(pf − pr.mean(0,keepdim), 1)``); the
    real logits are stop-gradiented — only G's output should feel this
    gradient.
    """
    real_mean = _batch_mean(jax.lax.stop_gradient(real_logits), axis_name)
    return _bce_with_logits(fake_logits - real_mean, 1.0)


def ragan_generator_loss_two_sided(real_logits: jnp.ndarray,
                                   fake_logits: jnp.ndarray,
                                   axis_name: Optional[str] = None
                                   ) -> jnp.ndarray:
    """Relativistic-average G loss, xinntao/paper recipe (ESRGAN paper
    §3.2): the average of BOTH directions,

        ½[BCE(D(x_r) − E[D(x_f)], 0) + BCE(D(x_f) − E[D(x_r)], 1)]

    with the real logits detached (they come from D(hr), which G cannot
    influence) — gradient reaches G through the fake logits in both terms
    (the first via −E[D(x_f)]).  The single-direction recipe
    (:func:`ragan_generator_loss`) is the eriklindernoren-branch variant;
    ``LossConfig.ragan_g_two_sided`` selects between them so both family
    branches can be training-matched.
    """
    real = jax.lax.stop_gradient(real_logits)
    real_mean = _batch_mean(real, axis_name)
    fake_mean = _batch_mean(fake_logits, axis_name)
    loss_real = _bce_with_logits(real - fake_mean, 0.0)
    loss_fake = _bce_with_logits(fake_logits - real_mean, 1.0)
    return 0.5 * (loss_real + loss_fake)


def ragan_discriminator_loss(real_logits: jnp.ndarray,
                             fake_logits: jnp.ndarray,
                             axis_name: Optional[str] = None) -> jnp.ndarray:
    """D loss = mean of the two relativistic directions (SURVEY.md §3.1):
    ``½[BCE(pr − E[pf], 1) + BCE(pf − E[pr], 0)]``."""
    real_mean = _batch_mean(real_logits, axis_name)
    fake_mean = _batch_mean(fake_logits, axis_name)
    loss_real = _bce_with_logits(real_logits - fake_mean, 1.0)
    loss_fake = _bce_with_logits(fake_logits - real_mean, 0.0)
    return 0.5 * (loss_real + loss_fake)


def perceptual_loss(vgg_apply, vgg_params, pred: jnp.ndarray,
                    target: jnp.ndarray) -> jnp.ndarray:
    """L1 in VGG conv5_4 pre-activation feature space; target features are
    detached (SURVEY.md §3.1: ``vgg(hr).detach()``)."""
    f_pred = vgg_apply(vgg_params, pred)
    f_target = jax.lax.stop_gradient(vgg_apply(vgg_params, target))
    return l1_loss(f_pred, f_target)


def feature_matching_loss(feats_pred, feats_target) -> jnp.ndarray:
    """Discriminator-feature-matching perceptual term: mean per-scale L1
    between D's intermediate activations on SR vs HR, targets detached —
    the VGG-free perceptual substitute
    (``LossConfig.perceptual_source='d_features'``) for environments
    without ImageNet VGG weights (SURVEY.md §2.2: "or the loss
    re-specced"; the pix2pixHD/feature-matching recipe).  Normalizing by
    each scale's detached mean |activation| keeps the scales comparable
    and the weight roughly architecture-independent."""
    total = 0.0
    for fp, ft in zip(feats_pred, feats_target):
        ft = jax.lax.stop_gradient(ft)
        denom = jax.lax.stop_gradient(
            jnp.mean(jnp.abs(ft)) + 1e-6)
        total = total + l1_loss(fp, ft) / denom
    return total / len(feats_pred)
