"""Jitted train steps: L1 warmup pretrain and the full alternating-G/D
GAN step as single compiled functions (SURVEY.md §3.1 hot loop).

Design notes (SURVEY.md §7 "GAN step as one jit"):

- The warmup branch (``batches_done < warmup_batches``) is *host-side*
  control flow: the loop picks :func:`make_pretrain_step` or
  :func:`make_gan_step` by step count, so neither compiled graph carries a
  dead branch.
- One GAN step computes G grads and D grads in a single traced function:
  preprocess → G fwd → D(hr), D(sr) → G losses/grads → D(hr), D(sr̄)
  (detached, matching the reference's recompute) → D losses/grads → two
  Adam updates.  ``stop_gradient`` placement mirrors the reference:
  ``gen_hr.detach()`` for the D step and ``vgg(hr).detach()`` in the
  perceptual term.
- Data parallelism is *sharding, not code*: these steps contain only
  global-batch semantics (plain ``jnp.mean``s), so running them under jit
  with batch-sharded inputs over a Mesh reproduces large-batch
  single-device semantics exactly — XLA inserts the psums (SURVEY.md §2.3,
  §2.4).  RaGAN batch means and BatchNorm statistics are therefore
  automatically mesh-global.
- D's BatchNorm running stats update once per step from the D-step
  forwards by default (eval-only impact); ``cfg.bn_track_g_step=True``
  chains the EMAs through all four forwards per iteration in reference
  order (hr, sr, hr, sr̄) for training-parity runs.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from super_resolution_tpu.config import TrainConfig
from super_resolution_tpu.data.augment import preprocess_batch
from super_resolution_tpu.losses import (
    feature_matching_loss,
    l1_loss,
    perceptual_loss,
    psnr,
    ragan_discriminator_loss,
    ragan_generator_loss,
    ragan_generator_loss_two_sided,
)
from super_resolution_tpu.train.state import (
    GANTrainState,
    build_models,
    ema_update,
    make_optimizer,
)

Metrics = Dict[str, jnp.ndarray]
StepFn = Callable[[GANTrainState, jnp.ndarray],
                  Tuple[GANTrainState, Metrics]]


def _training_cfg(cfg: TrainConfig) -> TrainConfig:
    """Pick the conv implementation training differentiates through.

    ``pallas_cf`` is fully differentiable (custom Mosaic backward,
    ops/pallas/dense_block_cf_vjp.py) and trains as-is — single chip OR
    under data parallelism (the forward/backward are batch-partitioned
    via custom_partitioning, with the weight-grad psum inside the
    partition; ops/pallas/partitioned.py).  The kernel wins when the
    row width the MXU sees is 128-aligned: either the LR patch width is
    a multiple of 128, or the model's batch-to-lane fold
    (models/rrdb._fold_factor) can make it one — at the canonical 192²
    patches (W=48) the fold packs g=8 images per lane row
    (BENCHNOTES.md round 3).

    Fold × data parallelism (round 4): the fold reshape groups g
    CONSECUTIVE batch images, and batch sharding places contiguous
    blocks of B/dp images per device — so when the local batch divides
    by g (B % (g·dp) == 0), every fold group is shard-local, GSPMD
    partitions the (B → B/g, g) split reshape with zero communication,
    and the folded trunk stays on the kernel under DP (the
    custom_partitioning seam in ops/pallas/partitioned.py sees the
    folded batch dim sharded and runs per shard as usual).  At the
    canonical config-5 shape (192² patches, W=48 → g=8) that means a
    global batch of 64+ over 8 chips keeps the kernel's training win;
    smaller batches fall back to lax (a fold group would straddle
    shards).  The experimental ``pallas``/``pallas_fused`` paths define
    no VJP and always fall back.  The param tree is
    implementation-agnostic either way, so checkpoints swap freely."""
    import dataclasses

    from super_resolution_tpu.config import resolve_conv_impl
    from super_resolution_tpu.models.rrdb import _fold_factor, _pick_rows

    impl = resolve_conv_impl(cfg.generator.conv_impl)
    if impl != cfg.generator.conv_impl:
        cfg = dataclasses.replace(
            cfg, generator=dataclasses.replace(cfg.generator,
                                               conv_impl=impl))
    lr_h, lr_w = cfg.data.lr_patch_hw
    if impl == "lax":
        return cfg
    if impl in ("pallas_cf", "pallas_cf_tail"):
        if lr_w % 128 == 0:
            return cfg
        g = _fold_factor(cfg.data.batch_size, lr_w)
        c_total = cfg.generator.filters \
            + (cfg.generator.n_dense_convs - 1) * cfg.generator.growth
        dp = max(cfg.data_parallel, 1)
        if (g > 1
                and cfg.data.batch_size % (g * dp) == 0
                and _pick_rows(lr_h, g * lr_w, c_total=c_total)
                is not None):
            return cfg
    return dataclasses.replace(
        cfg, generator=dataclasses.replace(cfg.generator,
                                           conv_impl="lax"))


def _prep(state: GANTrainState, hr_uint8: jnp.ndarray, cfg: TrainConfig):
    rng, k_aug = jax.random.split(state.rng)
    batch = preprocess_batch(k_aug, hr_uint8, cfg.data)
    return rng, batch["lr"], batch["hr"]


def _psnr01(cfg: TrainConfig, sr: jnp.ndarray, hr: jnp.ndarray):
    """PSNR in [0,1] image space (denormalized + clipped) so train-log
    PSNR is directly comparable to eval PSNR and reference numbers —
    PSNR on ImageNet-normalized tensors would read ~13 dB low."""
    from super_resolution_tpu.data.augment import denormalize

    mean, std = cfg.data.normalize_mean, cfg.data.normalize_std
    sr01 = jnp.clip(denormalize(sr, mean, std), 0.0, 1.0)
    return psnr(sr01, denormalize(hr, mean, std))


def make_pretrain_step(cfg: TrainConfig, jit: bool = True) -> StepFn:
    """PSNR-only L1 pretraining of G (SURVEY.md §3.1 warmup branch;
    BASELINE.json config 2)."""
    cfg = _training_cfg(cfg)
    g, _, _ = build_models(cfg)
    opt_g = make_optimizer(cfg.optim_g)

    def step(state: GANTrainState, hr_uint8: jnp.ndarray):
        rng, lr, hr = _prep(state, hr_uint8, cfg)

        def loss_fn(g_params):
            sr = g.apply({"params": g_params}, lr)
            return l1_loss(sr, hr), sr

        (pix, sr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params)
        updates, g_opt = opt_g.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        metrics = {"loss_pixel": pix, "psnr": _psnr01(cfg, sr, hr),
                   "grad_norm_g": optax.global_norm(grads)}
        return state.replace(step=state.step + 1, rng=rng,
                             g_params=g_params, g_opt=g_opt,
                             g_ema=ema_update(cfg, state.g_ema, g_params),
                             ), metrics

    if jit:
        step = jax.jit(step, donate_argnums=(0,) if cfg.donate_buffers
                       else ())
    return step


def make_gan_step(cfg: TrainConfig, jit: bool = True) -> StepFn:
    """Full ESRGAN alternating G/D step (SURVEY.md §3.1; BASELINE.json
    config 3).

    ``cfg.dedup_d_hr`` selects a restructured step that computes the
    D(hr) forward ONCE (3 discriminator forwards per step instead of
    the reference's 4): G's loss depends on ``g_params`` only through
    ``sr``, and the RaGAN/feature-matching references to D(hr) carry no
    generator gradient, so the D-step's differentiated D(hr) forward
    can donate its value (and feature maps) to the G loss.  The G
    gradient chains ``d loss(sr) / d sr`` through ``jax.vjp`` of the
    generator — mathematically identical updates (tested vs the
    reference-shaped step on CPU).  Mutually exclusive with
    ``bn_track_g_step`` (whose point is replaying the reference's
    4-forward BN bookkeeping order)."""
    cfg = _training_cfg(cfg)
    g, d, vgg = build_models(cfg)
    opt_g = make_optimizer(cfg.optim_g)
    opt_d = make_optimizer(cfg.optim_d)
    lcfg = cfg.loss

    if cfg.dedup_d_hr and not cfg.bn_track_g_step:
        step = _dedup_gan_step(cfg, g, d, vgg, opt_g, opt_d)
        if jit:
            step = jax.jit(step, donate_argnums=(0,) if cfg.donate_buffers
                           else ())
        return step

    def step(state: GANTrainState, hr_uint8: jnp.ndarray):
        rng, lr, hr = _prep(state, hr_uint8, cfg)
        d_vars = {"params": state.d_params, "batch_stats": state.d_stats}

        # ---- generator update ----
        dfm = lcfg.use_perceptual and lcfg.perceptual_source == "d_features"

        def g_loss_fn(g_params):
            sr = g.apply({"params": g_params}, lr)
            pix = l1_loss(sr, hr)
            # D in train mode (batch stats).  With cfg.bn_track_g_step
            # the running-stat EMAs chain through BOTH G-step forwards in
            # reference order (hr then sr) and are carried into the D
            # step below; otherwise they are discarded here (eval-only
            # impact, forwards order-independent).  With d_features
            # perceptual the same forwards yield the feature maps — no
            # extra D passes.
            (pr, fr), st_hr = d.apply(d_vars, hr, train=True,
                                      mutable=["batch_stats"],
                                      return_features=True)
            d_vars2 = ({"params": state.d_params,
                        "batch_stats": st_hr["batch_stats"]}
                       if cfg.bn_track_g_step else d_vars)
            (pf, ff), st_sr = d.apply(d_vars2, sr, train=True,
                                      mutable=["batch_stats"],
                                      return_features=True)
            g_adv_fn = (ragan_generator_loss_two_sided
                        if lcfg.ragan_g_two_sided else ragan_generator_loss)
            adv = g_adv_fn(pr, pf)
            parts = {"loss_pixel": pix, "loss_adv": adv}
            total = lcfg.lambda_adv * adv + lcfg.lambda_pixel * pix
            if vgg is not None:
                perc = perceptual_loss(
                    lambda p, x: vgg.apply(p, x), state.vgg_params, sr, hr)
                parts["loss_percep"] = perc
                total = total + lcfg.lambda_percep * perc
            elif dfm:
                perc = feature_matching_loss(ff, fr)
                parts["loss_percep"] = perc
                total = total + lcfg.lambda_percep * perc
            parts["loss_g"] = total
            return total, (sr, parts, st_sr["batch_stats"])

        (_, (sr, g_parts, g_step_stats)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = opt_g.update(g_grads, state.g_opt,
                                        state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- discriminator update (recomputed forwards on detached sr,
        # matching the reference's D step) ----
        sr_detached = jax.lax.stop_gradient(sr)
        d_step_stats0 = (jax.lax.stop_gradient(g_step_stats)
                         if cfg.bn_track_g_step else state.d_stats)

        def d_loss_fn(d_params):
            dv = {"params": d_params, "batch_stats": d_step_stats0}
            pr, st1 = d.apply(dv, hr, train=True, mutable=["batch_stats"])
            dv2 = {"params": d_params,
                   "batch_stats": st1["batch_stats"]}
            pf, st2 = d.apply(dv2, sr_detached, train=True,
                              mutable=["batch_stats"])
            return (ragan_discriminator_loss(pr, pf),
                    st2["batch_stats"])

        (d_loss, d_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = opt_d.update(d_grads, state.d_opt,
                                       state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = dict(g_parts)
        metrics.update({
            "loss_d": d_loss,
            "psnr": _psnr01(cfg, sr_detached, hr),
            "grad_norm_g": optax.global_norm(g_grads),
            "grad_norm_d": optax.global_norm(d_grads),
        })
        new_state = state.replace(
            step=state.step + 1, rng=rng,
            g_params=g_params, g_opt=g_opt,
            g_ema=ema_update(cfg, state.g_ema, g_params),
            d_params=d_params, d_stats=d_stats, d_opt=d_opt)
        return new_state, metrics

    if jit:
        step = jax.jit(step, donate_argnums=(0,) if cfg.donate_buffers
                       else ())
    return step


def _dedup_gan_step(cfg: TrainConfig, g, d, vgg, opt_g, opt_d) -> StepFn:
    """The deduplicated GAN step body (see make_gan_step docstring).
    Default BN bookkeeping only (D running stats from the D-step
    forwards; G-side D forwards never touch them — train-mode BN
    normalizes with CURRENT batch stats, so logits are unaffected)."""
    lcfg = cfg.loss
    dfm = lcfg.use_perceptual and lcfg.perceptual_source == "d_features"

    def step(state: GANTrainState, hr_uint8: jnp.ndarray):
        rng, lr, hr = _prep(state, hr_uint8, cfg)

        # G forward once, with its pullback kept for the chained grad
        sr, g_vjp = jax.vjp(
            lambda p: g.apply({"params": p}, lr), state.g_params)
        sr_detached = jax.lax.stop_gradient(sr)

        # ---- discriminator update first (same params/stats the
        # reference's D step reads); its differentiated D(hr) forward
        # also yields the values the G loss needs (pr, and feature maps
        # for d_features perceptual)
        def d_loss_fn(d_params):
            dv = {"params": d_params, "batch_stats": state.d_stats}
            (pr, fr), st1 = d.apply(dv, hr, train=True,
                                    mutable=["batch_stats"],
                                    return_features=True)
            dv2 = {"params": d_params,
                   "batch_stats": st1["batch_stats"]}
            pf_bar, st2 = d.apply(dv2, sr_detached, train=True,
                                  mutable=["batch_stats"])
            return (ragan_discriminator_loss(pr, pf_bar),
                    (st2["batch_stats"], pr, fr))

        (d_loss, (d_stats, pr, fr)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        pr = jax.lax.stop_gradient(pr)
        fr = jax.lax.stop_gradient(fr)
        d_updates, d_opt = opt_d.update(d_grads, state.d_opt,
                                        state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator losses as a function of sr alone
        def g_loss_from_sr(sr_in):
            pix = l1_loss(sr_in, hr)
            (pf, ff), _ = d.apply(
                {"params": state.d_params, "batch_stats": state.d_stats},
                sr_in, train=True, mutable=["batch_stats"],
                return_features=True)
            g_adv_fn = (ragan_generator_loss_two_sided
                        if lcfg.ragan_g_two_sided else ragan_generator_loss)
            adv = g_adv_fn(pr, pf)
            parts = {"loss_pixel": pix, "loss_adv": adv}
            total = lcfg.lambda_adv * adv + lcfg.lambda_pixel * pix
            if vgg is not None:
                perc = perceptual_loss(
                    lambda p, x: vgg.apply(p, x), state.vgg_params,
                    sr_in, hr)
                parts["loss_percep"] = perc
                total = total + lcfg.lambda_percep * perc
            elif dfm:
                perc = feature_matching_loss(ff, fr)
                parts["loss_percep"] = perc
                total = total + lcfg.lambda_percep * perc
            parts["loss_g"] = total
            return total, parts

        (_, g_parts), dsr = jax.value_and_grad(
            g_loss_from_sr, has_aux=True)(sr)
        (g_grads,) = g_vjp(dsr)
        g_updates, g_opt = opt_g.update(g_grads, state.g_opt,
                                        state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = dict(g_parts)
        metrics.update({
            "loss_d": d_loss,
            "psnr": _psnr01(cfg, sr_detached, hr),
            "grad_norm_g": optax.global_norm(g_grads),
            "grad_norm_d": optax.global_norm(d_grads),
        })
        new_state = state.replace(
            step=state.step + 1, rng=rng,
            g_params=g_params, g_opt=g_opt,
            g_ema=ema_update(cfg, state.g_ema, g_params),
            d_params=d_params, d_stats=d_stats, d_opt=d_opt)
        return new_state, metrics

    return step


def make_infer_fn(cfg: TrainConfig, jit: bool = True):
    """Jitted normalized-LR → normalized-SR forward (SURVEY.md §3.2)."""
    g, _, _ = build_models(cfg)

    def infer(g_params, lr):
        return g.apply({"params": g_params}, lr)

    return jax.jit(infer) if jit else infer


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_batch(cfg: TrainConfig, g_params, hr_uint8) -> Metrics:
    """Deterministic eval: no augmentation; PSNR in normalized space is
    computed on denormalized [0,1] images (SURVEY.md §3.3)."""
    from super_resolution_tpu.data.augment import denormalize

    g, _, _ = build_models(cfg)
    batch = preprocess_batch(jax.random.key(0), hr_uint8, cfg.data,
                             augment=False)
    sr = g.apply({"params": g_params}, batch["lr"])
    mean, std = cfg.data.normalize_mean, cfg.data.normalize_std
    sr01 = jnp.clip(denormalize(sr, mean, std), 0.0, 1.0)
    hr01 = denormalize(batch["hr"], mean, std)
    return {"psnr": psnr(sr01, hr01)}
