"""Typed configuration tree for the framework.

The reference exposes per-script ``argparse`` flags (SURVEY.md §1 L8:
``--n_epochs --dataset_name --batch_size --lr --b1 --b2 --hr_height
--hr_width --channels --residual_blocks --warmup_batches --lambda_adv
--lambda_pixel --sample_interval --checkpoint_interval``).  Here the same
surface lives in one dataclass tree; the five BASELINE.json configs
(BASELINE.json:6-12) are named presets in :data:`PRESETS`.

Everything is hashable/frozen so configs can be closed over by ``jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# ImageNet statistics used by the reference family for input normalization
# (SURVEY.md §2.1 "Dataset / patch loader").
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)


def resolve_conv_impl(impl: str) -> str:
    """Resolve ``conv_impl="auto"`` to the fastest measured path for the
    process's default backend: ``"pallas_cf"`` on TPU, ``"lax"``
    elsewhere (the Mosaic kernels need interpret mode off-TPU).  Named
    impls pass through unchanged.  Called at model-build/trace time
    (RRDBNet/DenseBlock ``__call__``, train/steps._training_cfg) — the
    backend is process-global, so the resolution is stable under jit."""
    if impl != "auto":
        return impl
    import jax

    return "pallas_cf" if jax.default_backend() == "tpu" else "lax"


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """RRDBNet generator hyper-parameters (SURVEY.md §2.1 "RRDB generator").

    The canonical 23-block ×4 generator has exactly 16,697,987 parameters
    (verified analytically, SURVEY.md §2.1 [V]) with ``growth=32`` and the
    nearest+conv upsampler.  ``upsampler`` is an enum because the reference
    family ships both variants (SURVEY.md §3.5 "Upsample-variant
    ambiguity"): ``"nearest_conv"`` (xinntao branch) and ``"pixelshuffle"``
    (eriklindernoren branch); checkpoint import resolves which one by key
    shapes.
    """

    channels: int = 3            # --channels
    filters: int = 64            # base feature width (nf)
    growth: int = 32             # dense-block growth channels (gc)
    n_blocks: int = 23           # --residual_blocks
    n_dense: int = 3             # dense blocks per RRDB
    n_dense_convs: int = 5       # convs per dense block
    scale: int = 4               # upscale factor (2 pixel-shuffle/interp stages)
    res_scale: float = 0.2       # residual scaling beta (ESRGAN paper §3.1)
    lrelu_slope: float = 0.2
    upsampler: str = "nearest_conv"   # "nearest_conv" | "pixelshuffle"
    init: str = "msra_scaled"         # "msra_scaled" (x0.1) | "torch_default"
    # Conv implementation (BENCHNOTES.md has every measurement):
    # "auto"           resolve by backend at model-build time — the
    #                  default: "pallas_cf" on TPU (the fastest measured
    #                  path for inference AND training), "lax" anywhere
    #                  else (CPU tests/dev; Pallas needs interpret mode
    #                  there).  Resolution happens in RRDBNet/DenseBlock
    #                  __call__ and train/steps._training_cfg via
    #                  :func:`resolve_conv_impl`.
    # "lax"            XLA's conv emitter — always-correct
    # "pallas_cf"      channels-first fused dense-block kernel v5 —
    #                  fastest measured TPU inference (2.6× lax per
    #                  block, ~40 MP/s/chip end-to-end); differentiable
    #                  (custom Mosaic VJP), used for training when the
    #                  LR patch width is a multiple of 128 OR the
    #                  batch-to-lane fold applies (e.g. the canonical
    #                  192² patch: W=48 folds 8 images per lane row —
    #                  13.1 vs 11.8 it/s over lax, BENCHNOTES round 3)
    # "pallas_cf_tail" pallas_cf + the single-conv kernel on the
    #                  upsample tail (measured slower than XLA there;
    #                  kept as an experiment)
    # "pallas"/"pallas_fused"  earlier NHWC kernel experiments (slower
    #                  than lax on this chip; no VJP)
    conv_impl: str = "auto"
    # Tail upsample implementation for the nearest_conv upsampler:
    # "polyphase" computes nearest-×2 + 3×3 conv as four 2×2 convs on
    # the SMALL plane (2.25× fewer MACs, no upsampled-plane input read —
    # ops/upsample_conv.py; a fusion XLA cannot see across the
    # repeat→conv boundary).  Bit-equivalent up to fp rounding
    # (tests/test_ops.py).  Measured verdict (BENCHNOTES round 3): the
    # phase-interleave transpose on the upsampled planes repays the MAC
    # saving on this chip — inference 41.6 vs 40.9 MP/s, GAN step 13.72
    # vs 13.66 it/s, both favoring naive — so the literal repeat→conv
    # form stays the default and polyphase ships as a measured option.
    tail_up: str = "naive"            # "naive" | "polyphase"

    @property
    def n_upsample(self) -> int:
        s, n = self.scale, 0
        while s > 1:
            assert s % 2 == 0, "scale must be a power of two"
            s //= 2
            n += 1
        return n


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """VGG-style patch discriminator (SURVEY.md §2.1 "VGG-style
    discriminator"): conv pairs at widths (64,128,256,512), stride 1 then
    stride 2, BatchNorm except on the very first conv, LeakyReLU 0.2, and a
    1-channel conv head producing an (H/16, W/16) logit map.  ≈4,693,697
    params at default width [V]."""

    channels: int = 3
    base_filters: int = 64
    n_scales: int = 4            # number of width-doubling stages
    lrelu_slope: float = 0.2
    bn_momentum: float = 0.9     # flax momentum == 1 - torch momentum (0.1)
    bn_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class VGGConfig:
    """Frozen VGG-19 trunk truncated at conv5_4 *pre-activation*
    (ESRGAN paper §3.3; torchvision ``vgg19.features[:35]`` in the family,
    SURVEY.md §2.1).  Weights come from a one-time torch→npz conversion
    (``tools/convert_vgg.py``); ``weights_path=None`` means random init
    (tests / weights-unavailable mode — SURVEY.md §2.2 external-asset
    note)."""

    weights_path: Optional[str] = None
    # Conv widths of VGG-19 cfg E, with 'M' marking 2x2 maxpools. Truncated
    # after conv5_4 (no ReLU, no final pool).
    arch: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                   512, 512, 512, 512, "M", 512, 512, 512, 512)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """ESRGAN loss weights (ESRGAN paper §3.3; SURVEY.md §2.1 "Loss
    suite"): total G loss = perceptual + lambda_adv·RaGAN + lambda_pixel·L1."""

    lambda_adv: float = 5e-3     # --lambda_adv
    lambda_pixel: float = 1e-2   # --lambda_pixel
    use_perceptual: bool = True
    # Perceptual feature space: "vgg" (ImageNet VGG-19 conv5_4, the paper
    # recipe — needs converted weights) or "d_features" (discriminator
    # feature matching, the VGG-free substitute; SURVEY.md §2.2
    # external-asset note "or the loss re-specced").
    perceptual_source: str = "vgg"
    lambda_percep: float = 1.0   # weight of the perceptual term
    # G-side RaGAN recipe: False = single fake-vs-E[real] direction
    # (eriklindernoren branch, SURVEY.md §3.1); True = both directions
    # averaged (xinntao/paper branch, ESRGAN paper §3.2).
    ragan_g_two_sided: bool = False
    # NOTE on data parallelism: the RaGAN E[D(.)] batch means are always
    # mesh-global here — the train step runs under jit with batch-sharded
    # inputs, so plain jnp.mean is global-batch by construction
    # (SURVEY.md §7 "GAN step as one jit"; losses.py's axis_name argument
    # exists for shard_map-style callers).


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Adam settings of the reference family (SURVEY.md §2.1 "GAN train
    loop": lr 1e-4–2e-4, betas (0.9, 0.999)).  ``lr_halve_steps`` is the
    xinntao branch's MultiStepLR schedule (lr ×0.5 at the listed steps);
    empty tuple = constant lr (the eriklindernoren branch)."""

    lr: float = 2e-4             # --lr
    b1: float = 0.9              # --b1
    b2: float = 0.999            # --b2
    eps: float = 1e-8
    lr_halve_steps: Tuple[int, ...] = ()


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Patch pipeline settings (SURVEY.md §2.1 "Dataset / patch loader"):
    DIV2K-style 48×48 LR → 192×192 HR patches, bicubic ÷4 synthesis,
    ImageNet normalization, flip/rotate augmentation."""

    dataset_dir: str = "data/train"
    # Paired mode (SURVEY.md §2.1 "Reads image pairs or crops HR patches
    # and synthesizes LR"): when set, LR frames are read from this dir
    # (matched to dataset_dir files by stem) instead of being bicubic-
    # synthesized — real detector data with pre-existing LR frames.
    lr_dir: Optional[str] = None
    hr_patch: int = 192          # --hr_height
    # --hr_width: non-square patches (None -> square hr_patch x hr_patch).
    # Rotation augmentation auto-disables for non-square (augment.py).
    hr_patch_w: Optional[int] = None
    scale: int = 4
    batch_size: int = 16         # --batch_size
    augment: bool = True
    n_workers: int = 4           # --n_cpu (host-side decode threads)
    normalize_mean: Tuple[float, float, float] = IMAGENET_MEAN
    normalize_std: Tuple[float, float, float] = IMAGENET_STD
    prefetch: int = 2            # double-buffered host->HBM prefetch depth

    @property
    def lr_patch(self) -> int:
        return self.hr_patch // self.scale

    @property
    def patch_hw(self) -> Tuple[int, int]:
        """(H, W) of the HR training patch."""
        return (self.hr_patch, self.hr_patch_w or self.hr_patch)

    @property
    def lr_patch_hw(self) -> Tuple[int, int]:
        h, w = self.patch_hw
        return (h // self.scale, w // self.scale)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Top-level training config — the union of the reference's train CLI
    flags (SURVEY.md §1 L8) plus the TPU-native additions (mesh shape,
    compute dtype)."""

    generator: GeneratorConfig = GeneratorConfig()
    discriminator: DiscriminatorConfig = DiscriminatorConfig()
    vgg: VGGConfig = VGGConfig()
    loss: LossConfig = LossConfig()
    optim_g: OptimConfig = OptimConfig()
    optim_d: OptimConfig = OptimConfig()
    data: DataConfig = DataConfig()

    n_epochs: int = 200          # --n_epochs
    steps_per_epoch: int = 1000
    warmup_batches: int = 500    # --warmup_batches (L1-only pretrain)
    sample_interval: int = 100   # --sample_interval
    checkpoint_interval: int = 1000  # --checkpoint_interval
    checkpoint_dir: str = "checkpoints"
    seed: int = 0

    # Reference-faithful BatchNorm bookkeeping: the reference family's D
    # runs in train mode during the G step too, so its running stats
    # update on ALL FOUR forwards per iteration (hr, sr, hr, sr_detached,
    # in that order).  Default False updates only on the D-step forwards
    # — eval-only impact, and the two G-step D forwards stay
    # order-independent (parallelizable).  Set True for training-parity
    # runs against reference training curves.
    bn_track_g_step: bool = False

    # Deduplicated GAN step (train/steps._dedup_gan_step): compute the
    # D(hr) forward ONCE per iteration — its value (and feature maps)
    # feed the G loss, its gradient feeds the D update — instead of the
    # reference's 4 discriminator forwards.  Mathematically identical
    # updates (tested); ignored when bn_track_g_step is set (that flag
    # exists to replay the reference's 4-forward BN order).  Default
    # False pending an on-chip win measurement (XLA may already CSE the
    # duplicate forward — BENCHNOTES).
    dedup_d_hr: bool = False

    # Generator EMA (the BasicSR family release convention the importer
    # already honors on the read side — import_torch.load_pth prefers
    # 'params_ema'): an exponential moving average of G's params is
    # maintained in the train state and preferred for eval/sample grids
    # and .pth export.  0.0 disables (no EMA tree in the state).
    ema_decay: float = 0.999
    # Use the EMA weights for in-loop eval + sample grids (the family's
    # release/eval convention); raw params remain what trains.
    eval_use_ema: bool = True

    # TPU-native knobs (no reference equivalent; SURVEY.md §2.3).
    compute_dtype: str = "bfloat16"   # conv compute dtype; params stay fp32
    data_parallel: int = 1            # mesh size along the batch axis
    donate_buffers: bool = True


def ema_maturity_steps(decay: float) -> int:
    """Steps before the EMA tree is a release-grade artifact: 5 time
    constants of the e ← d·e + (1−d)·p recurrence, i.e. 5/(1−d) (5000
    at the default decay 0.999).

    Below this the EMA is still dominated by early-training weights —
    the round-4 on-chip demo measured final EMA at 24.85 vs raw params'
    26.15 dB PSNR-RGB after ~3000 total steps (docs/demo_round4), and
    the round-5 10k-step demo measured the 3τ point DIRECTLY: a
    from-scratch EMA at exactly 3000 steps still evaluated 1.4 dB
    below raw params (23.55 vs ~25.0 — e⁻³ ≈ 5% residual random-init
    weight is not negligible through a 350-conv network), while the
    10τ warm-started GAN EMA beat raw by +0.83 dB (docs/demo_round5).
    5τ (<1% residual) is the measured-safe horizon; eval/export must
    not prefer the EMA before it (round-4 VERDICT weak #6)."""
    import math

    return int(math.ceil(5.0 / max(1e-9, 1.0 - decay)))


def preset(name: str) -> TrainConfig:
    """Named presets mirroring the five BASELINE.json configs
    (BASELINE.json:6-12)."""
    presets = {
        # 1. Single-image ×4 RRDB (23-block) inference on one 128×128 crop,
        #    CPU-runnable.
        "infer_single": TrainConfig(compute_dtype="float32"),
        # 2. PSNR-only RRDBNet pretraining (L1) on 48→192 patches.
        "pretrain_psnr": TrainConfig(
            loss=LossConfig(lambda_adv=0.0, use_perceptual=False),
            warmup_batches=10**9,
            optim_g=OptimConfig(lr=2e-4),
        ),
        # 3. Full ESRGAN GAN training.
        "train_gan": TrainConfig(),
        # 3b. GAN training with the VGG-free D-feature-matching
        #     perceptual loss.  The ESRGAN paper's weight balance assumes
        #     a FIXED VGG feature space; the live-D substitute is
        #     nonstationary, and the measured recipe (BENCHNOTES.md
        #     round-2 GAN demonstration) anchors harder and slows D:
        #     +0.62 dB AND 2.4x edge energy over the PSNR model, where
        #     the paper weights lose 2.1 dB.
        "train_gan_dfm": TrainConfig(
            loss=LossConfig(perceptual_source="d_features",
                            lambda_percep=1.0, lambda_pixel=0.1),
            optim_d=OptimConfig(lr=3e-5),
        ),
        # 4. Tiled large-frame inference (2K detector images).
        "infer_tiled": TrainConfig(compute_dtype="bfloat16"),
        # 5. Multi-chip data-parallel GAN training over v5e-8.
        "train_gan_dp8": TrainConfig(data_parallel=8),
    }
    if name not in presets:
        raise KeyError(f"unknown preset {name!r}; have {sorted(presets)}")
    return presets[name]


PRESETS = ("infer_single", "pretrain_psnr", "train_gan",
           "train_gan_dfm", "infer_tiled", "train_gan_dp8")
