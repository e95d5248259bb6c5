"""VGG-style patch discriminator — Flax, NHWC.

SURVEY.md §2.1 "VGG-style discriminator": conv widths
64,64,128,128,256,256,512,512 alternating stride 1/2, BatchNorm on every
conv except the first, LeakyReLU 0.2, and a 1-channel 3×3 conv head that
produces an (H/16, W/16) logit map.  ≈4,693,697 parameters at default
width (SURVEY.md §2.1 [V]).

Stride-2 convs use explicit ((1,1),(1,1)) padding — XLA's 'SAME' pads
asymmetrically for stride 2, which would silently break checkpoint parity
with torch's pad=1.

BatchNorm statistics: under data parallelism the batch stats are computed
per-shard by default; `axis_name` threads a mesh axis through so stats can
be psum-synchronized (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from super_resolution_tpu.config import DiscriminatorConfig
from super_resolution_tpu.models.initializers import conv_inits
from super_resolution_tpu.models.rrdb import precision_for


class Discriminator(nn.Module):
    cfg: DiscriminatorConfig = DiscriminatorConfig()
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None   # mesh axis for cross-device BN stats

    @nn.compact
    def __call__(self, x, train: bool = True,
                 return_features: bool = False):
        """``return_features=True`` additionally returns the per-scale
        post-activation feature maps — the basis of the
        discriminator-feature-matching perceptual loss
        (losses.feature_matching_loss), the VGG-free perceptual option
        when ImageNet weights are unavailable (SURVEY.md §2.2
        external-asset note: "or the loss re-specced")."""
        cfg = self.cfg
        x = x.astype(self.dtype)
        features = []

        def conv(h, feats, stride, name):
            kshape = (3, 3, h.shape[-1], feats)
            kinit, binit = conv_inits("torch_default", kshape)
            return nn.Conv(
                feats, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), kernel_init=kinit, bias_init=binit,
                precision=precision_for(self.dtype),
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )(h)

        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=cfg.bn_momentum,
                epsilon=cfg.bn_eps, dtype=self.dtype,
                param_dtype=jnp.float32, axis_name=self.axis_name, name=name,
            )(h)

        h = x
        for i in range(cfg.n_scales):
            feats = cfg.base_filters * (2 ** i)
            h = conv(h, feats, 1, f"conv{i}_0")
            if i != 0:
                h = bn(h, f"bn{i}_0")
            h = nn.leaky_relu(h, cfg.lrelu_slope)
            h = conv(h, feats, 2, f"conv{i}_1")
            h = bn(h, f"bn{i}_1")
            h = nn.leaky_relu(h, cfg.lrelu_slope)
            features.append(h.astype(jnp.float32))

        logits = conv(h, 1, 1, "head")
        logits = logits.astype(jnp.float32)   # (B, H/16, W/16, 1)
        if return_features:
            return logits, features
        return logits
