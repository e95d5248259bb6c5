"""VGG-19 perceptual feature extractor — Flax, NHWC, frozen.

SURVEY.md §2.1 "VGG-19 feature extractor": the ImageNet VGG-19 conv trunk
truncated at conv5_4 *pre-activation* (torchvision ``vgg19.features[:35]``
in the family; ESRGAN paper §3.3 argues for pre-activation features).
20.02 M params in the truncated trunk [V].  Used only inside the
perceptual loss, always frozen (``jax.lax.stop_gradient`` on params is not
needed — the params simply aren't part of any optimizer state; the loss
does stop-gradient the *target* features, SURVEY.md §3.1).

Weights: torchvision is not installed and there is no network (SURVEY.md
§2.2 external-asset note), so weights arrive via
``tools/convert_vgg.py`` (torch ``.pth`` → ``.npz``) and
:func:`load_vgg_params`.  Without a weights file the module runs with the
init scheme below (random-feature perceptual loss — still a valid
distance, and exercised by tests against the torch-side spec with
identical random weights).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from super_resolution_tpu.config import VGGConfig
from super_resolution_tpu.models.initializers import conv_inits
from super_resolution_tpu.models.rrdb import precision_for


class VGGFeatures(nn.Module):
    """Truncated VGG-19 trunk: conv1_1 .. conv5_4 (pre-activation)."""

    cfg: VGGConfig = VGGConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        n_conv = 0
        n_items = len(self.cfg.arch)
        for idx, item in enumerate(self.cfg.arch):
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            kshape = (3, 3, x.shape[-1], item)
            kinit, binit = conv_inits("torch_default", kshape)
            x = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_init=kinit, bias_init=binit, dtype=self.dtype,
                        precision=precision_for(self.dtype),
                        param_dtype=jnp.float32, name=f"conv{n_conv}")(x)
            n_conv += 1
            if idx != n_items - 1:       # final conv5_4 stays pre-activation
                x = nn.relu(x)
        return x.astype(jnp.float32)


def load_vgg_params(npz_path: str) -> dict:
    """Load converted VGG-19 weights (see tools/convert_vgg.py).

    The npz holds ``conv{i}_kernel`` (HWIO, already transposed from torch
    OIHW) and ``conv{i}_bias`` for i in conv order 0..15.
    """
    raw = np.load(npz_path)
    params = {}
    i = 0
    while f"conv{i}_kernel" in raw:
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(raw[f"conv{i}_kernel"]),
            "bias": jnp.asarray(raw[f"conv{i}_bias"]),
        }
        i += 1
    if i == 0:
        raise ValueError(f"no conv weights found in {npz_path}")
    return {"params": params}
