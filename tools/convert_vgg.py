#!/usr/bin/env python
"""One-time torchvision VGG-19 → npz weight conversion.

torchvision is not installed and there is no network in this environment
(SURVEY.md §2.2 external-asset note), so this tool converts an
out-of-band-supplied ``vgg19-*.pth`` (the torchvision ImageNet state dict,
or any dict holding ``features.{idx}.weight/bias``) into the npz layout
that :func:`super_resolution_tpu.models.vgg.load_vgg_params` reads:
``conv{i}_kernel`` (HWIO) / ``conv{i}_bias`` for the 16 convs through
conv5_4.

Usage:  python tools/convert_vgg.py vgg19.pth vgg19_features.npz
"""

import sys

import numpy as np
import torch

VGG_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def convert(src: str, dst: str) -> None:
    sd = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for n, idx in enumerate(VGG_CONV_IDX):
        for prefix in (f"features.{idx}", str(idx)):
            if f"{prefix}.weight" in sd:
                w = sd[f"{prefix}.weight"].numpy()
                b = sd[f"{prefix}.bias"].numpy()
                break
        else:
            raise KeyError(f"conv at features index {idx} not found in {src}")
        out[f"conv{n}_kernel"] = w.transpose(2, 3, 1, 0)  # OIHW→HWIO
        out[f"conv{n}_bias"] = b
    np.savez(dst, **out)
    print(f"wrote {dst}: {len(out) // 2} convs, "
          f"{sum(v.size for v in out.values()):,} params")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    convert(sys.argv[1], sys.argv[2])
