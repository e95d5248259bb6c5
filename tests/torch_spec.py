"""Executable torch-side spec of the canonical reference architecture.

TESTS-ONLY, not product code (SURVEY.md §4.1): since the reference mount
is empty and its checkpoints are unavailable (SURVEY.md §0), this
PyTorch implementation of the canonical RRDB/Discriminator/VGG family is
the parity oracle — golden-tensor tests check that the Flax models
reproduce its arithmetic to fp32 tolerance, and the ``.pth`` importer is
round-trip tested against its state dicts.

Naming follows the BasicSR/xinntao "new-style" convention
(``conv_first, body.{i}.rdb{k}.conv{j}, conv_body, conv_up{1,2},
conv_hr, conv_last``) so the importer's primary mapping is exercised
end-to-end; the other family namings are covered by key-rewriting tests.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResidualDenseBlock(nn.Module):
    def __init__(self, nf=64, gc=32, slope=0.2):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, gc, 3, 1, 1)
        self.conv2 = nn.Conv2d(nf + gc, gc, 3, 1, 1)
        self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
        self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
        self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)
        self.lrelu = nn.LeakyReLU(slope, inplace=False)

    def forward(self, x):
        x1 = self.lrelu(self.conv1(x))
        x2 = self.lrelu(self.conv2(torch.cat((x, x1), 1)))
        x3 = self.lrelu(self.conv3(torch.cat((x, x1, x2), 1)))
        x4 = self.lrelu(self.conv4(torch.cat((x, x1, x2, x3), 1)))
        x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    def __init__(self, nf=64, gc=32, slope=0.2):
        super().__init__()
        self.rdb1 = ResidualDenseBlock(nf, gc, slope)
        self.rdb2 = ResidualDenseBlock(nf, gc, slope)
        self.rdb3 = ResidualDenseBlock(nf, gc, slope)

    def forward(self, x):
        out = self.rdb3(self.rdb2(self.rdb1(x)))
        return x + 0.2 * out


class RRDBNetTorch(nn.Module):
    """Canonical ×4 generator; ``upsampler`` covers both family variants."""

    def __init__(self, in_nc=3, out_nc=3, nf=64, nb=23, gc=32,
                 upsampler="nearest_conv", slope=0.2):
        """``slope=0.01`` models the eriklindernoren lineage, whose
        generator LeakyReLUs are all ``nn.LeakyReLU()`` (torch default
        negative_slope 0.01); the xinntao/BasicSR branch uses 0.2."""
        super().__init__()
        self.upsampler = upsampler
        self.conv_first = nn.Conv2d(in_nc, nf, 3, 1, 1)
        self.body = nn.Sequential(*[RRDB(nf, gc, slope) for _ in range(nb)])
        self.conv_body = nn.Conv2d(nf, nf, 3, 1, 1)
        up_out = nf * 4 if upsampler == "pixelshuffle" else nf
        self.conv_up1 = nn.Conv2d(nf, up_out, 3, 1, 1)
        self.conv_up2 = nn.Conv2d(nf, up_out, 3, 1, 1)
        self.conv_hr = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv_last = nn.Conv2d(nf, out_nc, 3, 1, 1)
        self.lrelu = nn.LeakyReLU(slope, inplace=False)

    def _up(self, x, conv):
        if self.upsampler == "nearest_conv":
            return self.lrelu(conv(F.interpolate(x, scale_factor=2,
                                                 mode="nearest")))
        return F.pixel_shuffle(self.lrelu(conv(x)), 2)

    def forward(self, x):
        fea = self.conv_first(x)
        fea = fea + self.conv_body(self.body(fea))
        fea = self._up(fea, self.conv_up1)
        fea = self._up(fea, self.conv_up2)
        return self.conv_last(self.lrelu(self.conv_hr(fea)))


class DiscriminatorTorch(nn.Module):
    """VGG-style patch critic (SURVEY.md §2.1): widths 64..512, stride 1/2
    pairs, BN except first conv, LeakyReLU 0.2, 1-ch conv head."""

    def __init__(self, in_nc=3, base=64, n_scales=4):
        super().__init__()
        layers = []
        in_f = in_nc
        for i in range(n_scales):
            out_f = base * (2 ** i)
            layers.append(nn.Conv2d(in_f, out_f, 3, 1, 1))
            if i != 0:
                layers.append(nn.BatchNorm2d(out_f))
            layers.append(nn.LeakyReLU(0.2, inplace=False))
            layers.append(nn.Conv2d(out_f, out_f, 3, 2, 1))
            layers.append(nn.BatchNorm2d(out_f))
            layers.append(nn.LeakyReLU(0.2, inplace=False))
            in_f = out_f
        layers.append(nn.Conv2d(in_f, 1, 3, 1, 1))
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


VGG19_ARCH = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512)


class VGGFeaturesTorch(nn.Module):
    """torchvision ``vgg19.features[:35]`` equivalent: trunk through
    conv5_4 pre-activation, with torchvision's ``features.{idx}`` key
    layout reproduced for importer tests."""

    def __init__(self):
        super().__init__()
        layers = []
        in_c = 3
        for item in VGG19_ARCH:
            if item == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_c, item, 3, 1, 1))
                layers.append(nn.ReLU(inplace=False))
                in_c = item
        # drop the trailing ReLU after conv5_4 → [:35]
        self.features = nn.Sequential(*layers[:-1])

    def forward(self, x):
        return self.features(x)
