"""VGG-19 weight conversion pipeline (SURVEY.md §2.2 external-asset
path): torchvision-layout .pth → tools/convert_vgg.py → npz →
load_vgg_params → Flax forward parity with the torch-side spec."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from super_resolution_tpu.models import VGGFeatures, load_vgg_params

from torch_spec import VGGFeaturesTorch


def test_convert_vgg_roundtrip(tmp_path):
    torch.manual_seed(0)
    tm = VGGFeaturesTorch().eval()
    # a torchvision-layout state dict: keys features.{idx}.weight/bias
    pth = str(tmp_path / "vgg19.pth")
    torch.save(tm.state_dict(), pth)

    import sys

    sys.path.insert(0, "tools")
    from convert_vgg import convert

    npz = str(tmp_path / "vgg19.npz")
    convert(pth, npz)

    variables = load_vgg_params(npz)
    assert len(variables["params"]) == 16
    fm = VGGFeatures()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = tm(x).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(fm.apply(variables,
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.fast
def test_load_vgg_params_rejects_empty(tmp_path):
    import pytest

    npz = str(tmp_path / "empty.npz")
    np.savez(npz, foo=np.zeros(3))
    with pytest.raises(ValueError, match="no conv weights"):
        load_vgg_params(npz)
