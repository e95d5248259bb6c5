"""Weight initializers matching the reference family's PyTorch schemes.

The family uses two init schemes (SURVEY.md §3.5 "init / model
construction"):

- ``torch_default``: PyTorch ``nn.Conv2d`` defaults — Kaiming-uniform with
  ``a=sqrt(5)``, which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
  both kernel and bias, fan_in = in_ch * kh * kw.
- ``msra_scaled``: the xinntao branch's stability init — Kaiming-normal
  (fan_in, ReLU gain) scaled by 0.1, zero bias.

Init parity matters for *training* parity, so both are explicit here
rather than relying on Flax's lecun_normal default.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_hwio(shape) -> int:
    # Flax conv kernels are HWIO: (kh, kw, in_ch, out_ch).
    if len(shape) == 4:
        return shape[0] * shape[1] * shape[2]
    if len(shape) == 2:  # dense (in, out)
        return shape[0]
    raise ValueError(f"unsupported kernel shape {shape}")


def torch_default_kernel(key, shape, dtype=jnp.float32):
    """U(-b, b), b = 1/sqrt(fan_in) — torch Conv2d kernel default."""
    bound = 1.0 / math.sqrt(_fan_in_hwio(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_default_bias(kernel_shape):
    """Torch biases use the *kernel's* fan_in; flax passes the bias shape,
    so the bound is closed over from the kernel shape."""
    bound = 1.0 / math.sqrt(_fan_in_hwio(kernel_shape))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def msra_scaled_kernel(scale: float = 0.1):
    """Kaiming-normal (fan_in, gain=sqrt(2)) × scale — xinntao init."""

    def init(key, shape, dtype=jnp.float32):
        std = math.sqrt(2.0 / _fan_in_hwio(shape))
        return scale * std * jax.random.normal(key, shape, dtype)

    return init


def conv_inits(scheme: str, kernel_shape):
    """Return (kernel_init, bias_init) for the named scheme."""
    if scheme == "torch_default":
        return torch_default_kernel, make_torch_default_bias(kernel_shape)
    if scheme == "msra_scaled":
        return msra_scaled_kernel(0.1), jax.nn.initializers.zeros
    raise ValueError(f"unknown init scheme {scheme!r}")
