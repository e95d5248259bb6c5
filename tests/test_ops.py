"""Op-level tests: fused upsample-conv polyphase algebra."""

import pytest
import numpy as np


@pytest.mark.fast
def test_nearest_up_conv_matches_naive():
    """Polyphase nearest-up+conv == repeat→3×3 SAME conv exactly
    (boundary semantics included) — the tail-fusion algebra."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.ops.shuffle import nearest_upsample
    from super_resolution_tpu.ops.upsample_conv import nearest_up_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 9, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))

    up = nearest_upsample(x, 2)
    ref = jax.lax.conv_general_dilated(
        up, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    got = nearest_up_conv(x, k, b,
                          precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_nearest_up_conv_nchw_wrapper():
    import jax.numpy as jnp

    from super_resolution_tpu.ops.upsample_conv import (
        nearest_up_conv,
        nearest_up_conv_nchw,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 4, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 2).astype(np.float32))
    b = jnp.asarray(rng.randn(2).astype(np.float32))
    a = nearest_up_conv(x, k, b)
    c = nearest_up_conv_nchw(jnp.transpose(x, (0, 3, 1, 2)), k, b)
    np.testing.assert_allclose(np.asarray(jnp.transpose(c, (0, 2, 3, 1))),
                               np.asarray(a), atol=1e-6)
