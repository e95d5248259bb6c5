#!/usr/bin/env python
"""CPU interpret-mode correctness harness for the channels-first fused
dense-block kernels — run during kernel development without touching the
TPU (the env pins JAX_PLATFORMS=axon; forcing CPU needs the config
update below, not the env var).

Usage: python tools/kernel_dev_check.py [v3b|v4]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from super_resolution_tpu.compile_cache import (            # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()   # warm re-runs skip the TPU compile

import jax                                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np                                            # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.experimental.pallas import tpu as pltpu              # noqa: E402

from super_resolution_tpu.ops.pallas.dense_block_cf import (  # noqa: E402
    fused_dense_block_cf5,
)
from super_resolution_tpu.ops.pallas.experiments_dense_block import (  # noqa: E402
    fused_dense_block_cf2,
    fused_dense_block_cf3,
    fused_dense_block_cf6,
    fused_dense_block_cf8,
)


def lax_ref(x, ws, bs, slope=0.2, res=0.2):
    h = jnp.transpose(x, (0, 2, 3, 1))
    feats = h
    out = h
    for k, (w, b) in enumerate(zip(ws, bs)):
        out = jax.lax.conv_general_dilated(
            feats, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + b
        if k < len(ws) - 1:
            out = jnp.where(out >= 0, out, slope * out)
            feats = jnp.concatenate([feats, out], -1)
    y = h + res * out
    return jnp.transpose(y, (0, 3, 1, 2))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "v4"
    fn = {"v3b": fused_dense_block_cf2, "v4": fused_dense_block_cf3,
          "v5": fused_dense_block_cf5, "v6": fused_dense_block_cf6,
              "v8": fused_dense_block_cf8}[which]
    rng = np.random.RandomState(0)
    cases = [(1, 16, 32, 16, 8, 8), (2, 16, 24, 24, 8, 8),
             (1, 64, 64, 128, 32, 32), (1, 64, 32, 128, 32, 16),
             (1, 64, 96, 128, 32, 32)]
    for (B, C, H, W, G, rows) in cases:
        x = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
        ws, bs = [], []
        cin = C
        for k in range(5):
            co = C if k == 4 else G
            ws.append(jnp.asarray(
                rng.randn(3, 3, cin, co).astype(np.float32) * 0.1))
            bs.append(jnp.asarray(rng.randn(co).astype(np.float32) * 0.1))
            if k < 4:
                cin += co
        ref = lax_ref(x, ws, bs)
        with pltpu.force_tpu_interpret_mode():
            got = fn(x, ws, bs, rows=rows)
        err = float(jnp.abs(got - ref).max())
        print(f"{which} B{B} C{C} H{H}x{W} rows{rows}: max err {err:.2e}")
        assert err < 2e-4, err
    print(f"{which} interpret-exact on all cases")


if __name__ == "__main__":
    main()
