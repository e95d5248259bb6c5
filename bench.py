#!/usr/bin/env python
"""Headline benchmark: ×4 RRDB (23-block) inference megapixels/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- Model: canonical 23-block/64-filter/growth-32 RRDBNet (16,697,987
  params), bf16 compute / fp32 params, NHWC.
- Workload: batched 128×128 LR tiles → 512×512 SR.  This is the
  round-1 contract shape, kept FIXED for round-over-round
  comparability (production tiled inference now defaults to
  tile=384 / tile_batch=2 after the round-3 geometry sweep —
  BENCHNOTES.md).  The scan body feeds the carry back into the input —
  without that data dependency XLA hoists the loop-invariant forward out
  of the scan and the "throughput" becomes one forward amortized over
  ITERS (a 10× phantom speedup; see BENCHNOTES.md "scan-hoisting trap").
- Timing: a lax.scan chain of ITERS dependent forwards inside ONE jit,
  synchronized by `jax.device_get` of a scalar.  This is deliberate: on
  the axon-tunneled chip `block_until_ready` does not actually block and
  every synchronized call pays a ~25 ms roundtrip floor, so naive timing
  loops are wildly wrong (see BENCHNOTES.md "Measurement gotchas").
- vs_baseline: ratio against the measured CPU torch reference
  (0.0409 MP/s — tests/torch_spec.py RRDBNetTorch on this host, see
  BASELINE.md).  BASELINE.json target: ≥ 5×.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# Measured CPU torch reference (BASELINE.md): 23-block RRDB, 64x64->256x256,
# single-core host, torch 2.13.0+cpu.
CPU_REFERENCE_MP_S = 0.0409

TILE = 128          # LR tile size (production tiled-inference shape)
BATCH = 8
ITERS = 10          # chained forwards per timed call
TUNNEL_FLOOR_S = 0.025


def main() -> int:
    from super_resolution_tpu.compile_cache import enable_compilation_cache
    from super_resolution_tpu.config import GeneratorConfig
    from super_resolution_tpu.models import RRDBNet

    # persistent XLA cache: a warm re-run loads the round's executable
    # from disk instead of repaying the ~20 min cold compile
    # (compile_cache.py; BENCHNOTES round 4 has the measured numbers)
    enable_compilation_cache()

    # The tunneled TPU backend can go fully UNAVAILABLE (jax.devices()
    # itself hangs — CLAUDE.md env gotchas); abort with a clear message
    # after a bounded wait instead of hanging the driver forever.
    import os
    import threading

    def _die():
        print("[bench] TPU backend did not initialize within 40 min — "
              "tunnel outage; aborting without a result", file=sys.stderr)
        os._exit(1)

    # 40 min: the observed wedge recovers in 10–25 min, so waiting
    # through one recovery window can save the round's headline number
    wd = threading.Timer(2400, _die)
    wd.daemon = True
    wd.start()
    dev = jax.devices()[0]
    wd.cancel()
    print(f"[bench] device: {dev}", file=sys.stderr)

    # the channels-first fused Pallas dense-block kernel (v5: dy-in-K /
    # dx-in-M) beats XLA's conv emitter ~2.5x end-to-end on this chip
    # (BENCHNOTES.md round 2: 40.2 vs 16.2 MP/s);
    # fall back to the lax path if the kernel cannot compile here
    cfg = GeneratorConfig(conv_impl="pallas_cf")
    model = RRDBNet(cfg, dtype=jnp.bfloat16)
    # init through the lax path — the param tree is implementation-
    # agnostic and init must not depend on the pallas path compiling
    # (explicit "lax", NOT the default "auto" which resolves back to
    # pallas_cf on TPU)
    params = jax.jit(RRDBNet(GeneratorConfig(conv_impl="lax"),
                             dtype=jnp.bfloat16).init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    x = jax.random.normal(jax.random.key(1), (BATCH, TILE, TILE, 3),
                          jnp.float32)

    def chained(params, x):
        def body(c, _):
            y = model.apply(params, x * (1.0 + c))
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, 0.0, None, length=ITERS)
        return c

    f = jax.jit(chained)
    t0 = time.perf_counter()
    try:
        jax.device_get(f(params, x))       # compile + warm
    except Exception as e:                 # pallas path unavailable here
        print(f"[bench] pallas_cf unavailable ({type(e).__name__}); "
              "falling back to lax", file=sys.stderr)
        cfg = GeneratorConfig(conv_impl="lax")
        model = RRDBNet(cfg, dtype=jnp.bfloat16)
        f = jax.jit(chained)
        jax.device_get(f(params, x))
    print(f"[bench] compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(params, x))
        best = min(best, time.perf_counter() - t0)
    per_batch = max(best - TUNNEL_FLOOR_S, 1e-9) / ITERS

    out_mp = BATCH * (TILE * cfg.scale) ** 2 / 1e6
    mp_s = out_mp / per_batch
    print(f"[bench] {per_batch * 1000:.1f} ms per {BATCH}x{TILE}² batch "
          f"(best of 3, {ITERS} chained iters)", file=sys.stderr)
    print(json.dumps({
        "metric": "rrdb23_x4_infer_throughput",
        "value": round(mp_s, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_s / CPU_REFERENCE_MP_S, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
