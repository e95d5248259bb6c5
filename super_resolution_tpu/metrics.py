"""Observability (SURVEY.md §5.1, §5.5): scalar metric aggregation, image
eval metrics (PSNR/SSIM, RGB and Y-channel), throughput meters, and
optional jax.profiler tracing — replacing the reference's stdout losses +
periodic image grids."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Image metrics
# --------------------------------------------------------------------------

def rgb_to_y(x: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma of [0,1] RGB — SR papers report Y-channel PSNR
    (SURVEY.md §2.1 "Eval": report both RGB and Y)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return (65.481 * r + 128.553 * g + 24.966 * b + 16.0) / 255.0


def psnr01(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def ssim(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """SSIM with the standard 11×11 Gaussian window (σ=1.5), computed as
    depthwise convolutions (skimage/Wang et al. constants)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    r = 5
    xs = np.arange(-r, r + 1, dtype=np.float64)
    win = np.exp(-(xs ** 2) / (2 * 1.5 ** 2))
    win = (win / win.sum()).astype(np.float32)
    w = jnp.asarray(np.outer(win, win))[..., None, None]   # HWIO, 1 ch

    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    c = pred.shape[-1]
    w = jnp.tile(w, (1, 1, 1, c))

    def filt(img):
        # HIGHEST precision is load-bearing: the E[x²] − μ² variance
        # cancellation below turns into garbage (SSIM > 1) under XLA's
        # default reduced-precision TPU convs
        return jax.lax.conv_general_dilated(
            img.astype(jnp.float32), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)

    mu_x, mu_y = filt(pred), filt(target)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = filt(pred * pred) - mu_x2
    sig_y = filt(target * target) - mu_y2
    sig_xy = filt(pred * target) - mu_xy
    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / \
        ((mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2))
    return jnp.mean(s)


# --------------------------------------------------------------------------
# Scalar aggregation / logging
# --------------------------------------------------------------------------

class MetricLogger:
    """Windowed scalar averaging + JSONL sink + stdout lines (the
    reference's tqdm/print surface) + tensorboard scalars/images
    (SURVEY.md §5.5) — event files land in ``<log_dir>/tb``."""

    def __init__(self, log_dir: Optional[str] = None,
                 stdout: bool = True):
        self._acc: Dict[str, list] = {}
        self._file = None
        self._tb = None
        # multi-host: non-primary processes keep accumulating (flush
        # still device_gets, keeping the host pace identical across
        # processes) but stay silent — stdout is a primary-only side
        # effect (parallel/multihost.py §3)
        self._stdout = stdout
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except ImportError:             # tensorboard is optional
                print("[metrics] tensorboardX unavailable — "
                      "JSONL/stdout only")

    def _tb_scalars(self, step: int, prefix: str,
                    vals: Dict[str, float]) -> None:
        if self._tb is None:
            return
        for k, v in vals.items():
            self._tb.add_scalar(f"{prefix}/{k}", v, step)

    def log_image(self, step: int, tag: str, image_hwc_uint8) -> None:
        """Tensorboard image (e.g. the periodic sample grid); no-op
        without a tensorboard writer."""
        if self._tb is None:
            return
        self._tb.add_image(tag, np.asarray(image_hwc_uint8), step,
                           dataformats="HWC")
        self._tb.flush()

    def update(self, metrics: Dict[str, jnp.ndarray]) -> None:
        for k, v in metrics.items():
            self._acc.setdefault(k, []).append(v)

    def flush(self, step: int, prefix: str = "train",
              extra: Optional[Dict[str, float]] = None) -> Dict[str, float]:
        out = {k: float(np.mean([np.asarray(jax.device_get(v))
                                 for v in vs]))
               for k, vs in self._acc.items()}
        self._acc.clear()
        if extra:
            out.update(extra)
        line = " ".join(f"{k}={v:.4g}" for k, v in sorted(out.items()))
        if self._stdout:
            print(f"[{prefix} step {step}] {line}", flush=True)
        if self._file:
            self._file.write(json.dumps({"step": step, "prefix": prefix,
                                         **out}) + "\n")
            self._file.flush()
        self._tb_scalars(step, prefix, out)
        return out

    def log_once(self, step: int, prefix: str,
                 metrics: Dict[str, float]) -> None:
        """Write a one-off metrics line (e.g. an eval result) immediately,
        without touching the windowed accumulator."""
        vals = {k: float(v) for k, v in metrics.items()
                if isinstance(v, (int, float))}
        line = " ".join(f"{k}={v:.4g}" for k, v in sorted(vals.items()))
        if self._stdout:
            print(f"[{prefix} step {step}] {line}", flush=True)
        if self._file:
            self._file.write(json.dumps({"step": step, "prefix": prefix,
                                         **vals}) + "\n")
            self._file.flush()
        self._tb_scalars(step, prefix, vals)

    def close(self):
        if self._file:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


class Throughput:
    """Megapixels/sec/chip meter — the north-star metric (BASELINE.json:2).
    Counts *output* (HR) pixels, the convention the ≥5× target uses."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.reset()

    def reset(self):
        self._pixels = 0
        self._t0 = time.perf_counter()

    def add(self, n_pixels: int):
        self._pixels += n_pixels

    def mp_per_sec_per_chip(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._pixels / 1e6 / dt / self.n_chips if dt > 0 else 0.0


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace wrapper (SURVEY.md §5.1); no-op when dir is
    None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def eval_metrics(sr01: jnp.ndarray, hr01: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Full eval table: RGB + Y-channel PSNR, SSIM (SURVEY.md §2.1 Eval)."""
    return {
        "psnr_rgb": psnr01(sr01, hr01),
        "psnr_y": psnr01(rgb_to_y(sr01), rgb_to_y(hr01)),
        "ssim": ssim(sr01, hr01),
    }
