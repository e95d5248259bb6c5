"""Dataset evaluation: PSNR/SSIM tables over a validation directory
(SURVEY.md §3.3, §5.5: report RGB and Y-channel both).

Each HR image is bicubic-downsampled ÷scale (the same LR synthesis the
reference evaluates with), super-resolved through the overlap-blend tiler
(fixed tile shape → one compile for the whole directory, any frame size),
and scored against the ground truth.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.config import TrainConfig
from super_resolution_tpu.data import denormalize, list_images, normalize
from super_resolution_tpu.metrics import eval_metrics
from super_resolution_tpu.ops import bicubic_downsample
from super_resolution_tpu.parallel import tiled_upscale
from super_resolution_tpu.train.steps import make_infer_fn


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def evaluate_directory(
        cfg: TrainConfig, g_params, val_dir: str,
        tile: int = 128, halo: int = 8, tile_batch: int = 4,
        mesh=None, max_images: Optional[int] = None,
        files: Optional[Iterable[str]] = None,
        infer_fn=None, use_self_ensemble: bool = False,
        lr_dir: Optional[str] = None,
        tile_w: Optional[int] = None,
        bucket_h: Optional[int] = None) -> Dict[str, float]:
    """Evaluate G over every image in ``val_dir``; returns mean metrics.

    With ``lr_dir``, each HR image's LR input comes from the paired file
    (matched by stem — SURVEY.md §2.1 paired mode) instead of being
    bicubic-synthesized.

    Pass the already-jitted ``infer_fn`` when calling repeatedly (the
    in-loop eval does) — building a fresh jit closure per call would
    recompile the generator every time."""
    from super_resolution_tpu.config import resolve_conv_impl

    scale = cfg.data.scale
    mean, std = cfg.data.normalize_mean, cfg.data.normalize_std
    # clamp effective tiles to kernel-aligned sizes on the fused path so
    # misaligned val-frame sizes keep the fast kernels engaged (the CLI
    # applies the same rule — cli._tile_align)
    align = ((8, 128) if resolve_conv_impl(cfg.generator.conv_impl)
             in ("pallas_cf", "pallas_cf_tail") else None)
    infer = infer_fn if infer_fn is not None else make_infer_fn(cfg)
    if mesh is not None:
        from super_resolution_tpu.parallel import replicated

        g_params = jax.device_put(g_params, replicated(mesh))
    fn = lambda x: infer(g_params, x)   # noqa: E731

    lr_for = None
    if lr_dir is not None:
        from super_resolution_tpu.data.pipeline import pair_images

        lr_for = dict(pair_images(val_dir, lr_dir))

    paths: List[str] = list(files) if files is not None \
        else list_images(val_dir)
    if max_images:
        paths = paths[:max_images]

    per_image = []
    for path in paths:
        hr01 = _load_image(path)
        if lr_for is not None:
            lr01 = jnp.asarray(_load_image(lr_for[path]))
            h, w = lr01.shape[0] * scale, lr01.shape[1] * scale
            if hr01.shape[0] < h or hr01.shape[1] < w:
                raise ValueError(
                    f"paired eval: HR {hr01.shape[:2]} smaller than "
                    f"LR×{scale} {(h, w)} for {path}")
            hr01 = hr01[:h, :w]
        else:
            h, w = (hr01.shape[0] // scale) * scale, \
                   (hr01.shape[1] // scale) * scale
            hr01 = hr01[:h, :w]
            lr01 = bicubic_downsample(jnp.asarray(hr01), scale)
        lrn = normalize(lr01, mean, std)
        upscale = lambda img: tiled_upscale(          # noqa: E731
            fn, img, scale=scale, tile=tile, halo=halo,
            tile_batch=tile_batch, mesh=mesh, tile_w=tile_w,
            align=align, bucket_h=bucket_h)
        if use_self_ensemble:
            from super_resolution_tpu.ops import self_ensemble

            srn = self_ensemble(upscale, lrn)
        else:
            srn = upscale(lrn)
        sr01 = jnp.clip(denormalize(srn, mean, std), 0.0, 1.0)
        m = eval_metrics(sr01, jnp.asarray(hr01))
        per_image.append({k: float(v) for k, v in m.items()})

    agg = {k: float(np.mean([m[k] for m in per_image]))
           for k in per_image[0]} if per_image else {}
    agg["n_images"] = len(per_image)
    return agg
