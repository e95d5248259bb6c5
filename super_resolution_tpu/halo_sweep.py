"""Checkpoint-conditioned halo admissibility: sweep, release metadata,
and ``--halo auto`` resolution.

The tiling halo trades overlap-recompute waste for fidelity (stride =
tile − 2·halo): at the 128-wide column geometry halo=4 is +11.6% frame
rate over halo=8 (38.86 vs 34.81 MP/s/chip at 2048², BENCHNOTES round-4
halo campaign).  Whether a small halo is *admissible* is a property of
the deployed checkpoint's trained weights — the effective receptive
field of a trained RRDBNet is much longer than a random-init one's and
shorter than the ~350-conv theoretical one (tools/halo_parity.py
findings) — so the right place to decide it is RELEASE TIME, once per
checkpoint, not serve time.

This module gives that decision a home:

- :func:`sweep_admissible_halo` measures tiled-vs-whole-frame deviation
  on a structured synthetic probe for each candidate halo and picks the
  smallest one whose deviation PSNR clears a threshold (default 55 dB —
  a 55 dB perturbation moves a ~25 dB PSNR-vs-ground-truth number by
  ~0.005 dB, 20x inside the ≤0.1 dB parity budget the checkpoint-parity
  contract is written in, BASELINE.json).
- :func:`write_halo_meta` / :func:`read_halo_meta` stamp the result
  into a JSON sidecar next to the release artifact
  (``<release>.pth.meta.json``; ``<orbax_dir>/release_meta.json``).
- ``cli export --halo_sweep`` runs the sweep at export time;
  ``cli upscale/serve/eval --halo auto`` read the stamp and fall back
  to the conservative halo=8 when none exists.

The sweep runs wherever the process runs (the CLI forces the CPU
backend for export — fp32 lax isolates receptive-field truncation from
kernel/bf16 rounding, the same isolation argument as halo_parity.py).
On a single-core host a canonical 23-block sweep is slow (~0.04 MP/s);
production exports on multi-core hosts take minutes, and
``cli export --stamp_halo N`` records an on-chip ``tools/halo_parity.py``
measurement directly without re-running it.
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable, Optional, Sequence

import numpy as np


def structured_probe(frame: int, seed: int = 0) -> np.ndarray:
    """(frame, frame, 3) float32 probe in [0, 1]: gradients + sinusoidal
    texture + light noise.  Structured content, not white noise — tiling
    error concentrates at edges, and white noise has none of the
    statistics trained weights respond to (tools/halo_parity.py)."""
    rng = np.random.RandomState(seed)
    gy, gx = np.mgrid[0:frame, 0:frame].astype(np.float32)
    img = np.stack([gx, gy, (gx + gy) / 2], -1) / frame
    img += 0.25 * np.sin(gx[..., None] / 3.1) * np.cos(gy[..., None] / 4.7)
    return np.clip(img + rng.rand(frame, frame, 3) * 0.05,
                   0, 1).astype(np.float32)


def sweep_admissible_halo(
        infer_fn: Callable,
        scale: int = 4,
        frame: int = 192,
        tile_w: int = 64,
        halos: Sequence[int] = (2, 4, 6, 8),
        threshold_db: float = 55.0,
        denorm_std=None,
        seed: int = 0,
) -> dict:
    """Measure tiled-vs-whole deviation per halo and pick the minimal
    admissible one.

    ``infer_fn``: normalized (B, H, W, C) LR → (B, H·r, W·r, C) SR (a
    jitted generator apply with the CHECKPOINT weights — the sweep is
    meaningless on random init, whose effective RF is much shorter).
    The probe frame is column-tiled (``tile_w``-wide, full-height) so
    deviation comes from horizontal RF truncation alone — the same per-
    axis mechanism vertical truncation has, at the geometry the fast
    path deploys.  Returns a metadata dict; ``admissible_halo`` is None
    when no candidate clears ``threshold_db`` (callers fall back to the
    conservative default).
    """
    from super_resolution_tpu.config import DataConfig
    from super_resolution_tpu.data import normalize
    from super_resolution_tpu.parallel import tiled_upscale

    if frame <= tile_w:
        raise ValueError(f"probe frame ({frame}) must exceed tile_w "
                         f"({tile_w}) so the grid actually tiles")
    dc = DataConfig()
    std = np.asarray(dc.normalize_std if denorm_std is None else denorm_std,
                     np.float32)
    x = np.asarray(normalize(structured_probe(frame, seed),
                             dc.normalize_mean, dc.normalize_std))
    import jax.numpy as jnp

    x = jnp.asarray(x)
    whole = np.asarray(infer_fn(x[None])[0], np.float32)

    rows = []
    for halo in sorted(halos):
        tiled = np.asarray(
            tiled_upscale(infer_fn, x, scale=scale, tile=frame,
                          tile_w=tile_w, halo=halo, tile_batch=1),
            np.float32)
        err01 = np.abs(tiled - whole) * std     # de-normalized [0,1]
        psnr = float(-10.0 * np.log10(np.mean(err01 ** 2) + 1e-30))
        rows.append({
            "halo": int(halo),
            "psnr_vs_whole_db": round(psnr, 2),
            "max_err01": float(err01.max()),
            "mean_err01": float(err01.mean()),
            "uint8_lsb_max": int(math.ceil(float(err01.max()) * 255)),
        })
    admissible = select_admissible(rows, threshold_db)
    return {
        "admissible_halo": admissible,
        "threshold_db": threshold_db,
        "frame": int(frame),
        "tile_w": int(tile_w),
        "scale": int(scale),
        "method": "structured_probe_sweep",
        "sweep": rows,
    }


def select_admissible(rows: Sequence[dict],
                      threshold_db: float) -> Optional[int]:
    """Smallest halo of the LARGEST passing suffix of the (halo-sorted)
    sweep rows.  Deviation should be monotone non-increasing in halo,
    so a small halo that "passes" while a larger one fails is probe
    noise near the threshold, not admissibility — the pick and every
    larger candidate must clear the threshold (round-4 ADVICE)."""
    admissible = None
    for row in sorted(rows, key=lambda r: r["halo"], reverse=True):
        if row["psnr_vs_whole_db"] >= threshold_db:
            admissible = int(row["halo"])
        else:
            break
    return admissible


def val_dir_contract(
        infer_fn: Callable,
        val_dir: str,
        scale: int,
        halo: int,
        tile_w: int = 64,
        max_images: int = 4,
) -> dict:
    """Contract-level admissibility evidence on REAL images: per-image
    PSNR-vs-ground-truth of whole-frame vs tiled SR at ``halo``.

    The synthetic probe sweep bounds tiled-vs-whole deviation, but the
    tools/halo_parity.py finding is that admissibility is a property of
    *trained weights on real content* — so when a validation directory
    is available, ``cli export --val_dir`` records the statement the
    parity budget is actually written in: how much the tiled path moves
    the PSNR-vs-GT number (images treated as HR, LR = PIL-parity
    bicubic ÷scale, the reference eval protocol).  Returns a dict for
    the release sidecar: mean whole/tiled PSNR and the delta."""
    import jax.numpy as jnp

    from super_resolution_tpu.config import DataConfig
    from super_resolution_tpu.data import (
        denormalize,
        list_images,
        normalize,
    )
    from super_resolution_tpu.metrics import psnr01 as psnr_fn
    from super_resolution_tpu.ops import bicubic_downsample
    from super_resolution_tpu.parallel import tiled_upscale
    from super_resolution_tpu.train.evaluate import _load_image

    dc = DataConfig()
    whole_db, tiled_db = [], []
    n_used = 0
    for path in list_images(val_dir):
        if n_used >= max_images:
            break
        hr01 = _load_image(path)
        h, w = (hr01.shape[0] // scale) * scale, \
            (hr01.shape[1] // scale) * scale
        # the tiled pass needs an admissible tile: LR height must
        # exceed 2*halo (plan_tiles contract) — skip tiny images
        # instead of aborting the whole export after the expensive
        # sweep (round-5 review: a 64-row val image used to crash the
        # export and discard the sweep result)
        if h // scale <= 2 * halo or w // scale < 1:
            print(f"[halo] val contract: skipping {path} — LR "
                  f"{w // scale}x{h // scale} too small to tile at "
                  f"halo={halo}")
            continue
        hr01 = jnp.asarray(hr01[:h, :w])
        lrn = normalize(bicubic_downsample(hr01, scale),
                        dc.normalize_mean, dc.normalize_std)

        def score(srn):
            sr01 = jnp.clip(denormalize(srn, dc.normalize_mean,
                                        dc.normalize_std), 0.0, 1.0)
            return float(psnr_fn(sr01, hr01))

        whole_db.append(score(infer_fn(lrn[None])[0]))
        tiled_db.append(score(tiled_upscale(
            infer_fn, lrn, scale=scale, tile=h // scale,
            tile_w=tile_w, halo=halo, tile_batch=1)))
        n_used += 1
    if not whole_db:
        return {
            "val_dir": os.path.abspath(val_dir),
            "n_images": 0,
            "halo": int(halo),
            "tile_w": int(tile_w),
            "note": "no val image large enough to tile at this halo",
        }
    mw = float(np.mean(whole_db))
    mt = float(np.mean(tiled_db))
    return {
        "val_dir": os.path.abspath(val_dir),
        "n_images": n_used,
        "halo": int(halo),
        "tile_w": int(tile_w),
        "psnr_gt_whole_db": round(mw, 4),
        "psnr_gt_tiled_db": round(mt, 4),
        "delta_db": round(mt - mw, 4),
    }


def halo_meta_path(checkpoint: str) -> str:
    """Sidecar location for a checkpoint's release metadata: a JSON next
    to a file artifact, inside an orbax directory."""
    if os.path.isdir(checkpoint):
        return os.path.join(checkpoint, "release_meta.json")
    return checkpoint + ".meta.json"


def write_halo_meta(checkpoint: str, meta: dict) -> str:
    path = halo_meta_path(checkpoint)
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
        f.write("\n")
    return path


def read_halo_meta(checkpoint: str) -> Optional[dict]:
    path = halo_meta_path(checkpoint)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def read_admissible_halo(checkpoint: str) -> Optional[int]:
    """The stamped admissible halo for ``checkpoint``, or None when no
    metadata exists (or the sweep found no candidate admissible)."""
    meta = read_halo_meta(checkpoint)
    if not meta:
        return None
    halo = meta.get("admissible_halo")
    return None if halo is None else int(halo)
