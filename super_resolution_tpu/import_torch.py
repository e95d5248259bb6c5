"""PyTorch ``.pth`` checkpoint importer — the parity linchpin.

SURVEY.md §5.4: imported reference checkpoints are the ≤0.1 dB PSNR parity
target (BASELINE.json:5).  This module maps the reference family's torch
state dicts onto the Flax parameter trees, handling every naming
convention the family ships (SURVEY.md §2.1 [F]):

- **BasicSR new-style**: ``conv_first, body.{b}.rdb{k}.conv{j},
  conv_body, conv_up1, conv_up2, conv_hr, conv_last``
- **xinntao old arch-style**: ``model.0, model.1.sub.{b}.RDB{k}.conv{j}.0,
  model.1.sub.{nb} (trunk), model.3, model.6, model.8, model.10``
- **eriklindernoren style**: ``conv1, res_blocks.{b}.dense_blocks.{k}.b{j}.0,
  conv2, upsampling.{0,3}, conv3.{0,2}``
- Discriminator: ``model.{idx}`` sequential conv/BN stacks
- VGG-19: torchvision ``features.{idx}`` layout

Conv kernels transpose OIHW → HWIO; BatchNorm maps weight/bias →
scale/bias and running_mean/var → batch_stats.  The upsampler variant is
auto-detected from ``conv_up1``'s output width (SURVEY.md §7
"Upsample-variant ambiguity": nf → nearest_conv, 4·nf → pixelshuffle).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from super_resolution_tpu.config import DiscriminatorConfig, GeneratorConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):     # torch tensor without importing torch here
        x = x.detach().cpu()
        # fp16/bf16 checkpoints (common for released EMA weights) load as
        # fp32 — numpy has no bfloat16, and model params are fp32 anyway
        if str(x.dtype) in ("torch.bfloat16", "torch.float16"):
            x = x.float()
        x = x.numpy()
    return np.asarray(x)


def _kernel(x) -> jnp.ndarray:
    """OIHW → HWIO."""
    return jnp.asarray(_np(x).transpose(2, 3, 1, 0))


def _bias(x) -> jnp.ndarray:
    return jnp.asarray(_np(x))


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` file into a flat name→ndarray dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # BasicSR save formats wrap the state dict: {'params': …},
    # {'params_ema': …} (preferred when both exist — matches BasicSR's own
    # load behavior for released EMA checkpoints), or {'state_dict': …}.
    for wrapper in ("params_ema", "params", "state_dict"):
        if isinstance(sd, dict) and isinstance(sd.get(wrapper), dict):
            sd = sd[wrapper]
            break
    return {k: _np(v) for k, v in sd.items()}


# --------------------------------------------------------------------------
# Generator
# --------------------------------------------------------------------------

def _detect_generator_style(keys) -> str:
    ks = set(keys)
    if any(k.startswith("model.1.sub") for k in ks):
        return "xinntao_old"
    if any(k.startswith("body.") for k in ks):
        return "basicsr"
    if any(k.startswith("res_blocks.") for k in ks):
        return "erik"
    raise ValueError(
        "unrecognized generator state dict; expected BasicSR, xinntao-old "
        f"or eriklindernoren naming, got keys like {sorted(ks)[:5]}")


def _generator_key_map(style: str, n_blocks: int) -> Dict[str, str]:
    """torch conv prefix → flax module path ('/'-joined)."""
    m: Dict[str, str] = {}
    if style == "basicsr":
        m["conv_first"] = "conv_first"
        m["conv_body"] = "trunk_conv"
        m["conv_up1"], m["conv_up2"] = "upconv1", "upconv2"
        m["conv_hr"], m["conv_last"] = "hr_conv", "conv_last"
        for b in range(n_blocks):
            for k in range(1, 4):
                for j in range(1, 6):
                    m[f"body.{b}.rdb{k}.conv{j}"] = \
                        f"block{b}/dense{k}/conv{j}"
    elif style == "xinntao_old":
        m["model.0"] = "conv_first"
        m[f"model.1.sub.{n_blocks}"] = "trunk_conv"
        m["model.3"], m["model.6"] = "upconv1", "upconv2"
        m["model.8"], m["model.10"] = "hr_conv", "conv_last"
        for b in range(n_blocks):
            for k in range(1, 4):
                for j in range(1, 6):
                    m[f"model.1.sub.{b}.RDB{k}.conv{j}.0"] = \
                        f"block{b}/dense{k}/conv{j}"
    elif style == "erik":
        m["conv1"] = "conv_first"
        m["conv2"] = "trunk_conv"
        m["upsampling.0"], m["upsampling.3"] = "upconv1", "upconv2"
        m["conv3.0"], m["conv3.2"] = "hr_conv", "conv_last"
        for b in range(n_blocks):
            for k in range(3):
                for j in range(1, 6):
                    m[f"res_blocks.{b}.dense_blocks.{k}.b{j}.0"] = \
                        f"block{b}/dense{k + 1}/conv{j}"
    else:
        raise ValueError(style)
    return m


def import_generator(
        state_dict: Dict[str, np.ndarray],
        cfg: GeneratorConfig | None = None,
        strict: bool = True,
) -> Tuple[dict, GeneratorConfig]:
    """Map a torch generator state dict → (flax variables, inferred cfg).

    When ``cfg`` is None the architecture (n_blocks, filters, growth,
    upsampler) is inferred from the checkpoint shapes.  ``strict=False``
    tolerates non-model keys (training bookkeeping like ``step``/EMA decay
    scalars that some releases leave in the state dict) instead of failing.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    style = _detect_generator_style(sd.keys())

    # --- infer architecture from shapes ---
    first_key = {"basicsr": "conv_first.weight", "xinntao_old":
                 "model.0.weight", "erik": "conv1.weight"}[style]
    filters = sd[first_key].shape[0]
    channels = sd[first_key].shape[1]
    blk = {"basicsr": "body.", "xinntao_old": "model.1.sub.",
           "erik": "res_blocks."}[style]
    idx_pos = len(blk.split(".")) - 1
    block_ids = set()
    for k in sd:
        if k.startswith(blk) and ("rdb" in k.lower() or "b" in k):
            try:
                block_ids.add(int(k.split(".")[idx_pos]))
            except ValueError:
                pass
    if style == "xinntao_old":
        n_blocks = max(block_ids)          # .sub.{nb} is the trunk conv
    else:
        n_blocks = max(block_ids) + 1
    gkey = {"basicsr": "body.0.rdb1.conv1.weight",
            "xinntao_old": "model.1.sub.0.RDB1.conv1.0.weight",
            "erik": "res_blocks.0.dense_blocks.0.b1.0.weight"}[style]
    growth = sd[gkey].shape[0]
    upkey = {"basicsr": "conv_up1.weight", "xinntao_old": "model.3.weight",
             "erik": "upsampling.0.weight"}[style]
    upsampler = ("pixelshuffle" if sd[upkey].shape[0] == 4 * filters
                 else "nearest_conv")

    # The eriklindernoren lineage builds every generator LeakyReLU as
    # ``nn.LeakyReLU()`` — torch's default negative_slope is 0.01, not the
    # 0.2 the xinntao/BasicSR branch uses.  Importing with the wrong slope
    # would silently miss the ≤0.1 dB parity target (ADVICE.md round 1).
    slope = 0.01 if style == "erik" else 0.2
    inferred = GeneratorConfig(channels=channels, filters=filters,
                               growth=growth, n_blocks=n_blocks,
                               upsampler=upsampler, lrelu_slope=slope)
    if cfg is not None:
        for field in ("filters", "growth", "n_blocks", "upsampler"):
            got, want = getattr(inferred, field), getattr(cfg, field)
            if got != want:
                raise ValueError(
                    f"checkpoint {field}={got} != configured {want}")
        inferred = cfg

    key_map = _generator_key_map(style, n_blocks)
    params: dict = {}
    used = set()
    for tprefix, fpath in key_map.items():
        wk, bk = f"{tprefix}.weight", f"{tprefix}.bias"
        if wk not in sd:
            raise KeyError(f"missing {wk} in checkpoint")
        node = params
        for part in fpath.split("/")[:-1]:
            node = node.setdefault(part, {})
        leaf = fpath.split("/")[-1]
        node[leaf] = {"kernel": _kernel(sd[wk]), "bias": _bias(sd[bk])}
        used.update((wk, bk))
    extra = set(sd) - used
    if extra and strict:
        raise ValueError(f"unmapped checkpoint keys: {sorted(extra)[:8]} "
                         "(pass strict=False to ignore)")
    return {"params": params}, inferred


def infer_generator_cfg_from_params(params: dict) -> GeneratorConfig:
    """Infer the generator architecture from a *flax* param tree.

    Orbax checkpoints store only the parameter pytree, not a
    GeneratorConfig — this recovers the structural fields (n_blocks,
    filters, growth, channels, upsampler) the exporters and
    compatibility checks need, the flax-side mirror of
    :func:`import_generator`'s shape inference.  Non-structural fields
    (lrelu_slope, init) keep their defaults — they are not recoverable
    from shapes."""
    first = np.asarray(params["conv_first"]["kernel"])   # HWIO
    filters, channels = first.shape[3], first.shape[2]
    n_blocks = sum(1 for k in params if str(k).startswith("block"))
    growth = np.asarray(
        params["block0"]["dense1"]["conv1"]["kernel"]).shape[3]
    up_out = np.asarray(params["upconv1"]["kernel"]).shape[3]
    upsampler = "pixelshuffle" if up_out == 4 * filters else "nearest_conv"
    return GeneratorConfig(channels=channels, filters=filters,
                           growth=growth, n_blocks=n_blocks,
                           upsampler=upsampler)


def export_generator(params: dict, cfg: GeneratorConfig,
                     style: str = "basicsr") -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_generator`: flax params → torch state dict
    (HWIO → OIHW), so checkpoints trained here remain loadable by the
    reference family's tooling (and by our own importer)."""
    key_map = _generator_key_map(style, cfg.n_blocks)
    sd: Dict[str, np.ndarray] = {}
    for tprefix, fpath in key_map.items():
        node = params
        for part in fpath.split("/"):
            node = node[part]
        sd[f"{tprefix}.weight"] = \
            np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{tprefix}.bias"] = np.asarray(node["bias"])
    return sd


def export_generator_release(params: dict, cfg: GeneratorConfig,
                             params_ema: dict | None = None,
                             style: str = "basicsr") -> Dict:
    """Release-shaped state dict following the BasicSR family convention
    the importer honors on the read side (:func:`load_pth` prefers
    ``params_ema``): ``{"params": …, "params_ema": …}`` when an EMA tree
    exists, else the flat state dict."""
    sd = export_generator(params, cfg, style=style)
    if params_ema is None:
        return sd
    return {"params": sd,
            "params_ema": export_generator(params_ema, cfg, style=style)}


def save_pth(state_dict: Dict, path: str) -> None:
    """torch.save a (possibly wrapper-nested) name→ndarray state dict."""
    import torch

    def conv(v):
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        return torch.from_numpy(np.asarray(v).copy())

    torch.save({k: conv(v) for k, v in state_dict.items()}, path)


# --------------------------------------------------------------------------
# Discriminator
# --------------------------------------------------------------------------

def import_discriminator(
        state_dict: Dict[str, np.ndarray],
        cfg: DiscriminatorConfig | None = None,
) -> Tuple[dict, DiscriminatorConfig]:
    """Map a sequential ``model.{idx}`` discriminator state dict → flax
    {params, batch_stats} by replaying the reference layer stack
    (SURVEY.md §2.1 "VGG-style discriminator")."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    if cfg is None:
        base = sd["model.0.weight"].shape[0]
        channels = sd["model.0.weight"].shape[1]
        # count stride-pair stages from widths present
        conv_keys = [k for k in sd
                     if k.endswith(".weight") and sd[k].ndim == 4]
        widths = {sd[k].shape[0] for k in conv_keys} - {1}
        cfg = DiscriminatorConfig(channels=channels, base_filters=base,
                                  n_scales=len(widths))

    params: dict = {}
    stats: dict = {}
    idx = 0

    def take_conv(name):
        nonlocal idx
        params[name] = {"kernel": _kernel(sd[f"model.{idx}.weight"]),
                        "bias": _bias(sd[f"model.{idx}.bias"])}
        idx += 1

    def take_bn(name):
        nonlocal idx
        params[name] = {"scale": _bias(sd[f"model.{idx}.weight"]),
                        "bias": _bias(sd[f"model.{idx}.bias"])}
        stats[name] = {"mean": _bias(sd[f"model.{idx}.running_mean"]),
                       "var": _bias(sd[f"model.{idx}.running_var"])}
        idx += 1

    # nn.Sequential numbers every layer, so the stateless LeakyReLUs still
    # consume an index each.
    for i in range(cfg.n_scales):
        take_conv(f"conv{i}_0")
        if i != 0:
            take_bn(f"bn{i}_0")
        idx += 1                       # LeakyReLU
        take_conv(f"conv{i}_1")
        take_bn(f"bn{i}_1")
        idx += 1                       # LeakyReLU
    take_conv("head")
    return {"params": params, "batch_stats": stats}, cfg


def export_discriminator(variables: dict,
                         cfg: DiscriminatorConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_discriminator`: flax {params, batch_stats}
    → sequential ``model.{idx}`` torch state dict (the reference layer
    numbering, including indices consumed by stateless LeakyReLUs)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    idx = 0

    def put_conv(name):
        nonlocal idx
        sd[f"model.{idx}.weight"] = \
            np.asarray(params[name]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"model.{idx}.bias"] = np.asarray(params[name]["bias"])
        idx += 1

    def put_bn(name):
        nonlocal idx
        sd[f"model.{idx}.weight"] = np.asarray(params[name]["scale"])
        sd[f"model.{idx}.bias"] = np.asarray(params[name]["bias"])
        sd[f"model.{idx}.running_mean"] = np.asarray(stats[name]["mean"])
        sd[f"model.{idx}.running_var"] = np.asarray(stats[name]["var"])
        sd[f"model.{idx}.num_batches_tracked"] = np.asarray(0)
        idx += 1

    for i in range(cfg.n_scales):
        put_conv(f"conv{i}_0")
        if i != 0:
            put_bn(f"bn{i}_0")
        idx += 1                       # LeakyReLU
        put_conv(f"conv{i}_1")
        put_bn(f"bn{i}_1")
        idx += 1                       # LeakyReLU
    put_conv("head")
    return sd


# --------------------------------------------------------------------------
# VGG-19
# --------------------------------------------------------------------------

_VGG_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def import_vgg(state_dict: Dict[str, np.ndarray]) -> dict:
    """torchvision ``vgg19.features`` state dict → flax VGGFeatures params."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    params = {}
    for n, idx in enumerate(_VGG_CONV_IDX):
        wk = f"features.{idx}.weight"
        if wk not in sd and f"{idx}.weight" in sd:
            wk, bk = f"{idx}.weight", f"{idx}.bias"
        else:
            bk = f"features.{idx}.bias"
        params[f"conv{n}"] = {"kernel": _kernel(sd[wk]),
                              "bias": _bias(sd[bk])}
    return {"params": params}
