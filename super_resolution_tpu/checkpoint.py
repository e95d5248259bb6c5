"""Checkpoint / resume via orbax (SURVEY.md §5.3-5.4).

The reference interval-saves G/D ``.pth`` state dicts and resumes manually
by ``--epoch`` (SURVEY.md §1 L7).  Here one step-stamped orbax save holds
the *entire* :class:`GANTrainState` (G/D params, both Adam states, BN
stats, RNG key) plus the data-iterator state, giving step-exact
deterministic resume.  Torch ``.pth`` files import through
:mod:`super_resolution_tpu.import_torch` instead.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

if TYPE_CHECKING:   # avoid circular import with train.loop
    from super_resolution_tpu.train.state import GANTrainState


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, state: "GANTrainState",
                    data_state: Optional[dict] = None,
                    max_to_keep: int = 5) -> int:
    step = int(jax.device_get(state.step))
    with _manager(ckpt_dir, max_to_keep) as mgr:
        payload = {"state": ocp.args.StandardSave(state)}
        if data_state is not None:
            payload["data"] = ocp.args.JsonSave(data_state)
        mgr.save(step, args=ocp.args.Composite(**payload))
        mgr.wait_until_finished()
    return step


def restore_checkpoint(
        ckpt_dir: str, template: "GANTrainState",
        step: Optional[int] = None,
) -> Tuple["GANTrainState", Optional[dict], int]:
    """Restore (state, data_state, step).  ``template`` supplies the tree
    structure/shapes (build it with ``init_state`` on the same config)."""
    with _manager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
        # detect the optional data-iterator item by path (item_metadata
        # spews restore warnings for composite items)
        has_data = os.path.isdir(
            os.path.join(os.path.abspath(ckpt_dir), str(step), "data"))
        args = {"state": ocp.args.StandardRestore(template)}
        if has_data:
            args["data"] = ocp.args.JsonRestore()
        try:
            out = mgr.restore(step, args=ocp.args.Composite(**args))
        except ValueError as e:
            if "do not match" in str(e):
                raise ValueError(
                    f"checkpoint at {ckpt_dir!r} step {step} has a "
                    "different state tree than the current config "
                    "(e.g. resuming a PSNR-pretrain checkpoint with the "
                    "perceptual loss enabled). To warm-start the "
                    "generator into a fresh GAN state use "
                    "train(init_g_from=...) / --init_g_from instead of "
                    "--resume.") from e
            raise
    data_state = out.get("data") if has_data else None
    return out["state"], data_state, step


def ema_provenance_path(ckpt_dir: str) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), "ema_provenance.json")


def write_ema_provenance(ckpt_dir: str, meta: dict) -> str:
    """Record how the run's EMA tree was SEEDED (next to the orbax step
    dirs).  A warm-started run seeds the EMA from the warm-start
    weights (train/loop.py), not from random init — so its EMA is
    trustworthy from step 0 and the step-count maturity gate must not
    strip it (round-5 review: the canonical GAN fine-tune would
    otherwise ship raw-only releases for its first 5/(1−decay) steps
    while its EMA was seeded from a mature PSNR model)."""
    import json as _json

    os.makedirs(os.path.abspath(ckpt_dir), exist_ok=True)
    path = ema_provenance_path(ckpt_dir)
    with open(path, "w") as f:
        _json.dump(meta, f, indent=2)
        f.write("\n")
    return path


def read_ema_provenance(ckpt_dir: str) -> Optional[dict]:
    import json as _json

    path = ema_provenance_path(ckpt_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return _json.load(f)


def restore_generator_params(ckpt_dir: str,
                             step: Optional[int] = None,
                             prefer_ema: bool = True,
                             ema_decay: Optional[float] = None):
    """Template-free restore of just the generator params from a full
    train-state checkpoint (inference/eval path — no need to rebuild the
    optimizer/VGG trees).

    ``prefer_ema`` returns the EMA tree when the checkpoint carries one —
    the same preference :func:`~super_resolution_tpu.import_torch.load_pth`
    applies to BasicSR ``params_ema`` release files; pass False for the
    raw training params.

    When ``ema_decay`` is given, the EMA preference is MATURITY-GATED:
    a checkpoint saved before 5/(1−decay) steps
    (:func:`~super_resolution_tpu.config.ema_maturity_steps`) gets the
    raw params with a warning — below that horizon a FROM-SCRATCH EMA
    is still dominated by its random-init seed and is the run's *worst*
    artifact (round-4 demo: 24.85 vs 26.15 dB PSNR-RGB; the round-5
    demo measured the 3τ point directly).  The gate keys on the EMA's
    SEED, not just the step count: a warm-started run records
    ``ema_provenance.json`` (warm_start) next to the step dirs, and its
    EMA — seeded from the warm-start weights, not random init — is
    trusted at any step."""
    g_params, g_ema, step = restore_generator_trees(ckpt_dir, step)
    if prefer_ema and g_ema is not None:
        if ema_decay is not None:
            from super_resolution_tpu.config import ema_maturity_steps

            need = ema_maturity_steps(ema_decay)
            prov = read_ema_provenance(ckpt_dir)
            if prov is not None and prov.get("warm_start"):
                return g_ema, step
            if step < need:
                print(f"[checkpoint] step-{step} checkpoint is inside "
                      f"the EMA maturity horizon ({need} steps at decay "
                      f"{ema_decay}) and carries no warm-start "
                      f"provenance — using raw params instead of the "
                      f"immature EMA (pass prefer_ema without ema_decay "
                      f"to force the EMA tree)")
                return g_params, step
        return g_ema, step
    return g_params, step


def restore_generator_trees(ckpt_dir: str, step: Optional[int] = None):
    """Template-free ``(g_params, g_ema_or_None, step)`` from a full
    train-state checkpoint — the export path needs both trees to emit
    the family's ``{params, params_ema}`` release shape.

    Leaves come back as host numpy arrays rather than device arrays: a
    template-free ``StandardRestore`` replays the *saved* shardings,
    which name the training devices — restoring a TPU-trained
    checkpoint on a CPU host (eval box, CI) would fail with
    "Device TPU ... was not found".  Inference jit re-stages the numpy
    trees onto whatever backend is live."""
    with _manager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
    item_dir = os.path.join(os.path.abspath(ckpt_dir), str(step), "state")
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        meta = ckptr.metadata(item_dir).item_metadata.tree
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        st = ckptr.restore(
            item_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    return st["g_params"], st.get("g_ema"), step


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def net_interp(params_psnr, params_gan, alpha: float):
    """ESRGAN network interpolation (paper §3.4, SURVEY.md §2.1):
    θ = α·θ_GAN + (1−α)·θ_PSNR, leaf-wise over two compatible trees."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    return jax.tree.map(
        lambda a, b: (1.0 - alpha) * np.asarray(a) + alpha * np.asarray(b),
        params_psnr, params_gan)
