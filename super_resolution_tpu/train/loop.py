"""Training orchestration (SURVEY.md §3.1): warmup L1 pretrain →
alternating GAN steps, periodic sampling/checkpointing, metrics, resume.

The warmup/GAN switch is host-side control flow over two separately
compiled steps — no data-dependent branches inside jit (SURVEY.md §7).
Data parallelism: when ``cfg.data_parallel > 1`` the same compiled steps
run with batch-sharded inputs over a Mesh (parallel/dp.py); the step code
is identical because its semantics are already global-batch.
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Optional

import numpy as np

import jax.numpy as jnp

import jax

from super_resolution_tpu.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from super_resolution_tpu.config import TrainConfig
from super_resolution_tpu.data import (
    PatchLoader,
    SyntheticPatches,
    device_prefetch,
    to_uint8_image,
)
from super_resolution_tpu.metrics import MetricLogger, Throughput
from super_resolution_tpu.parallel import multihost as mh
from super_resolution_tpu.parallel.dp import (
    make_mesh,
    shard_batch_iter,
    shard_state,
)
from super_resolution_tpu.train.state import (
    GANTrainState,
    eval_params,
    init_state,
)
from super_resolution_tpu.train.steps import (
    make_gan_step,
    make_infer_fn,
    make_pretrain_step,
)


def _save_sample_grid(cfg: TrainConfig, infer_fn, state: GANTrainState,
                      host_batch, step: int, out_dir: str, logger=None,
                      ema_warm: bool = False):
    """Periodic sample dump (the reference's ``save_image`` grid,
    SURVEY.md §3.1 [L5/obs]): rows = bicubic-×4 baseline | SR | HR, one
    column per sample."""
    from PIL import Image

    from super_resolution_tpu.data.augment import preprocess_batch
    from super_resolution_tpu.ops import bicubic_resize

    os.makedirs(out_dir, exist_ok=True)
    head = jax.tree.map(lambda x: x[:4], host_batch)   # array or paired dict
    hr_uint8 = head["hr"] if isinstance(head, dict) else head
    batch = preprocess_batch(jax.random.key(0), head, cfg.data,
                             augment=False)
    sr = infer_fn(_local_params(eval_params(cfg, state,
                                            warm_start=ema_warm)),
                  batch["lr"])
    sr_u8 = np.asarray(jax.device_get(to_uint8_image(sr, cfg.data)))
    hr_u8 = np.asarray(jax.device_get(hr_uint8))
    h, w = hr_u8.shape[1:3]
    if isinstance(head, dict):
        # paired mode: the baseline row upsamples the REAL paired LR the
        # model saw — synthesizing it from HR would show a bicubic chain
        # the training inputs never contained
        lr01 = jnp.asarray(head["lr"].astype(np.float32) / 255.0)
        bic = bicubic_resize(lr01, h, w)
    else:
        lr01 = jnp.asarray(hr_u8.astype(np.float32) / 255.0)
        bic = bicubic_resize(
            bicubic_resize(lr01, h // cfg.data.scale, w // cfg.data.scale),
            h, w)
    bic_u8 = np.asarray(jnp.clip(jnp.round(bic * 255), 0, 255)
                        ).astype(np.uint8)
    rows = [np.concatenate(list(imgs), axis=1)
            for imgs in (bic_u8, sr_u8, hr_u8)]
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(
        os.path.join(out_dir, f"step{step:08d}.png"))
    if logger is not None:
        logger.log_image(step, "samples/bicubic_sr_hr", grid)


def _host_rows(batch):
    """Host copy of a device batch for the sample grid.  Multi-host
    global arrays are not fully addressable — gather this process's
    shard rows (in row order) instead; 4 rows is all the grid needs."""
    def get(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            shards = sorted(a.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards])
        return np.asarray(jax.device_get(a))

    return jax.tree.map(get, batch)


def _local_params(params):
    """Host copy of (replicated) params for primary-only side effects.
    Under multi-host a replicated global array is not fully addressable,
    but every local device holds a full copy — read shard 0 so samples/
    eval never enter a collective only process 0 would join."""
    def get(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return np.asarray(a.addressable_shards[0].data)
        return np.asarray(jax.device_get(a))

    return jax.tree.map(get, params)


def train(cfg: TrainConfig,
          data_iter: Optional[Iterator[np.ndarray]] = None,
          data_loader=None,
          total_steps: Optional[int] = None,
          resume: bool = False,
          log_dir: Optional[str] = None,
          sample_dir: Optional[str] = None,
          eval_dir: Optional[str] = None,
          eval_interval: Optional[int] = None,
          init_g_from: Optional[str] = None) -> GANTrainState:
    """Run training; returns the final state.

    Data comes from (in priority order) ``data_iter`` (a plain batch
    iterator, no resume state), ``data_loader`` (any stateful loader with
    ``__iter__``/``state_dict``/``load_state_dict`` — e.g.
    :class:`PatchLoader` or
    :class:`~super_resolution_tpu.data.grain_source.GrainPatchLoader`), or
    a default :class:`PatchLoader` over ``cfg.data.dataset_dir``
    (synthetic patches if the dir is absent — keeps smoke tests and
    benches dataset-free)."""
    total_steps = total_steps if total_steps is not None \
        else cfg.n_epochs * cfg.steps_per_epoch

    loader = data_loader
    if data_iter is None and loader is None:
        # under multi-host each process loads ITS rows of the global
        # batch (bit-identical concatenation — parallel/multihost.py)
        part = mh.data_part()
        if os.path.isdir(cfg.data.dataset_dir):
            loader = PatchLoader(cfg.data, seed=cfg.seed, part=part)
        else:
            print(f"[train] dataset dir {cfg.data.dataset_dir!r} missing — "
                  "using synthetic patches")
            loader = SyntheticPatches(cfg.data, seed=cfg.seed, part=part)

    state = init_state(cfg)
    start_step = 0
    if init_g_from and not resume:
        # Warm-start G from a PSNR-pretrain checkpoint (orbax dir or torch
        # .pth) into a FRESH GAN state — the canonical ESRGAN recipe
        # (paper §4: GAN training initializes from the PSNR model).
        # Optimizer/D/RNG start fresh; only g_params is replaced.
        if os.path.isfile(init_g_from):
            from super_resolution_tpu.import_torch import (
                import_generator,
                load_pth,
            )

            variables, _ = import_generator(load_pth(init_g_from),
                                            cfg.generator)
            g_params = variables["params"]
        else:
            from super_resolution_tpu.checkpoint import (
                restore_generator_params,
            )

            # maturity-gated like every other read surface: an immature
            # from-scratch EMA must not seed the fine-tune (round-5
            # review — this path used to prefer it ungated)
            g_params, at = restore_generator_params(
                init_g_from, ema_decay=cfg.ema_decay)
            print(f"[train] warm-starting G from step-{at} checkpoint")
        warm = jax.tree.map(lambda t, s: jnp.asarray(s, t.dtype),
                            state.g_params, g_params)
        # seed the EMA from the warm-start weights too — starting it from
        # the fresh random init would make eval trail the PSNR model for
        # ~1/(1-decay) steps
        state = state.replace(
            g_params=warm,
            g_ema=None if state.g_ema is None
            else jax.tree.map(jnp.array, warm))
        # record the seed provenance next to the checkpoints: this run's
        # EMA starts from the warm-start weights, not random init, so
        # the step-count maturity gate does not apply to it
        if mh.is_primary() and state.g_ema is not None:
            from super_resolution_tpu.checkpoint import (
                write_ema_provenance,
            )

            write_ema_provenance(cfg.checkpoint_dir, {
                "warm_start": True,
                "source": os.path.abspath(init_g_from),
            })
    if resume:
        try:
            state, data_state, start_step = restore_checkpoint(
                cfg.checkpoint_dir, state)
            if data_state and loader is not None:
                loader.load_state_dict(data_state)
            print(f"[train] resumed from step {start_step}")
        except FileNotFoundError:
            print("[train] no checkpoint found; starting fresh")

    # is this run's EMA trusted regardless of step count?  True when the
    # EMA was seeded from warm-start weights — this session's
    # init_g_from, or the recorded provenance of the run being resumed.
    from super_resolution_tpu.checkpoint import read_ema_provenance

    ema_warm = bool(init_g_from) or bool(
        (read_ema_provenance(cfg.checkpoint_dir) or {}).get("warm_start"))

    mesh = None
    if cfg.data_parallel > 1:
        mesh = make_mesh(cfg.data_parallel)
        state = shard_state(state, mesh)
    if mh.process_count() > 1 and mesh is None:
        raise ValueError(
            "multi-host training needs a device mesh: set "
            "--data_parallel to the GLOBAL device count "
            f"({len(jax.devices())} across {mh.process_count()} hosts)")

    # Track the loader state that corresponds to each batch as it is
    # *pulled*, so the checkpoint can store the state matching the batch
    # the loop actually *consumed* — the prefetcher runs ahead by
    # cfg.data.prefetch, and checkpointing the live loader state would
    # make resume skip those batches (breaking step-exact determinism).
    pulled_states: dict = {}
    n_pulled = [0]

    def _tracked(src):
        for b in src:
            n_pulled[0] += 1
            if loader is not None:
                pulled_states[n_pulled[0]] = loader.state_dict()
            yield b

    if data_iter is None:
        data_iter = iter(loader)
    data_iter = _tracked(data_iter)
    if mh.process_count() > 1:
        data_iter = mh.global_batch_iter(data_iter, mesh,
                                         cfg.data.prefetch)
    elif mesh is not None:
        data_iter = shard_batch_iter(data_iter, mesh)
    else:
        data_iter = device_prefetch(data_iter, cfg.data.prefetch)

    pretrain_step = make_pretrain_step(cfg)
    gan_step = make_gan_step(cfg) if cfg.loss.lambda_adv > 0 else None
    infer_fn = make_infer_fn(cfg)

    logger = MetricLogger(log_dir if mh.is_primary() else None,
                          stdout=mh.is_primary())
    meter = Throughput(n_chips=max(1, cfg.data_parallel))
    log_every = 50
    last_host_batch = None
    n_consumed = 0

    for step_idx in range(start_step, total_steps):
        batch = next(data_iter)
        n_consumed += 1
        pulled_states.pop(n_consumed - 1, None)   # keep only current+ahead
        last_host_batch = batch
        in_warmup = gan_step is None or step_idx < cfg.warmup_batches
        step_fn = pretrain_step if in_warmup else gan_step
        state, metrics = step_fn(state, batch)
        logger.update(metrics)
        # HR patches count output pixels directly (B*H*W)
        hr_ref = batch["hr"] if isinstance(batch, dict) else batch
        meter.add(int(np.prod(hr_ref.shape[:3])))

        done = step_idx + 1
        if done % log_every == 0 or done == total_steps:
            logger.flush(done, "warmup" if in_warmup else "gan",
                         extra={"mp_per_sec_per_chip":
                                meter.mp_per_sec_per_chip()})
            meter.reset()
        if sample_dir and mh.is_primary() \
                and done % cfg.sample_interval == 0:
            _save_sample_grid(cfg, infer_fn, state,
                              _host_rows(last_host_batch),
                              done, sample_dir, logger=logger,
                              ema_warm=ema_warm)
        if eval_dir and mh.is_primary() \
                and done % (eval_interval or cfg.checkpoint_interval) == 0:
            from super_resolution_tpu.train.evaluate import (
                evaluate_directory,
            )

            tile = max(cfg.data.lr_patch, 48)
            ev = evaluate_directory(cfg,
                                    _local_params(eval_params(
                                        cfg, state,
                                        warm_start=ema_warm)),
                                    eval_dir, tile=tile,
                                    halo=min(8, tile // 4), max_images=8,
                                    infer_fn=infer_fn)
            logger.log_once(done, "eval",
                            {f"val_{k}": v for k, v in ev.items()})
        if done % cfg.checkpoint_interval == 0 or done == total_steps:
            data_state = pulled_states.get(n_consumed) if loader is not None \
                else None
            save_checkpoint(cfg.checkpoint_dir, state, data_state)

    logger.close()
    return state
