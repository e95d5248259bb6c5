"""Optional grain-backed input pipeline (SURVEY.md §2.4, §5.8).

The default :class:`~super_resolution_tpu.data.pipeline.PatchLoader` is a
dependency-light threaded loader with explicit resume state.  This module
provides the grain equivalent for users who want grain's multiprocess
prefetch, per-host sharding (``ShardByJaxProcess``) and checkpointable
iterators — the same ``__iter__``/``state_dict``/``load_state_dict``
surface, so ``train()`` accepts either interchangeably.

Uses ``grain.MapDataset``: source = image paths (or (HR, LR) path pairs
when ``cfg.lr_dir`` is set — SURVEY.md §2.1 paired mode, same dict-batch
contract as the threaded loader), per-record seeded random crop (grain
supplies the per-record RNG), infinite repeat + shuffle, batching;
iterator state round-trips through grain's native
``get_state``/``set_state``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from super_resolution_tpu.config import DataConfig
from super_resolution_tpu.data.pipeline import (
    _decode_crop,
    _decode_crop_pair,
    list_images,
    pair_images,
)


class GrainPatchLoader:
    """grain.MapDataset-based uint8 HR patch batches (B, P, P, 3), or
    paired ``{"hr", "lr"}`` dict batches when ``cfg.lr_dir`` is set."""

    def __init__(self, cfg: DataConfig, files: Optional[Sequence[str]] = None,
                 seed: int = 0, part: Tuple[int, int] = (0, 1)):
        import grain

        self.cfg = cfg
        assert cfg.batch_size % part[1] == 0, (cfg.batch_size, part)
        self.part = (int(part[0]), int(part[1]))
        self.paired = cfg.lr_dir is not None
        if self.paired:
            # files holds (hr_path, lr_path) tuples, matched by stem —
            # identical contract to PatchLoader's paired mode
            self.files = list(files) if files is not None \
                else pair_images(cfg.dataset_dir, cfg.lr_dir)
        else:
            self.files = list(files) if files is not None \
                else list_images(cfg.dataset_dir)
        self.seed = seed

        patch = cfg.patch_hw
        scale = cfg.scale
        paired = self.paired

        def decode(path_and_seed):
            path, record_seed = path_and_seed
            rng = np.random.default_rng(record_seed)
            if paired:
                hr, lr = _decode_crop_pair(path[0], path[1], patch, scale,
                                           rng)
                return {"hr": hr, "lr": lr}
            return _decode_crop(path, patch, rng)

        base = (grain.MapDataset.source(list(self.files))
                .shuffle(seed=seed)
                .repeat()
                .map_with_index(lambda i, p: (p, (seed, i)))
                .map(decode))
        index, count = self.part
        if count > 1:
            # multi-host partition (parallel/multihost.py): global batch
            # s row r is record s·B + r, so host rows are the strided
            # slices lo+j::B round-robin-mixed back into step order —
            # each host decodes ONLY its rows, and the concatenation
            # over hosts is bit-identical to the part=(0,1) stream
            b_glob = cfg.batch_size
            local = b_glob // count
            lo = index * local
            base = grain.MapDataset.mix(
                [base[lo + j::b_glob] for j in range(local)])
            ds = base.batch(local)
        else:
            ds = base.batch(cfg.batch_size)
        if cfg.n_workers > 0:
            it = ds.to_iter_dataset()
            it = it.mp_prefetch(
                grain.multiprocessing.MultiprocessingOptions(
                    num_workers=cfg.n_workers))
            self._ds = it
        else:
            self._ds = ds.to_iter_dataset()
        self._iter = None

    def _ensure_iter(self):
        if self._iter is None:
            self._iter = iter(self._ds)
        return self._iter

    def __iter__(self):
        it = self._ensure_iter()
        while True:
            batch = next(it)
            if isinstance(batch, dict):
                yield {k: np.asarray(v) for k, v in batch.items()}
            else:
                yield np.asarray(batch)

    # -- resume support: grain's native iterator state
    def state_dict(self) -> dict:
        return {"grain_state": self._ensure_iter().get_state(),
                "seed": self.seed}

    def load_state_dict(self, state: dict) -> None:
        self._ensure_iter().set_state(state["grain_state"])
