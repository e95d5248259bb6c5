"""Data parallelism over a device mesh (SURVEY.md §2.3, §5.8).

The reference is single-device (SURVEY.md §2.4: no torch.distributed
anywhere); this layer is the TPU-native addition.  Strategy: *sharding,
not code* — the train steps (train/steps.py) are written with global-batch
semantics, so data parallelism is expressed entirely through
``jax.sharding``: a 1-D ``Mesh`` over ICI with the batch axis sharded
(``P('dp', ...)``) and params/optimizer state replicated (``P()``).
XLA's SPMD partitioner inserts the gradient psums and makes the RaGAN
batch means and BatchNorm statistics mesh-global automatically — exactly
the large-batch semantics SURVEY.md §7 requires, with the collectives
riding ICI.

TP/PP/FSDP are deliberately absent: a 16.7 M-param convnet replicates
(SURVEY.md §2.3).  The sequence-parallel analog — spatial tiling — lives
in parallel/tiling.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"


def make_mesh(n_devices: int | None = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices (a v5e-8
    ICI slice in production; 8 virtual CPU devices in tests)."""
    devs = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (BATCH_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))


def shard_state(state, mesh: Mesh):
    """Replicate the train state across the mesh (params + opt states are
    tiny relative to HBM; FSDP is unnecessary, SURVEY.md §2.3).

    On a multi-process (DCN) mesh ``device_put`` rejects the
    non-addressable replicated sharding, so the global array is
    assembled from the process-local value instead — valid because
    every process builds the identical state (same-seed ``init_state``;
    the multihost input contract, parallel/multihost.py).  Found by the
    2-process CPU handshake test: the single-process degenerate path
    never hits this branch.
    """
    sh = replicated(mesh)
    if all(d.process_index == jax.process_index()
           for d in mesh.devices.flat):
        return jax.device_put(state, sh)

    def put(a):
        if isinstance(a, jax.Array) and jax.dtypes.issubdtype(
                a.dtype, jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                sh, np.asarray(jax.random.key_data(a)))
            return jax.random.wrap_key_data(
                data, impl=jax.random.key_impl(a))
        return jax.make_array_from_process_local_data(sh, np.asarray(a))

    return jax.tree.map(put, state)


def shard_batch_iter(it: Iterator[np.ndarray], mesh: Mesh,
                     prefetch: int = 2) -> Iterator[jax.Array]:
    """Batch-shard incoming host batches across the mesh with
    double-buffered transfers (SURVEY.md §2.4 H2D path)."""
    from super_resolution_tpu.data.pipeline import device_prefetch

    return device_prefetch(it, size=prefetch, sharding=batch_sharded(mesh))


def pad_batch_to_mesh(batch: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Pad axis 0 to a multiple of the mesh size (edge-replicate) so any
    batch shards evenly."""
    n = mesh.devices.size
    rem = batch.shape[0] % n
    if rem == 0:
        return batch
    pad = n - rem
    return np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
