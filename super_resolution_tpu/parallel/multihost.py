"""Multi-host (DCN) data parallelism (SURVEY.md §2.4's last rung).

The reference pipeline is single-process/single-device (SURVEY.md §2.4:
no ``torch.distributed`` anywhere in the family).  Within one host this
framework's DP is pure sharding (parallel/dp.py) — and the SAME
compiled train step scales across hosts unchanged, because jit +
``NamedSharding`` over a global mesh is multi-process-aware: gradient
psums ride ICI within a slice and DCN between slices, inserted by XLA.
What changes across hosts is everything *around* the step:

1. **Runtime init** — :func:`initialize` wraps
   ``jax.distributed.initialize`` (coordinator address + process id; on
   Cloud TPU pods all three arguments auto-detect from the metadata
   server).  Must run before the first device op.
2. **Input** — a process can only materialize host-local data.  The
   loaders accept ``part=(process_index, process_count)`` and yield
   exactly this host's rows of the *global* batch (path sampling and
   per-row crop RNG derive from global ``(seed, step, row)``, so the
   concatenation over hosts is bit-identical to the single-host
   stream).  :func:`global_batch_iter` assembles those local rows into
   a global batch-sharded array with
   ``jax.make_array_from_process_local_data`` — the DCN counterpart of
   ``device_put(batch, sharding)``.
3. **Side effects** — checkpoint saves are collective (orbax requires
   every process to participate, so the save call stays unconditional
   in the loop) against a filesystem all hosts share; logging, sample
   grids and in-loop eval run on process 0 only (:func:`is_primary`).

Every helper degrades exactly to the single-host path at
``process_count() == 1`` — asserted on the 8-virtual-device CPU mesh in
tests/test_multihost.py, which is how this layer is testable with one
physical chip (the driver's ``dryrun_multichip`` covers the mesh math;
a real DCN run needs only real coordinator flags).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding

from super_resolution_tpu.parallel.dp import batch_sharded


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (DCN).  With no arguments,
    relies on the environment's auto-detection (TPU pod metadata /
    ``JAX_COORDINATOR_ADDRESS`` etc.).  Idempotent: a second call is a
    no-op instead of an error so library users can call it defensively."""
    plats = (jax.config.jax_platforms or "").split(",")[0]
    if plats in ("cpu", ""):
        # CPU cross-process collectives need an explicit backend (gloo
        # ships in jaxlib); TPU pods ride ICI/DCN and ignore this.  Set
        # BEFORE initialize so the 2-process CPU handshake test (and any
        # CPU-pod rehearsal) gets working psums instead of a hang.
        # "" covers jax_platforms=None — a CPU-only machine that never
        # set JAX_PLATFORMS would otherwise skip gloo and hang on the
        # first cross-process psum; setting the flag is harmless when
        # the resolved backend turns out to be TPU.
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              "gloo")
        except Exception:                        # flag renamed/absent
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:                    # already initialized
        if "already" not in str(e).lower():
            raise


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """Whether this process owns the non-collective side effects
    (logging, sample grids, in-loop eval)."""
    return jax.process_index() == 0


def data_part() -> Tuple[int, int]:
    """The ``part=(index, count)`` this process feeds the loaders."""
    return jax.process_index(), jax.process_count()


def local_rows(global_batch_size: int) -> int:
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} does not divide over "
            f"{n} processes")
    return global_batch_size // n


def global_batch(local, mesh: Mesh) -> jax.Array:
    """Assemble this host's rows into the global batch-sharded array
    (dict batches tree-map; uint8 host batches pass through as-is).
    With one process this is exactly ``device_put(local, sharding)``."""
    sh: NamedSharding = batch_sharded(mesh)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sh, np.asarray(a)), local)


def global_batch_iter(it: Iterator, mesh: Mesh,
                      prefetch: int = 2) -> Iterator[jax.Array]:
    """Multi-host counterpart of ``dp.shard_batch_iter``: double-buffered
    assembly of host-local rows into global batch-sharded arrays."""
    import collections

    buf = collections.deque()
    for batch in it:
        buf.append(global_batch(batch, mesh))
        if len(buf) >= prefetch:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
