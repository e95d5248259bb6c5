"""Persistent XLA compilation cache (SURVEY.md §1 L6 serving, §5 aux).

The reference never needed a cold-start story — eager torch executes
immediately — but a TPU-first framework pays its latency up front: the
full production inference graph compiles in ~10–20 min over this
environment's tunneled chip (bench.py measured 1174 s at round-3
shipping defaults) and the full GAN train step in ~4–20 min.  JAX's
persistent compilation cache turns every repeat invocation (a serve
restart, a resumed training run, a re-run bench) into a disk load —
verified to hit through the axon tunnel's remote-compile path
(cache-hit probe + bench.py warm numbers: BENCHNOTES.md round 4).

Call :func:`enable_compilation_cache` before the first jit execution.
The CLI does this for every subcommand (``--compile_cache_dir`` /
``--no_compile_cache``), as do bench.py and the tools/ benches.

Notes for this codebase specifically:

- ``jax_remove_custom_partitioning_ptr_from_cache_key`` must be on or
  the fused dense-block kernel's ``custom_partitioning`` callbacks
  (ops/pallas/partitioned.py) poison every key with a process-local
  function pointer and nothing ever hits across processes.  The
  callbacks are stable module-level functions, so dropping the pointer
  from the key is sound.
- The Pallas trace-time knobs (CF9/FWD_CARRY/BWD_CARRY/…) are safe:
  they change the traced kernel body, hence the HLO, hence the key.
- Entries are keyed on HLO + compile options + backend/platform
  version, so CPU-backend tests and TPU runs coexist in one directory.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_CACHE_DIR = os.path.expanduser(
    os.environ.get("SR_TPU_COMPILE_CACHE",
                   "~/.cache/super_resolution_tpu/xla_cache"))


def enable_compilation_cache(
        cache_dir: Optional[str] = None,
        min_compile_time_secs: Optional[float] = None,
) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: ``$SR_TPU_COMPILE_CACHE`` or
    ``~/.cache/super_resolution_tpu/xla_cache``) and return the
    directory.  Idempotent; call before the first jit execution —
    executables compiled earlier in the process are not retroactively
    cached.  ``min_compile_time_secs`` skips persisting trivial compiles
    (the production graphs compile in minutes; sub-second entries are
    directory noise)."""
    import jax

    if min_compile_time_secs is None:
        min_compile_time_secs = float(
            os.environ.get("SR_TPU_CACHE_MIN_COMPILE_SECS", "1.0"))
    cache_dir = os.path.expanduser(cache_dir or DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update(
        "jax_remove_custom_partitioning_ptr_from_cache_key", True)
    return cache_dir
