"""Test harness config: run everything on the CPU backend with 8 virtual
devices so the same Mesh/shard_map code path as a v5e-8 slice is exercised
without TPU hardware (SURVEY.md §4.4).

NOTE: the environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) in a
way that survives env-var overrides at import time, so the platform must
also be forced through ``jax.config`` after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")
