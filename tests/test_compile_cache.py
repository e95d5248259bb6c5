"""Persistent XLA compilation cache (compile_cache.py; SURVEY.md §5 aux,
§1 L6 serving): a SECOND process running the same CLI command must load
its executables from the on-disk cache instead of recompiling.

Detection is exact, not timing-based: a wrapper script registers a
``jax.monitoring`` event listener before driving the real CLI entry
point, and asserts on the ``/jax/compilation_cache/cache_hits`` event —
so the test exercises the production wiring (cli.main →
enable_compilation_cache) end to end and cannot flake on CPU compile
speed."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

WRAPPER = """
import sys
hits = []
import jax.monitoring as mon
mon.register_event_listener(
    lambda e, **kw: hits.append(e) if "cache" in e else None)
from super_resolution_tpu import cli
rc = cli.main(sys.argv[1:])
print("CACHE_HIT=" +
      str("/jax/compilation_cache/cache_hits" in hits))
sys.exit(rc)
"""


def _write_images(tmp_path, n=3, size=48):
    root = tmp_path / "data"
    root.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(root / f"im{i}.png")
    return str(root)


def _run(tmp_path, script, args):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        # persist even sub-second CPU compiles (the TPU graphs the cache
        # exists for compile in minutes; the threshold is a prod default)
        "SR_TPU_CACHE_MIN_COMPILE_SECS": "0",
    })
    r = subprocess.run([sys.executable, str(script)] + args,
                       capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return r.stdout


@pytest.mark.fast
def test_second_process_reuses_cache(tmp_path):
    root = _write_images(tmp_path)
    script = tmp_path / "drive.py"
    script.write_text(WRAPPER)
    cache = tmp_path / "xla_cache"
    args = ["train", "--dataset_dir", root, "--steps", "1",
            "--batch_size", "2", "--hr_height", "32",
            "--residual_blocks", "1", "--warmup_batches", "10",
            "--no_perceptual", "--n_cpu", "1",
            "--checkpoint_dir", str(tmp_path / "ck"),
            "--compile_cache_dir", str(cache)]

    out1 = _run(tmp_path, script, args)
    assert "CACHE_HIT=False" in out1
    entries = [f for f in os.listdir(cache) if f.endswith("-cache")]
    assert entries, "first run persisted no executables"

    out2 = _run(tmp_path, script, args)
    assert "CACHE_HIT=True" in out2, out2[-2000:]


@pytest.mark.fast
def test_no_compile_cache_flag(tmp_path):
    root = _write_images(tmp_path)
    script = tmp_path / "drive.py"
    script.write_text(WRAPPER)
    cache = tmp_path / "xla_cache"
    args = ["train", "--dataset_dir", root, "--steps", "1",
            "--batch_size", "2", "--hr_height", "32",
            "--residual_blocks", "1", "--warmup_batches", "10",
            "--no_perceptual", "--n_cpu", "1",
            "--checkpoint_dir", str(tmp_path / "ck"),
            "--compile_cache_dir", str(cache), "--no_compile_cache"]
    _run(tmp_path, script, args)
    assert not cache.exists(), "cache written despite --no_compile_cache"
