"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's device-fixture trick (torchsearchsorted/test/conftest.py:4-11):
same test body on an emulated multi-device platform, numpy as ground truth. Real-TPU
runs happen in bench.py / the driver, not the unit suite.
"""

import os
import subprocess
import sys

# Run the suite on a virtual 8-device CPU mesh. Under the axon TPU tunnel a
# sitecustomize registers the TPU plugin at interpreter start (env vars set here
# come too late), but `jax.config.update("jax_platforms", ...)` still wins as
# long as no backend has initialized — so the suite runs on CPU even there
# (the tunneled chip compiles remotely at ~6min/program; CPU is minutes total).
# Multi-device sharding tests run in a clean-env subprocess (see clean_cpu_env).
_platform = os.environ.get("MVIP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


REFERENCE_SCENE = "/root/reference/data/1"


def has_reference_scene() -> bool:
    return os.path.isdir(REFERENCE_SCENE)


requires_scene = pytest.mark.skipif(
    not has_reference_scene(), reason="reference scene data/1 not mounted"
)


def clean_cpu_env(n_devices: int = 8) -> dict:
    """Env for a subprocess that genuinely runs on an n-device virtual CPU mesh,
    bypassing the axon sitecustomize TPU registration."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


def run_in_cpu_mesh(code: str, n_devices: int = 8, timeout: int = 600):
    """Run a python snippet on the virtual CPU mesh; returns CompletedProcess."""
    return subprocess.run(
        [sys.executable, "-c", code],
        env=clean_cpu_env(n_devices),
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )
