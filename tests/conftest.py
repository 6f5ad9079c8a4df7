"""Test configuration.

Tests run on whatever JAX platform the environment provides (on the build
machine this is one real TPU chip via the axon tunnel; elsewhere CPU).  The
axon sitecustomize hook forces JAX_PLATFORMS at interpreter start, so it
cannot be overridden from inside this process.  Multi-device sharding tests
therefore spawn a *subprocess* with a clean environment giving an 8-device
virtual CPU mesh — use the `cpu_mesh_env` fixture / `run_in_cpu_mesh` helper.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


def cpu_mesh_environ(n_devices: int = 8) -> dict:
    """Environment for a subprocess with n virtual CPU JAX devices."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    # Keep the package importable.
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return env


def run_in_cpu_mesh(code: str, n_devices: int = 8, timeout: int = 600):
    """Run a python snippet under an n-device CPU mesh; returns CompletedProcess."""
    return subprocess.run(
        [sys.executable, "-c", code],
        env=cpu_mesh_environ(n_devices),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
