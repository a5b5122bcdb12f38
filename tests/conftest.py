"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path and benches on real TPU hardware.

Note: the environment preloads jax with a TPU backend (sitecustomize), so
env vars are too late -- we must switch platforms through jax.config before
any backend is initialized.
"""

import os

REAL_TPU = bool(os.environ.get("JAX_REAL_TPU"))

flags = os.environ.get("XLA_FLAGS", "")
if not REAL_TPU and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
