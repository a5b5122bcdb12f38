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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if not REAL_TPU and "collective_call_terminate" not in flags:
    # XLA's in-process CPU communicator ABORTS the process when a
    # collective waits longer than ~30s. On a 1-core CI host, 8 virtual
    # devices time-share that core, so a psum legitimately waits minutes
    # whenever other async dispatches are draining -- a starved
    # rendezvous, not a deadlock. Raise both watchdogs.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not REAL_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / subprocess / golden-regen tests "
        "(skipped by default; enable with --runslow)")
    config.addinivalue_line(
        "markers", "timeout(seconds): advisory per-test budget "
        "(enforced only if pytest-timeout is installed)")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full suite, ~15 min; "
                     "default tier is <8 min)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
