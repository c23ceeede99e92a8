"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU platform ignores JAX_PLATFORMS from the environment, so force
the CPU backend via jax.config before anything builds arrays. Tests must
never run eagerly against the tunneled TPU (per-op latency is seconds).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# TVM_TPU_TESTS=1 (scripts/tpu_checks.py) keeps the real accelerator
# backend for the device-pipeline bit-identity tests.
if os.environ.get("TVM_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xB100D)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
