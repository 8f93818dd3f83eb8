"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4's recommendation).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may pin a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# determinism + fp32 matmuls for parity tests
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
