"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4's recommendation).

Note: some installed pytest plugins import jax before this conftest runs, so
plain env vars are not enough — we use jax.config.update, which works any
time before the backend is initialized.
"""

import os

# XLA_FLAGS is read at backend init (lazy), so setting it here still works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the ambient env pins a TPU
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.default_backend()}")
