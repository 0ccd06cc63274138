"""Test harness: force CPU with a virtual 8-device mesh so multi-chip
sharding paths are exercised without TPU hardware (the strategy the
survey prescribes for multi-host behavior, SURVEY.md section 4)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("PEPR_TEST_TPU") != "1":
    # The environment's sitecustomize pins jax_platforms to "axon,cpu"
    # (remote TPU tunnel), which ignores JAX_PLATFORMS; override the
    # config directly so tests run on the local 8-device CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def example_dir():
    path = os.path.join(REFERENCE, "examples", "Erysipelotrichales")
    if not os.path.isdir(path):
        pytest.skip("reference examples not available")
    return path


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
