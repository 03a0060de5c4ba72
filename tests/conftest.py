"""Test harness: run everything on CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU needed for
CI); Pallas kernels run in interpret mode on CPU (tpurast.kernels gates on
backend). Must be set before JAX initializes.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform (the
# axon tunnel sets JAX_PLATFORMS=axon) and even if a pytest plugin already
# imported jax before this conftest ran.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    if not REFERENCE_DATA.is_dir():
        pytest.skip("reference data directory not mounted")
    return REFERENCE_DATA
