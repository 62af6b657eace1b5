"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the real environment
has a single TPU chip); kernels are written for TPU but numerically identical
on CPU. Must run before jax is imported anywhere.
"""

import os

# The environment presets JAX_PLATFORMS=axon (single real TPU via tunnel);
# tests must run on the virtual 8-device CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_RESOURCES = pathlib.Path("/root/reference/tests/resources")


@pytest.fixture(scope="session")
def ref_resources():
    if not REFERENCE_RESOURCES.exists():
        pytest.skip("reference test resources not available")
    return REFERENCE_RESOURCES
