"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (the real
environment has a single TPU chip); kernels are written for TPU but are
numerically identical on CPU.

The container environment pre-loads an `axon` PJRT plugin via
PYTHONPATH=/root/.axon_site sitecustomize, which force-selects the single real
TPU regardless of JAX_PLATFORMS and routes every compile through a single
client tunnel (tests would contend with benchmarks and hang). If we detect
that hook, re-exec pytest with a clean PYTHONPATH so jax runs pure-CPU.
"""

import os
import sys

if (
    "axon_site" in os.environ.get("PYTHONPATH", "")
    and os.environ.get("VLT_TEST_REEXEC") != "1"
):
    os.environ["VLT_TEST_REEXEC"] = "1"
    os.environ["PYTHONPATH"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
