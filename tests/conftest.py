"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (the real
environment has a single TPU chip); kernels are written for TPU but are
numerically identical on CPU.

The container environment pre-loads an `axon` PJRT plugin via
PYTHONPATH=/root/.axon_site sitecustomize, which imports jax at interpreter
start and force-selects the single real TPU (tests would route every tiny op
through a single-client compile tunnel and contend with benchmarks). The
backend itself initializes lazily, so overriding jax_platforms here — before
any jax computation — pins tests to CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
from varlociraptor_tpu.utils.jaxcache import enable as _enable_xla_cache  # noqa: E402

_enable_xla_cache()

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_TESTS = pathlib.Path("/root/reference/tests")
REFERENCE_RESOURCES = REFERENCE_TESTS / "resources"


@pytest.fixture(scope="session")
def ref_tests():
    """Reference repo tests/ dir (test.bam, chr17.prefix.fa, indels+clips.bam)."""
    if not REFERENCE_TESTS.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_TESTS


@pytest.fixture(scope="session")
def ref_resources():
    """Reference repo tests/resources dir (testcases/, per-test dirs)."""
    if not REFERENCE_RESOURCES.exists():
        pytest.skip("reference test resources not available")
    return REFERENCE_RESOURCES
