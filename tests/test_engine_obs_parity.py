"""Engine-level parity lock: the reference's OWN embedded observations fed
straight through OUR calling engine must reproduce each testcase's expected
assertions (the engine-vs-preprocess bisection, scripts/engine_obs_sweep.py;
round-5 sweep: 42 PASS including every current-era capture — FAILs are all
provably stale captures, see docs/calibration_failures.md round-5 section).

Locks a representative fast subset of the PASS set so an engine regression
against reference-produced evidence is caught in CI.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

RES = Path("/root/reference/tests/resources/testcases")

CASES = [
    "test75",
    "test_giab_05",
    "test_giab_23",
    "test_prinz_af_scan",
    "test_alt_locus_bias_01",
]

pytestmark = pytest.mark.skipif(not RES.exists(), reason="testcases missing")


@pytest.mark.parametrize("name", CASES)
def test_engine_reproduces_reference_observations(name):
    from engine_obs_sweep import EngineOnlyTestcase

    assert EngineOnlyTestcase(RES / name).check()
