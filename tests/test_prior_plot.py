"""Prior-plot sweep over the reference's prior workflow fixtures
(tests/resources/prior/: 6 scenarios x target samples from config.yaml,
rendered by `plot variant-calling-prior --contig 1 --sample S`)."""

import math
from pathlib import Path

import pytest

from varlociraptor_tpu.estimation.prior_plot import plot_variant_calling_prior
from varlociraptor_tpu.grammar.scenario import Scenario

PRIOR_DIR = Path("/root/reference/tests/resources/prior")

# scenario -> target samples, mirroring config.yaml
TARGETS = {
    "pedigree": ["child"],
    "simple-pedigree": ["child"],
    "population": ["a"],
    "tumor-normal-relapse": ["relapse"],
    "tumor-normal": ["tumor"],
    "tumor-relapse": ["relapse"],
}


@pytest.mark.parametrize(
    "name,sample",
    [(n, s) for n, ss in TARGETS.items() for s in ss],
)
def test_prior_plot_fixture(name, sample):
    sc = Scenario.from_yaml(
        (PRIOR_DIR / "scenarios" / f"{name}.scenario.yaml").read_text()
    )
    # coarsen continuous universes so the joint enumeration stays small —
    # the prior machinery exercised is identical, just fewer grid points
    for s in sc.samples.values():
        if not getattr(s, "resolution", None) or s.resolution < 0.1:
            s.resolution = 0.1
    spec = plot_variant_calling_prior(sc, "1", sample)
    values = spec["data"]["values"]
    assert values, f"{name}/{sample}: empty prior plot"
    # target-sample rows carry the prior mass; other-sample rows are the
    # VAF-combination rules of the faceted plot and have no prob field
    target_rows = [v for v in values if v["sample"] == sample]
    assert target_rows, f"{name}/{sample}: no target-sample rows"
    total = 0.0
    for v in target_rows:
        p = float(v["prob"])
        assert math.isfinite(p) and 0.0 <= p <= 1.0 + 1e-9, (name, sample, v)
        total += p
    assert total > 0.0, f"{name}/{sample}: all-zero prior"
