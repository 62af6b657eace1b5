"""Golden-value ports of the reference's inline utils tests
(utils/mod.rs:485-567): tags_prob_sum overshoot capping on
test_tags_prob_sum/overshoot.vcf, and vartype-filtered collect_prob_dist
on test_collect_prob_dist/min.calls.vcf (whose second record also
exercises the missing-PROB skip)."""

import math
from pathlib import Path

import pytest

from varlociraptor_tpu.filtration.fdr import (
    _collect_dist_rows,
    tags_prob_sum,
)
from varlociraptor_tpu.io.vcf import open_variant_file

RES = Path("/root/reference/tests/resources")


def test_tags_prob_sum_overshoot_caps_to_ln_one():
    rec = open_variant_file(RES / "test_tags_prob_sum/overshoot.vcf").records()[0]
    alt_tags = [
        "PROB_ADO_TO_REF",
        "PROB_ADO_TO_ALT",
        "PROB_HOM_ALT",
        "PROB_HET",
        "PROB_ERR_REF",
    ]
    p = tags_prob_sum(rec, alt_tags)
    assert p == 0.0  # LogProb::ln_one()


@pytest.mark.parametrize(
    "vartype,tags,expected",
    [
        ("DEL", ["PROB_GERMLINE", "PROB_SOMATIC"], 0.8),
        ("DEL", ["PROB_ABSENT"], 0.2),
        ("INS", ["PROB_GERMLINE", "PROB_SOMATIC"], 0.2),
        ("INS", ["PROB_ABSENT"], 0.8),
    ],
)
def test_collect_prob_dist_fixture(vartype, tags, expected):
    records = list(
        open_variant_file(RES / "test_collect_prob_dist/min.calls.vcf").records()
    )
    rows = _collect_dist_rows(records, tags, vartype, None, None)
    # exactly one record per vartype has non-missing probs (the DEL record
    # with PROB_*=. must be skipped, utils/mod.rs:193-194)
    assert rows.shape[0] == 1
    assert abs(math.exp(rows[0, 0]) - expected) < 5e-6
