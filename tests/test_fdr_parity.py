"""FDR-control parity vs the reference's asserted call counts
(``/root/reference/tests/lib.rs:261-402``)."""

import pytest

from varlociraptor_tpu.filtration.fdr import control_fdr

CASES = [
    # (resource, events, alpha, local, smart, retain_artifacts, expected)
    ("test_fdr_ev_2", ["SOMATIC"], 0.05, False, False, False, 985),
    ("test_fdr_ev_3", ["ABSENT"], 0.001, False, False, False, 0),
    ("test_fdr_ev_4", ["SOMATIC_TUMOR"], 0.05, False, False, False, 0),
    ("test_fdr_local1", ["SOMATIC"], 0.05, True, False, False, 0),
    ("test_fdr_local2", ["SOMATIC"], 0.25, True, False, False, 1),
    ("test_fdr_local2_smart", ["SOMATIC"], 0.08, True, True, False, 1),
    ("test_fdr_local2_smart", ["SOMATIC"], 0.08, True, True, True, 1),
    ("test_fdr_local3", ["GERMLINE", "SOMATIC_TUMOR_LOW"], 0.05, True, False, False, 0),
]


@pytest.mark.parametrize(
    "name,events,alpha,local,smart,retain,expected",
    CASES,
    ids=[f"{c[0]}-a{c[2]}-{'l' if c[3] else 'g'}{'s' if c[4] else ''}{'r' if c[5] else ''}" for c in CASES],
)
def test_fdr_call_count(ref_tests, tmp_path, name, events, alpha, local, smart, retain, expected):
    vt = (None, None, None) if name == "test_fdr_local3" else ("deletion", 1, 30)
    n = control_fdr(
        ref_tests / "resources" / name / "calls.matched.bcf",
        tmp_path / "out.vcf",
        events=events,
        alpha=alpha,
        vartype=vt[0],
        min_len=vt[1],
        max_len=vt[2],
        local=local,
        smart=smart,
        smart_retain_artifacts=retain,
    )
    assert n == expected


def test_fdr_ev1_close(ref_tests, tmp_path):
    # the reference's own expectation for ev_1 is commented out (974) and
    # its thresholds.tsv says 973 — treat as a tolerance check
    n = control_fdr(
        ref_tests / "resources/test_fdr_ev_1/calls.matched.bcf",
        tmp_path / "out.vcf",
        events=["SOMATIC"],
        alpha=0.05,
        vartype="deletion",
        min_len=1,
        max_len=30,
    )
    assert 875 <= n <= 1075


def test_tags_prob_sum_overshoot(ref_tests):
    """utils/mod.rs:486-511: prosolo-style alt-event sum caps at ln(1)."""
    from varlociraptor_tpu.io.vcf import open_variant_file
    from varlociraptor_tpu.filtration.fdr import tags_prob_sum

    rec = open_variant_file(
        ref_tests / "resources/test_tags_prob_sum/overshoot.vcf"
    ).records()[0]
    p = tags_prob_sum(
        rec,
        [
            "PROB_ADO_TO_REF",
            "PROB_ADO_TO_ALT",
            "PROB_HOM_ALT",
            "PROB_HET",
            "PROB_ERR_REF",
        ],
    )
    assert p == 0.0


@pytest.mark.parametrize(
    "vartype,tags,expected",
    [
        ("deletion", ["PROB_GERMLINE", "PROB_SOMATIC"], 0.8),
        ("deletion", ["PROB_ABSENT"], 0.2),
        ("insertion", ["PROB_GERMLINE", "PROB_SOMATIC"], 0.2),
        ("insertion", ["PROB_ABSENT"], 0.8),
    ],
)
def test_collect_prob_dist(ref_tests, vartype, tags, expected):
    """utils/mod.rs:515-566."""
    import math

    from varlociraptor_tpu.io.vcf import open_variant_file
    from varlociraptor_tpu.filtration.fdr import (
        _record_vartype_match,
        tags_prob_sum,
    )

    recs = open_variant_file(
        ref_tests / "resources/test_collect_prob_dist/min.calls.vcf"
    ).records()
    vals = [
        tags_prob_sum(r, tags) for r in recs if _record_vartype_match(r, vartype)
    ]
    vals = [v for v in vals if v is not None]
    assert len(vals) == 1
    assert abs(math.exp(vals[0]) - expected) < 5e-6
