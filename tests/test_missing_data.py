"""Missing-data records: when no sample has any observation covering a
candidate, the reference emits HINTS=missing-data, missing PROB_* values
(f32::missing) and no FORMAT fields (calling/variants/mod.rs:424-451,469),
and FDR's tags_prob_sum skips such records (utils/mod.rs:193-194)."""

import math

from varlociraptor_tpu.calling.call import CallOptions, call_generic
from varlociraptor_tpu.calling.observations import ObservationWriter
from varlociraptor_tpu.calling.variants import VariantInfo
from varlociraptor_tpu.evidence.observation import (
    Pileup,
    ReadObservation,
    set_prob_mapping,
    set_prob_overlap,
)
from varlociraptor_tpu.grammar.scenario import Scenario

SCENARIO = {
    "samples": {"s": {"universe": "[0.0,1.0]", "resolution": 0.1}},
    "events": {"present": "s:]0.0,1.0]"},
}


def _obs():
    o = ReadObservation()
    set_prob_mapping(o, -1e-9)
    o.prob_alt = -1e-9
    o.prob_ref = math.log(1e-6)
    o.prob_missed_allele = math.log(0.5)
    o.prob_sample_alt = 0.0
    set_prob_overlap(o, -math.inf)
    return o


def _variant(pos):
    return VariantInfo(
        kind="snv", chrom="chr1", pos=pos,
        ref_allele="A", alt_allele="T", alt_base="T",
    )


def test_missing_data_record(tmp_path):
    obs_path = tmp_path / "s.jsonl"
    with ObservationWriter(obs_path, sample_name="s") as w:
        w.write_record(_variant(10), Pileup(read_observations=[_obs()] * 5))
        w.write_record(_variant(20), Pileup(read_observations=[]))
    out = tmp_path / "calls.vcf"
    n = call_generic(Scenario(SCENARIO), {"s": obs_path}, out, CallOptions())
    assert n == 2

    lines = [
        l for l in out.read_text().splitlines() if l and not l.startswith("#")
    ]
    assert len(lines) == 2
    covered, empty = lines
    # covered locus: numeric PROB_*, real FORMAT fields, no missing-data hint
    assert "missing-data" not in covered
    c_info = dict(
        kv.split("=", 1) for kv in covered.split("\t")[7].split(";") if "=" in kv
    )
    assert float(c_info["PROB_PRESENT"]) >= 0.0
    # empty locus: hint + missing PROB_* + "." FORMAT fields
    fields = empty.split("\t")
    info = dict(kv.split("=", 1) for kv in fields[7].split(";") if "=" in kv)
    assert "missing-data" in info.get("HINTS", "")
    assert info["PROB_PRESENT"] == "."
    assert info["PROB_ABSENT"] == "."
    sample_col = fields[9]
    assert set(sample_col.split(":")) == {"."}


def test_missing_data_skipped_by_fdr(tmp_path):
    from varlociraptor_tpu.filtration.fdr import control_fdr

    obs_path = tmp_path / "s.jsonl"
    with ObservationWriter(obs_path, sample_name="s") as w:
        w.write_record(_variant(10), Pileup(read_observations=[_obs()] * 5))
        w.write_record(_variant(20), Pileup(read_observations=[]))
    calls = tmp_path / "calls.vcf"
    call_generic(Scenario(SCENARIO), {"s": obs_path}, calls, CallOptions())
    filtered = tmp_path / "filtered.vcf"
    control_fdr(calls, filtered, events=["present"], alpha=1.0)
    recs = [
        l
        for l in filtered.read_text().splitlines()
        if l and not l.startswith("#")
    ]
    # the missing-data record can never pass filtration (tags_prob_sum=None)
    assert len(recs) == 1 and "\t11\t" in recs[0]


def test_breakend_group_event_tag_and_fdr_dedup(tmp_path):
    """Output records of a haplotype/breakend group must carry the EVENT
    INFO tag (calling/variants/mod.rs:411-413,626-628) so FDR dedups the
    group's probability once and shares keep decisions across mates."""
    from varlociraptor_tpu.filtration.fdr import control_fdr

    obs_path = tmp_path / "s.jsonl"
    with ObservationWriter(obs_path, sample_name="s") as w:
        for pos in (10, 20):
            v = _variant(pos)
            v.haplotype = "event:swap1"
            w.write_record(v, Pileup(read_observations=[_obs()] * 5))
        w.write_record(_variant(30), Pileup(read_observations=[_obs()] * 5))
    calls = tmp_path / "calls.vcf"
    call_generic(Scenario(SCENARIO), {"s": obs_path}, calls, CallOptions())
    lines = [
        l for l in calls.read_text().splitlines() if l and not l.startswith("#")
    ]
    assert len(lines) == 3
    assert "EVENT=swap1" in lines[0] and "EVENT=swap1" in lines[1]
    assert "EVENT=" not in lines[2]
    filtered = tmp_path / "filtered.vcf"
    control_fdr(calls, filtered, events=["present"], alpha=1.0)
    kept = [
        l
        for l in filtered.read_text().splitlines()
        if l and not l.startswith("#")
    ]
    # both mates share one keep decision — either both in or both out
    n_mates = sum("EVENT=swap1" in l for l in kept)
    assert n_mates in (0, 2)


def test_imprecise_cipos_roundtrip(tmp_path):
    """IMPRECISE + CIPOS/CIEND survive preprocess observation files into
    the final call record (write_record_aux_info,
    calling/variants/mod.rs:162-176)."""
    v = VariantInfo(
        kind="deletion", chrom="chr1", pos=100,
        ref_allele="N", alt_allele="<DEL>", svlen=500,
        precise=False, cipos=(-12, 12), ciend=(-9, 9),
    )
    obs_path = tmp_path / "s.jsonl"
    with ObservationWriter(obs_path, sample_name="s") as w:
        w.write_record(v, Pileup(read_observations=[_obs()] * 4))
    calls = tmp_path / "calls.vcf"
    call_generic(Scenario(SCENARIO), {"s": obs_path}, calls, CallOptions())
    line = [
        l for l in calls.read_text().splitlines() if l and not l.startswith("#")
    ][0]
    info = line.split("\t")[7]
    assert "IMPRECISE" in info
    assert "CIPOS=-12,12" in info
    assert "CIEND=-9,9" in info
