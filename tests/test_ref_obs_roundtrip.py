"""Observation format v15 writing (preprocessing/mod.rs:921-1038): our
preprocess output written as a reference-format observation VCF must decode
back (via the interop reader) to the same pileups the JSON-lines path
produces, and calling on either must give identical records."""

import numpy as np

from varlociraptor_tpu.calling.observations import ObservationReader
from varlociraptor_tpu.calling.ref_obs import ReferenceObservationReader
from varlociraptor_tpu.testcase import Testcase

CASE = "/root/reference/tests/resources/testcases/test13"


def test_v15_roundtrip_and_call_parity(tmp_path):
    tc = Testcase(CASE)
    recs_a, _ = tc.run(workdir=tmp_path / "jsonl")
    recs_b, _ = tc.run(workdir=tmp_path / "vcf", obs_suffix="vcf")

    # pileup-level roundtrip: decode both intermediates and compare reads
    import glob

    for vcf_obs in glob.glob(str(tmp_path / "vcf" / "*.obs.vcf")):
        name = vcf_obs.split("/")[-1].split(".")[0]
        a = list(ObservationReader(tmp_path / "jsonl" / f"{name}.obs.jsonl"))
        b = list(ReferenceObservationReader(vcf_obs, name))
        assert len(a) == len(b) > 0
        for (va, pa), (vb, pb) in zip(a, b):
            assert (va.chrom, va.pos) == (vb.chrom, vb.pos)
            oa, ob = pa.read_observations, pb.read_observations
            assert len(oa) == len(ob)
            for x, y in zip(oa, ob):
                for f in (
                    "prob_alt", "prob_ref", "prob_missed_allele",
                    "prob_sample_alt", "prob_mapping", "prob_hit_base",
                ):
                    xa, ya = getattr(x, f), getattr(y, f)
                    if np.isinf(xa) or np.isinf(ya):
                        assert xa == ya, f
                    else:
                        # jsonl uses f16 quantization; MiniLogProb mixes
                        # f16/f32 — compare at the coarser tolerance
                        assert abs(xa - ya) <= 0.02 * max(1.0, abs(xa)), (
                            f, xa, ya,
                        )
                assert x.strand == y.strand
                assert x.read_orientation == y.read_orientation
                assert x.softclipped == y.softclipped
                assert x.paired == y.paired
                assert x.is_max_mapq == y.is_max_mapq
                assert x.alt_locus == y.alt_locus
                assert x.third_allele_evidence == y.third_allele_evidence
                assert x.homopolymer_indel_len == y.homopolymer_indel_len

    # call-level parity
    assert len(recs_a) == len(recs_b) > 0
    for ra, rb in zip(recs_a, recs_b):
        for k, v in ra.info.items():
            if not k.startswith("PROB_"):
                continue
            va = np.inf if v == "inf" else float(v)
            vb = np.inf if rb.info[k] == "inf" else float(rb.info[k])
            if np.isinf(va) or np.isinf(vb):
                assert va == vb, k
            else:
                assert abs(va - vb) <= 0.5 + 0.01 * abs(va), (k, va, vb)


def test_open_observations_gzipped_jsonl(tmp_path):
    """Gzipped native observation files must be sniffed as JSON-lines, not
    misrouted to the VCF parser (regression: gzip magic implied 'variant
    file')."""
    import math

    from varlociraptor_tpu.calling.observations import ObservationWriter
    from varlociraptor_tpu.calling.ref_obs import open_observations
    from varlociraptor_tpu.calling.variants import VariantInfo
    from varlociraptor_tpu.evidence.observation import (
        Pileup,
        ReadObservation,
        set_prob_mapping,
        set_prob_overlap,
    )

    o = ReadObservation()
    set_prob_mapping(o, -1e-9)
    o.prob_alt = -1e-9
    o.prob_ref = math.log(1e-6)
    o.prob_missed_allele = math.log(0.5)
    o.prob_sample_alt = 0.0
    set_prob_overlap(o, -math.inf)
    p = tmp_path / "obs.jsonl.gz"
    with ObservationWriter(p, sample_name="s") as w:
        w.write_record(
            VariantInfo(
                kind="snv", chrom="chr1", pos=10,
                ref_allele="A", alt_allele="T", alt_base="T",
            ),
            Pileup(read_observations=[o]),
        )
    reader = open_observations(p, "s")
    recs = list(reader)
    assert len(recs) == 1
    variant, pileup = recs[0]
    assert variant.chrom == "chr1" and len(pileup.read_observations) == 1


def test_v15_posteriors_match_native_format():
    """The v15 interop path must yield the SAME posteriors as the native
    JSONL path (within f16 encoding granularity). Regression for the
    round-3 fix: the v15 writer exported the RAW prob_mapping while the
    reference serializes the MAPQ-ADJUSTED accessor value
    (read_observation.rs:401) — calling never re-adjusts, so raw values
    shifted GERMLINE_HOM by ~470 PHRED on test01."""
    from pathlib import Path

    import pytest

    from varlociraptor_tpu.testcase import Testcase

    td = Path("/root/reference/tests/resources/testcases/test01")
    if not td.exists():
        pytest.skip("testcases missing")
    t = Testcase(td)
    r_v15, _ = t.run(obs_suffix="vcf")
    r_jsonl, _ = t.run(obs_suffix="jsonl")
    for k, v in r_jsonl[0].info.items():
        if not k.startswith("PROB_") or v in ("inf", True):
            continue
        a = float(str(r_v15[0].info[k]).split(",")[0])
        b = float(str(v).split(",")[0])
        assert abs(a - b) < 1.0, (k, a, b)
