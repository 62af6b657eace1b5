"""Testcase capture (builder + anonymizer + BamWriter) tests."""

import numpy as np
import pytest

from varlociraptor_tpu.io.bam import BamReader, BamWriter
from varlociraptor_tpu.io.vcf import open_variant_file
from varlociraptor_tpu.testcase_builder import Anonymizer, build_testcase


def test_bam_writer_roundtrip(ref_tests, tmp_path):
    src = BamReader(ref_tests / "resources/testcases/test38/sample0.bam")
    out = tmp_path / "copy.bam"
    with BamWriter(out, src.ref_names, [100000] * len(src.ref_names)) as w:
        for rec in src:
            w.write_record(rec)
    back = BamReader(out)
    assert len(back) == len(src)
    a, b = src._record_at(3), back._record_at(3)
    assert a.qname == b.qname
    assert a.pos == b.pos and a.flag == b.flag and a.mapq == b.mapq
    assert (a.seq == b.seq).all() and (a.qual == b.qual).all()
    assert list(a.cigar) == list(b.cigar)
    assert a.tags.get("NM") == b.tags.get("NM")


def test_anonymizer_is_consistent_permutation():
    a = Anonymizer(seed=7)
    seq = np.frombuffer(b"ACGTNACGT", dtype=np.uint8)
    out = a.seq(seq)
    # permutation: same input base -> same output base, N fixed
    assert out[4] == ord("N")
    assert (out[:4] == out[5:]).all()
    assert sorted(out[:4]) == sorted(b"ACGT")
    # qnames memoized
    assert a.qname("r1") == a.qname("r1") != a.qname("r2")


def test_build_testcase_structure(ref_tests, tmp_path):
    td = ref_tests / "resources/testcases/test_giab_12"
    prefix = build_testcase(
        tmp_path / "cap",
        "1:1079",
        td / "candidates.vcf",
        td / "ref.fa",
        {"index": td / "index.bam"},
        scenario_path=td / "scenario.yaml",
        anonymize=True,
    )
    for f in ("testcase.yaml", "candidates.vcf", "ref.fa", "index.bam", "scenario.yaml"):
        assert (prefix / f).exists(), f
    # sliced BAM readable, non-empty, coordinates inside excised window
    bam = BamReader(prefix / "index.bam")
    assert len(bam) > 50
    assert all(r.pos >= 0 for r in bam)
    # candidate parses with the anonymized alleles
    recs = list(open_variant_file(prefix / "candidates.vcf"))
    assert len(recs) == 1
    assert len(recs[0].alts[0]) == 4  # ins of 3 preserved under permutation
    # runner can load the yaml
    from varlociraptor_tpu.testcase import Testcase

    tc = Testcase(prefix)
    assert tc.sample_names == ["index"]
