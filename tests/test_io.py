import numpy as np

from varlociraptor_tpu.io import BamReader, FastaBuffer, VcfReader
from varlociraptor_tpu.io.fasta import seq_to_str


def test_fasta_chr17(ref_tests):
    fb = FastaBuffer(ref_tests / "chr17.prefix.fa")
    # contig is named "17" in this FASTA
    assert "17" in fb.contigs()
    seq = fb.seq("17")
    assert len(seq) == fb.contig_length("17")
    sub = fb.fetch("17", 1000, 1020)
    assert len(sub) == 20
    assert set(seq_to_str(sub)) <= set("ACGTN")


def test_fasta_inline_roundtrip(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">c1 desc\nacgt\nACGTAC\n>c2\nGGG\n")
    fb = FastaBuffer(fa)
    assert fb.contigs() == ["c1", "c2"]
    assert seq_to_str(fb.seq("c1")) == "ACGTACGTAC"
    assert seq_to_str(fb.seq("c2")) == "GGG"
    assert fb.contig_length("c1") == 10


def test_bam_reader(ref_tests):
    bam = BamReader(ref_tests / "test.bam")
    assert len(bam) > 0
    rec = bam.records[0]
    assert rec.qname
    assert rec.read_len == len(rec.qual)
    assert rec.mapq <= 255
    # all records on known contigs
    for r in bam.records[:50]:
        if r.tid >= 0:
            assert r.tid < len(bam.ref_names)
    # fetch window returns sorted overlapping records
    contig = bam.ref_names[bam.records[0].tid]
    window = bam.fetch(contig, rec.pos, rec.pos + 1)
    assert any(r.qname == rec.qname for r in window)
    for r in window:
        assert r.end_pos > rec.pos and r.pos < rec.pos + 1


def test_bam_read_pos_cigar(ref_tests):
    bam = BamReader(ref_tests / "test.bam")
    rec = next(r for r in bam if not r.is_unmapped and len(r.cigar) > 0)
    # position before alignment start -> None
    assert rec.read_pos(rec.pos - 1) is None
    qpos = rec.read_pos(rec.pos)
    assert qpos is not None
    assert 0 <= qpos < rec.read_len
    assert rec.cigar_string()


def test_bam_testcase_bams(ref_resources):
    bam = BamReader(ref_resources / "testcases" / "test01" / "tumor.bam")
    assert len(bam) > 0
    for r in bam:
        assert len(r.seq) == len(r.qual)
        assert np.all((r.qual <= 93) | (r.qual == 0xFF))


def test_vcf_reader(ref_resources):
    vcf = VcfReader(ref_resources / "testcases" / "test01" / "candidates.vcf")
    recs = vcf.records()
    assert len(recs) >= 1
    r = recs[0]
    assert r.chrom
    assert r.ref
    assert len(r.alts) >= 1


def test_vcf_writer_roundtrip(tmp_path):
    from varlociraptor_tpu.io.vcf import VcfRecord, VcfWriter

    out = tmp_path / "out.vcf"
    rec = VcfRecord(
        chrom="chr1",
        pos=99,
        id=".",
        ref="A",
        alts=["T"],
        info={"PROB_ABSENT": 1.25, "SVLEN": [5]},
        format=["DP", "AF"],
        samples=[{"DP": "10", "AF": "0.5"}],
    )
    with VcfWriter(out, sample_names=["s1"]) as w:
        w.write(rec)
    back = VcfReader(out).records()
    assert len(back) == 1
    b = back[0]
    assert b.pos == 99 and b.ref == "A" and b.alts == ["T"]
    assert float(b.info["PROB_ABSENT"]) == 1.25
    assert b.samples[0]["DP"] == "10"


def test_bcf_writer_roundtrip(ref_tests, tmp_path):
    from varlociraptor_tpu.io.bcf import BcfReader, BcfWriter

    src = BcfReader(ref_tests / "resources/test_fdr_local2/calls.matched.bcf")
    recs = src.records()
    out = tmp_path / "rt.bcf"
    with BcfWriter(out, sample_names=src.sample_names, header_lines=src.header_lines) as w:
        for r in recs:
            w.write(r)
    back = BcfReader(out).records()
    assert len(back) == len(recs)
    for a, b in zip(recs, back):
        assert (a.chrom, a.pos, a.ref, tuple(a.alts)) == (b.chrom, b.pos, b.ref, tuple(b.alts))


def test_bcf_writer_honors_idx_attributes(tmp_path):
    """Header lines carrying explicit IDX= (htslib non-contiguous
    dictionaries) must key INFO values by IDX, not appearance order —
    conformant readers (incl. our BcfReader) resolve by IDX."""
    from varlociraptor_tpu.io.bcf import BcfReader, BcfWriter
    from varlociraptor_tpu.io.vcf import VcfRecord

    header = [
        "##fileformat=VCFv4.2",
        '##FILTER=<ID=PASS,Description="ok",IDX=0>',
        '##contig=<ID=chr1,length=1000,IDX=0>',
        '##INFO=<ID=XX,Number=1,Type=Integer,Description="x",IDX=2>',
        '##INFO=<ID=YY,Number=1,Type=Integer,Description="y",IDX=1>',
    ]
    rec = VcfRecord(
        chrom="chr1", pos=100, id=".", ref="A", alts=["T"],
        qual=None, filter="PASS", info={"XX": "7", "YY": "9"}, samples=[],
    )
    out = tmp_path / "idx.bcf"
    with BcfWriter(out, header_lines=header) as w:
        w.write(rec)
    back = BcfReader(out).records()
    assert back[0].info_get("XX") in ("7", 7)
    assert back[0].info_get("YY") in ("9", 9)


def test_bcf_writer_wide_format_integers(tmp_path):
    """FORMAT Integer values beyond int16 must widen, not crash."""
    from varlociraptor_tpu.io.bcf import BcfReader, BcfWriter
    from varlociraptor_tpu.io.vcf import VcfRecord

    header = [
        "##fileformat=VCFv4.2",
        '##contig=<ID=chr1,length=1000>',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="depth">',
    ]
    rec = VcfRecord(
        chrom="chr1", pos=5, id=".", ref="A", alts=["T"], qual=None,
        filter=".", info={}, samples=[{"DP": "40000"}], format=["DP"],
    )
    out = tmp_path / "wide.bcf"
    with BcfWriter(out, sample_names=["s"], header_lines=header) as w:
        w.write(rec)
    back = BcfReader(out).records()
    assert str(back[0].samples[0].get("DP")) == "40000"
