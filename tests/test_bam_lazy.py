"""Indexed streaming BAM access (BAI/CSI): lazy fetches must equal the
eager reader while touching only the blocks the region needs
(sample.rs:96-139 RecordBuffer semantics at genome scale)."""

import filecmp
import random

import pytest

from varlociraptor_tpu.io.bam import BamReader
from varlociraptor_tpu.io.bam_index import BamIndex

TUMOR = "/root/reference/tests/resources/tumor-first30000.bam"


def test_csi_index_parses():
    idx = BamIndex.load(TUMOR)
    assert idx is not None
    assert idx.chunks(0, 50000, 60000)
    assert idx.chunks(3, 0, 10**6) == []  # no reads on that contig


def test_lazy_fetch_equals_eager():
    eager = BamReader(TUMOR, lazy=False)
    lazy = BamReader(TUMOR, lazy=True)
    assert eager.ref_names == lazy.ref_names
    rng = random.Random(7)
    for _ in range(15):
        s = rng.randint(49000, 128000)
        e = s + rng.randint(50, 5000)
        a = sorted((r.qname, r.pos, r.flag) for r in eager.fetch("chr10", s, e))
        b = sorted((r.qname, r.pos, r.flag) for r in lazy.fetch("chr10", s, e))
        assert a == b
    assert lazy.fetch("chr10", 0, 100) == []


def test_lazy_touches_only_needed_blocks():
    lazy = BamReader(TUMOR, lazy=True)
    n_header_blocks = len(lazy._block_cache)
    lazy.fetch("chr10", 60000, 60200)
    touched = len(lazy._block_cache) - n_header_blocks
    # index granularity is the 16kb bin (htslib behaves identically): a
    # 200bp window decompresses its bin's chunk, a small fraction of the
    # ~120-block file
    assert 0 < touched <= 30, touched


def test_preprocess_through_lazy_reader_identical(tmp_path):
    """The full preprocess pipeline over the lazy reader produces the same
    observation file as the eager path."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from varlociraptor_tpu.calling.preprocess import PreprocessOptions, preprocess

    cand = tmp_path / "cand.vcf"
    cand.write_text(
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr10>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr10\t60001\t.\tC\tT\t.\t.\t.\n"
        "chr10\t61001\t.\tT\tTACG\t.\t.\t.\n"
    )
    outs = {}
    for mode, lazy in (("eager", False), ("lazy", True)):
        out = tmp_path / f"obs.{mode}.jsonl"
        preprocess(
            cand,
            TUMOR,
            "/root/reference/tests/resources/chr10.fa",
            out,
            sample_name="tumor",
            options=PreprocessOptions(),
            bam=BamReader(TUMOR, lazy=lazy),
        )
        outs[mode] = out
    assert filecmp.cmp(outs["eager"], outs["lazy"], shallow=False)


def test_written_index_roundtrip(tmp_path):
    """BamWriter(index=True) writes a BAI our lazy reader uses for region
    fetches identical to the eager scan; huge contigs switch to CSI."""
    from varlociraptor_tpu.io.bam import BamWriter

    src = BamReader(TUMOR, lazy=False)
    records = sorted(src.fetch("chr10", 0, 10**9), key=lambda r: r.pos)
    out = tmp_path / "rt.bam"
    w = BamWriter(out, src.ref_names, src.ref_lengths)
    for r in records:
        w.write_record(r)
    w.close(index=True)
    assert (tmp_path / "rt.bam.bai").exists()

    eager = BamReader(out, lazy=False)
    lazy = BamReader(out, lazy=True)
    assert lazy._index is not None if hasattr(lazy, "_index") else True
    rng = random.Random(3)
    for _ in range(12):
        s = rng.randint(49000, 128000)
        e = s + rng.randint(50, 5000)
        a = sorted((r.qname, r.pos, r.flag) for r in eager.fetch("chr10", s, e))
        b = sorted((r.qname, r.pos, r.flag) for r in lazy.fetch("chr10", s, e))
        assert a == b, (s, e)

    # explicit CSI request parses through the same loader
    w2 = BamWriter(tmp_path / "rt2.bam", src.ref_names, src.ref_lengths)
    for r in records[:500]:
        w2.write_record(r)
    w2.close(index="csi")
    assert (tmp_path / "rt2.bam.csi").exists()
    idx = BamIndex.load(tmp_path / "rt2.bam")
    assert idx is not None and idx.ioffsets[src.tid("chr10")] == []
    lazy2 = BamReader(tmp_path / "rt2.bam", lazy=True)
    got = sorted(
        (r.qname, r.pos) for r in lazy2.fetch("chr10", 50000, 52000)
    )
    want = sorted(
        (r.qname, r.pos)
        for r in records[:500]
        if r.pos < 52000 and r.end_pos > 50000
    )
    assert got == want


def test_csi_loffset_overlap_aware(tmp_path):
    """A long read spanning a 16kb-window boundary lives in a parent bin;
    the next window's leaf-bin loffset must still cover it or CSI chunk
    pruning drops it (regression: loffset was min-vbeg of CONTAINED
    records only)."""
    from varlociraptor_tpu.io.bam import BamReader, BamRecord, BamWriter
    import numpy as np

    def rec(name, pos, seq_len, cigar):
        r = BamRecord.__new__(BamRecord)
        r.qname = name
        r.flag = 0
        r.tid = 0
        r.pos = pos
        r.mapq = 60
        r.cigar = cigar
        r.mtid = -1
        r.mpos = -1
        r.tlen = 0
        r.seq = np.frombuffer(b"A" * seq_len, dtype=np.uint8)
        r.qual = np.full(seq_len, 30, dtype=np.uint8)
        r.tags = {}
        return r

    out = tmp_path / "span.bam"
    w = BamWriter(out, ["chr1"], [1 << 30])  # >= 2^29 -> auto CSI
    # 10kb-spanning read starting in window 0, crossing into window 1
    w.write_record(rec("long", 15000, 100, [(0, 50), (3, 10000), (0, 50)]))
    # short reads in window 1 (leaf bin there)
    for i in range(5):
        w.write_record(rec(f"s{i}", 19000 + i * 10, 100, [(0, 100)]))
    w.close(index=True)
    assert (tmp_path / "span.bam.csi").exists()

    eager = BamReader(out, lazy=False)
    lazy = BamReader(out, lazy=True)
    for s, e in ((20000, 21000), (19000, 19500), (24000, 25500)):
        a = sorted(r.qname for r in eager.fetch("chr1", s, e))
        b = sorted(r.qname for r in lazy.fetch("chr1", s, e))
        assert a == b, (s, e, a, b)
    assert "long" in [r.qname for r in lazy.fetch("chr1", 20000, 21000)]
