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
