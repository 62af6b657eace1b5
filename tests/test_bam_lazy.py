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
