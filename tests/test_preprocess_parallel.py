"""Parallel / chunked preprocess must reproduce the serial output.

The n_workers path shards the candidate list at locus/haplotype-safe
boundaries into worker processes (the reference ecosystem's region-sharding
pattern); device_chunk concatenates the pair-HMM forwards of many loci into
one device call. Both must produce record-for-record identical observation
files on data where the alignment-property ratchet does not diverge.
"""

import json
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

RES = Path("/root/reference/tests/resources")

pytestmark = pytest.mark.skipif(
    not (RES / "tumor-first30000.bam").exists(), reason="reference BAM missing"
)


def _run(tmp, tag, **opts):
    from bench_preprocess import make_candidates
    from varlociraptor_tpu.calling.preprocess import PreprocessOptions, preprocess

    cand = tmp / "cand.vcf"
    if not cand.exists():
        make_candidates(120, cand)
    out = tmp / f"obs-{tag}.jsonl"
    preprocess(
        cand,
        RES / "tumor-first30000.bam",
        RES / "chr10.fa",
        out,
        sample_name="t",
        options=PreprocessOptions(log_mode="silent", **opts),
    )
    from varlociraptor_tpu.calling.observations import (
        ObservationReader,
        obs_to_dict,
    )

    return [
        (
            (v.chrom, v.pos, v.ref_allele, v.alt_allele, v.kind),
            [obs_to_dict(o) for o in p.read_observations],
        )
        for v, p in ObservationReader(out)
    ]


@pytest.fixture(scope="module")
def outputs():
    tmp = Path(tempfile.mkdtemp(prefix="vlt-partest-"))
    serial = _run(tmp, "serial")
    workers = _run(tmp, "workers", n_workers=2)
    chunked = _run(tmp, "chunk", device_chunk=16)
    return serial, workers, chunked


def test_parallel_matches_serial(outputs):
    serial, workers, _ = outputs
    assert len(serial) == len(workers)
    assert serial == workers


def test_chunked_matches_serial(outputs):
    serial, _, chunked = outputs
    assert len(serial) == len(chunked)
    assert serial == chunked


def test_fragment_ids_chunked_across_contigs(tmp_path):
    """device_chunk must flush pending loci BEFORE the per-contig
    fragment-id map resets at a contig boundary (ids are per-contig,
    fragment_id_factory.rs:6-25): chunked ids == serial ids."""
    import numpy as np

    from varlociraptor_tpu.calling.preprocess import PreprocessOptions, preprocess
    from varlociraptor_tpu.calling.ref_obs import open_observations
    from varlociraptor_tpu.io.bam import BamRecord, BamWriter

    rng = np.random.default_rng(3)
    ref_len = 3000
    seqs = {c: rng.choice(np.frombuffer(b"ACGT", np.uint8), ref_len) for c in ("c1", "c2")}
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as f:
        for c, s in seqs.items():
            f.write(f">{c}\n{bytes(s).decode()}\n")

    bam = tmp_path / "two.bam"
    w = BamWriter(bam, ["c1", "c2"], [ref_len, ref_len])
    qn = 0
    for tid, c in enumerate(("c1", "c2")):
        for pos in range(800, 1400, 25):
            qn += 1
            seq = np.ascontiguousarray(seqs[c][pos : pos + 100])
            w.write_record(
                BamRecord(
                    qname=f"r{qn}", flag=0, tid=tid, pos=pos, mapq=60,
                    cigar=[(0, 100)], mtid=-1, mpos=-1, tlen=0,
                    seq=seq, qual=np.full(100, 30, np.uint8), tags={},
                )
            )
    w.close()

    cand = tmp_path / "cand.vcf"
    with open(cand, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("##contig=<ID=c1>\n##contig=<ID=c2>\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for c in ("c1", "c2"):
            for pos in (1000, 1050, 1100, 1150, 1200):
                refb = chr(seqs[c][pos - 1])
                altb = "A" if refb != "A" else "G"
                f.write(f"{c}\t{pos}\t.\t{refb}\t{altb}\t.\t.\t.\n")

    def run(tag, chunk):
        out = tmp_path / f"obs-{tag}.jsonl"
        preprocess(
            cand, bam, fa, out, sample_name="s",
            options=PreprocessOptions(
                log_mode="silent", report_fragment_ids=True,
                device_chunk=chunk, omit_insert_size=True,
            ),
        )
        ids = []
        reader = open_observations(out)
        for variant, pileup in reader:
            ids.append(
                (variant.chrom, variant.pos,
                 tuple(o.fragment_id for o in pileup.read_observations))
            )
        reader.close()
        return ids

    serial = run("serial", 1)
    chunked = run("chunk", 4)  # chunk spans the c1/c2 boundary
    assert serial == chunked
    assert any(ids for _c, _p, ids in serial)
