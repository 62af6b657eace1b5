#!/usr/bin/env python
"""Preprocess throughput on REALISTIC reads.

The repo's historical preprocess benchmark (scripts/bench_preprocess.py)
uses the reference snapshot's `tumor-first30000.bam`, whose read SEQUENCES
are anonymized/scrambled (~70 mismatches per 100 bp against chr10.fa).
Every realignment there runs at a near-maximal edit band (Myers dist ~40
on 100 bp reads), which is the pathological worst case for the banded
pair-HMM and banded edit-distance kernels — real libraries align with
0-5 edits.  This benchmark simulates a proper 35x paired-end library
from chr10.fa (0.3% base error, 5% of reads carrying a 1-3 bp indel,
N(350, 50) insert size), writes it with our BamWriter, and times the
same preprocess pipeline on SNV / deletion / insertion candidate sets.

Usage: python scripts/bench_preprocess_real.py [N] [--workers K] [--kind snv|del|ins|mix]
"""

import sys
import tempfile
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from varlociraptor_tpu.utils.jaxcache import enable as _exc  # noqa: E402

_exc()

RES = Path("/root/reference/tests/resources")
REGION = (50000, 126000)  # chr10.fa snapshot holds 129,681 bases
READ_LEN = 100
COVERAGE = 35.0
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def simulate_bam(out_path, ref_seq, rng):
    """Sorted paired-end BAM over REGION at ~COVERAGE."""
    from varlociraptor_tpu.io.bam import BamRecord, BamWriter

    start, end = REGION
    max_start = min(end + 400, len(ref_seq) - READ_LEN - 8)
    n_pairs = int((end - start) * COVERAGE / (2 * READ_LEN))
    records = []
    for k in range(n_pairs):
        isize = max(2 * READ_LEN + 10, int(rng.normal(350.0, 50.0)))
        fstart = int(rng.integers(start - 400, max_start - isize))
        p1, p2 = fstart, fstart + isize - READ_LEN

        def make_read(pos, reverse, qn, mate_pos, first):
            seq = np.array(ref_seq[pos : pos + READ_LEN], dtype=np.uint8).copy()
            cigar = [(0, READ_LEN)]
            # 5% of reads carry a short indel
            if rng.random() < 0.05:
                ln = int(rng.integers(1, 4))
                at = int(rng.integers(20, READ_LEN - 20))
                if rng.random() < 0.5:  # deletion vs reference
                    tail = np.array(
                        ref_seq[pos + at + ln : pos + READ_LEN + ln], dtype=np.uint8
                    )
                    seq = np.concatenate([seq[:at], tail])[:READ_LEN]
                    cigar = [(0, at), (2, ln), (0, READ_LEN - at)]
                else:  # insertion
                    ins = rng.choice(BASES, size=ln)
                    seq = np.concatenate([seq[:at], ins, seq[at:]])[:READ_LEN]
                    cigar = [(0, at), (1, ln), (0, READ_LEN - at - ln)]
            # base errors
            nerr = rng.binomial(READ_LEN, 0.003)
            for _ in range(nerr):
                seq[int(rng.integers(0, READ_LEN))] = rng.choice(BASES)
            flag = 0x1 | 0x2 | (0x10 if reverse else 0x20)
            flag |= 0x40 if first else 0x80
            qual = np.clip(rng.normal(36, 3, READ_LEN), 10, 41).astype(np.uint8)
            return BamRecord(
                qname=qn, flag=flag, tid=0, pos=pos, mapq=60,
                cigar=cigar, mtid=0, mpos=mate_pos,
                tlen=isize if not reverse else -isize,
                seq=np.ascontiguousarray(seq), qual=qual, tags={},
            )

        qn = f"frag{k}"
        records.append(make_read(p1, False, qn, p2, True))
        records.append(make_read(p2, True, qn, p1, False))
    records.sort(key=lambda r: r.pos)
    w = BamWriter(out_path, ["chr10"], [135374737])
    for r in records:
        w.write_record(r)
    w.close(index=True)
    return len(records)


def make_candidates(kind, n, path, ref_seq):
    alt_of = {"A": "G", "C": "T", "G": "A", "T": "C"}
    start, end = REGION[0] + 200, REGION[1] - 200
    step = max(1, (end - start) // n)
    written = 0
    pos = start
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n##contig=<ID=chr10,length=135374737>\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        while written < n and pos < end:
            rb = chr(ref_seq[pos])
            if rb not in alt_of:
                pos += 1
                continue
            k = kind if kind != "mix" else ("snv" if written % 10 < 8 else ("del" if written % 10 == 8 else "ins"))
            if k == "snv":
                f.write(f"chr10\t{pos + 1}\t.\t{rb}\t{alt_of[rb]}\t.\t.\t.\n")
            elif k == "del":
                dr = "".join(chr(b) for b in ref_seq[pos : pos + 4])
                f.write(f"chr10\t{pos + 1}\t.\t{dr}\t{rb}\t.\t.\t.\n")
            else:
                f.write(f"chr10\t{pos + 1}\t.\t{rb}\t{rb}ACT\t.\t.\t.\n")
            written += 1
            pos += step
    return written


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3000
    workers = 1
    if "--workers" in sys.argv:
        workers = int(sys.argv[sys.argv.index("--workers") + 1])
    kind = "mix"
    if "--kind" in sys.argv:
        kind = sys.argv[sys.argv.index("--kind") + 1]

    from varlociraptor_tpu.calling.preprocess import PreprocessOptions, preprocess
    from varlociraptor_tpu.io.fasta import FastaBuffer

    rng = np.random.default_rng(4242)
    tmp = Path(tempfile.mkdtemp(prefix="vlt-benchreal-"))
    ref = FastaBuffer(RES / "chr10.fa")
    seq = ref.seq("chr10")
    t0 = time.perf_counter()
    nrec = simulate_bam(tmp / "real.bam", seq, rng)
    print(f"simulated {nrec} reads in {time.perf_counter() - t0:.1f}s -> {tmp}/real.bam")

    cand = tmp / "cand.vcf"
    nw = make_candidates(kind, n, cand, seq)
    out = tmp / "obs.jsonl"
    opts = PreprocessOptions(n_workers=workers)
    t0 = time.perf_counter()
    count = preprocess(
        cand, tmp / "real.bam", RES / "chr10.fa", out,
        sample_name="tumor", options=opts,
    )
    dt = time.perf_counter() - t0
    print(
        f"REAL-READS preprocess [{kind}]: {count}/{nw} loci in {dt:.1f}s "
        f"-> {dt / max(count, 1) * 1000:.2f} ms/locus ({workers} workers)"
    )


if __name__ == "__main__":
    main()
