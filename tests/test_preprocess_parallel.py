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
    return [json.loads(line) for line in open(out).read().splitlines()[1:]]


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
