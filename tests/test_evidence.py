import math

import numpy as np
import pytest

from varlociraptor_tpu.estimation.alignment_properties import (
    AlignmentProperties,
    InsertSize,
    estimate,
)
from varlociraptor_tpu.evidence.extraction import extract_observations
from varlociraptor_tpu.evidence.observation import (
    ObservationBatch,
    Pileup,
    ReadObservation,
    adjust_singleton_evidence,
    expected_depth,
    pileup_to_arrays,
)
from varlociraptor_tpu.evidence.variants import Snv, prob_read_base
from varlociraptor_tpu.io import BamReader, FastaBuffer


@pytest.fixture(scope="module")
def test_bam(ref_tests):
    return BamReader(ref_tests / "test.bam")


@pytest.fixture(scope="module")
def chr17(ref_tests):
    return FastaBuffer(ref_tests / "chr17.prefix.fa")


def test_prob_read_base():
    # matching base: log(1 - 10^(-q/10))
    q = 30
    assert prob_read_base(ord("A"), ord("A"), q) == pytest.approx(
        math.log(1 - 10 ** (-3.0)), rel=1e-6
    )
    # mismatch: miscall * 1/3
    assert prob_read_base(ord("A"), ord("C"), q) == pytest.approx(
        math.log(10 ** (-3.0) * 0.3333), rel=1e-6
    )
    # N: flat 1/4
    assert prob_read_base(ord("N"), ord("C"), q) == pytest.approx(math.log(0.25))


def test_alignment_properties_json_roundtrip():
    text = '{"insert_size":{"mean":312.0,"sd":11.89254089203071},"max_del_cigar_len":30,"max_ins_cigar_len":12,"frac_max_softclip":0.69}'
    props = AlignmentProperties.from_json(text)
    assert props.insert_size.mean == 312.0
    assert props.max_del_cigar_len == 30
    assert props.max_mapq == 60  # backward-compat default
    back = AlignmentProperties.from_json(props.to_json())
    assert back.insert_size.sd == props.insert_size.sd


def test_estimate_alignment_properties(test_bam):
    props = estimate(test_bam)
    assert props.max_read_len > 0
    assert props.max_mapq > 0


def test_snv_pileup_extraction(test_bam, chr17):
    props = estimate(test_bam)
    if props.insert_size is None:
        props.insert_size = InsertSize(mean=312.0, sd=15.0)
    ref = chr17.seq("17")
    # find a covered position inside the FASTA prefix
    rec = next(r for r in test_bam if not r.is_unmapped and r.end_pos < len(ref))
    pos = (rec.pos + rec.end_pos) // 2
    ref_base = int(ref[pos])
    alt_base = ord("A") if ref_base != ord("A") else ord("C")
    snv = Snv("17", pos, ref_base, alt_base)
    pileup = extract_observations(snv, test_bam, props, max_depth=200)
    assert len(pileup.read_observations) > 0
    for o in pileup.read_observations:
        assert o.prob_alt <= 0.0 and o.prob_ref <= 0.0
        assert o.eff_prob_mapping() <= 0.0
        # most reads should support ref at an arbitrary locus
    n_ref = sum(1 for o in pileup.read_observations if o.prob_ref > o.prob_alt)
    assert n_ref >= len(pileup.read_observations) * 0.5
    assert expected_depth(pileup.read_observations) > 0


def test_subsampling_caps_depth(test_bam, chr17):
    props = estimate(test_bam)
    ref = chr17.seq("17")
    rec = next(r for r in test_bam if not r.is_unmapped and r.end_pos < len(ref))
    pos = (rec.pos + rec.end_pos) // 2
    ref_base = int(ref[pos])
    snv = Snv("17", pos, ref_base, ord("A") if ref_base != ord("A") else ord("C"))
    full = extract_observations(snv, test_bam, props, max_depth=10000)
    capped = extract_observations(snv, test_bam, props, max_depth=5)
    if len(full.read_observations) > 5:
        assert len(capped.read_observations) < len(full.read_observations)


def test_singleton_adjustment():
    p = Pileup(
        read_observations=[
            ReadObservation(prob_alt=-0.1, prob_ref=-3.0),
            ReadObservation(prob_alt=-3.0, prob_ref=-0.1),
        ]
    )
    assert adjust_singleton_evidence([p])
    o = p.read_observations[0]
    assert o.eff_prob_alt() == pytest.approx(math.log(0.5))
    assert o.eff_prob_ref() == pytest.approx(math.log(0.5))


def test_observation_batch_collation():
    obs = ReadObservation(prob_alt=-0.5, prob_ref=-2.0, prob_mapping=-0.001)
    p = Pileup(read_observations=[obs] * 3)
    batch = ObservationBatch.collate([[p], [Pileup()]], depth=8)
    assert batch.features.shape == (2, 1, 8, len(batch.features[0, 0, 0]))
    assert batch.mask[0, 0].sum() == 3
    assert batch.mask[1, 0].sum() == 0
    feats, mask = pileup_to_arrays(p, 4)
    np.testing.assert_allclose(feats[0, 2], -0.5, rtol=1e-6)


def test_homopolymer_indel_operation_reference_cases():
    """utils/homopolymers.rs:233-280 — the reference's six alignment cases."""
    import numpy as np

    from varlociraptor_tpu.evidence.edit_distance import (
        I,
        M,
        homopolymer_indel_operation,
    )

    A = lambda s: np.frombuffer(s, dtype=np.uint8)  # noqa: E731
    cases = [
        (b"ACGT", b"ACCGT", [M, M, I, M, M], False),
        (b"ACGT", b"ACCGT", [M, I, M, M, M], False),
        (b"GTTA", b"GTTTA", [M, I, M, M, M], True),
        (b"GTTA", b"GTTTA", [M, M, I, M, M], True),
        (b"GTTA", b"GTTTA", [M, M, M, I, M], True),
        (b"ACGT", b"ACGTT", [M, M, M, M, I], False),
    ]
    for text, pat, ops, expect_some in cases:
        r = homopolymer_indel_operation(A(text), A(pat), ops)
        assert (r is not None) == expect_some, (text, pat, ops, r)


def test_record_replay_batching_matches_direct(ref_resources):
    """The batched record/replay realignment path must produce observations
    identical to direct per-read dispatch (same forward-call alignment)."""
    import re

    from varlociraptor_tpu.estimation.alignment_properties import (
        AlignmentProperties,
    )
    from varlociraptor_tpu.evidence import extraction
    from varlociraptor_tpu.evidence.extraction import extract_observations
    from varlociraptor_tpu.evidence.indels import Insertion
    from varlociraptor_tpu.evidence.realignment import Realigner
    from varlociraptor_tpu.io.bam import BamReader
    from varlociraptor_tpu.io.fasta import FastaBuffer

    td = ref_resources / "testcases/test_giab_12"
    yaml_text = (td / "testcase.yaml").read_text()
    props = AlignmentProperties.from_json(
        re.search(r"properties: '(.*?)'", yaml_text).group(1)
    )
    ref = FastaBuffer(td / "ref.fa")
    bam = BamReader(td / "index.bam")

    def run(batched):
        r = Realigner(reference=ref, props=props, indel_window=64, max_window=64)
        v = Insertion("1", 1078, b"CCT", r)
        if not batched:
            # disable batching (and the scout hit-prefetch pass) so every
            # forward computes directly at the call site
            r.begin_scout = lambda: None
            r.flush_scout = lambda: None
            r.run_batch = lambda: None
            r.end_batch = lambda: None
        p = extract_observations(v, bam, props, max_depth=200)
        return [(o.prob_ref, o.prob_alt, o.strand) for o in p.read_observations]

    a = run(batched=True)
    b = run(batched=False)
    assert len(a) == len(b) > 50
    for (r1, a1, s1), (r2, a2, s2) in zip(a, b):
        assert abs(r1 - r2) < 1e-9 and abs(a1 - a2) < 1e-9 and s1 == s2


def test_read_pos_full_skips_leading_hardclip():
    """A supplementary split read with CIGAR 10H 20S 100M: the softclip is
    still LEADING (rust-htslib read_pos skips index-0 hardclips), so query
    positions must be computed accordingly."""
    import numpy as np

    from varlociraptor_tpu.evidence.realignment import read_pos_full
    from varlociraptor_tpu.io.bam import BamRecord, OP_H, OP_M, OP_S

    rec = BamRecord.__new__(BamRecord)
    rec.pos = 1000
    rec.cigar = [(OP_H, 10), (OP_S, 20), (OP_M, 100)]
    # inside the match: query = 20 softclip bases + offset
    assert read_pos_full(rec, 1005) == 25
    # inside the (leading) softclip, projected before pos
    assert read_pos_full(rec, 990) == 10
    assert read_pos_full(rec, 979) is None
