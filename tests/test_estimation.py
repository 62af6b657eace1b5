"""Alignment-properties estimation parity tests.

Expected values come from the reference's own unit tests
(``/root/reference/src/estimation/alignment_properties.rs:1050-1120``).
"""

import pytest

from varlociraptor_tpu.estimation.alignment_properties import (
    AlignmentProperties,
    estimate,
)
from varlociraptor_tpu.io.bam import BamReader
from varlociraptor_tpu.io.fasta import FastaBuffer


@pytest.fixture(scope="module")
def chr10(ref_resources):
    return FastaBuffer(ref_resources / "chr10.fa")


def test_estimate_alignment_properties(ref_resources, chr10):
    props = estimate(
        BamReader(ref_resources / "tumor-first30000.bam"), reference=chr10
    )
    assert round(props.insert_size.mean) == 312
    assert round(props.insert_size.sd) == 12
    assert props.max_del_cigar_len == 30
    assert props.max_ins_cigar_len == 12
    assert props.frac_max_softclip == pytest.approx(0.63)
    assert props.max_read_len == 100
    # gap params were MLE-estimated (not the defaults)
    assert -12 < props.gap_params.prob_insertion_artifact < -6
    assert -12 < props.gap_params.prob_deletion_artifact < -6
    assert props.gap_params.prob_insertion_extend_artifact < 0
    # wildtype homopolymer model: overwhelmingly error-free; sums to ~1
    # (the reference's denominator only counts entries >= 10, so the sum is
    # close to but not exactly 1, alignment_properties.rs:974-1007)
    model = props.wildtype_homopolymer_error_model
    assert model[0] > 0.99
    assert abs(sum(model.values()) - 1.0) < 1e-2


def test_estimate_alignment_properties_softclip(ref_resources, chr10):
    props = estimate(
        BamReader(ref_resources / "tumor-first30000.reads_with_soft_clips.bam"),
        reference=chr10,
    )
    assert props.insert_size is None
    assert props.max_del_cigar_len == 2
    assert props.max_ins_cigar_len == 4
    assert props.frac_max_softclip == pytest.approx(0.63)


def test_estimate_alignment_properties_single_end(ref_resources, chr10):
    props = estimate(
        BamReader(
            ref_resources / "tumor-first30000.bunch_of_reads_made_single_ended.bam"
        ),
        reference=chr10,
    )
    assert props.insert_size is None
    assert props.max_del_cigar_len is None
    assert props.max_ins_cigar_len is None
    assert props.frac_max_softclip == pytest.approx(0.03)


def test_properties_json_roundtrip(ref_resources, chr10):
    props = estimate(
        BamReader(ref_resources / "tumor-first30000.bam"), reference=chr10
    )
    clone = AlignmentProperties.from_json(props.to_json())
    assert clone.to_json() == props.to_json()
    assert clone.gap_params == props.gap_params
