

def test_chi_squared_sample_size_bound():
    """alignment_properties.rs:466-533: fpc bound saturates at the BAM's
    mapped count for the hardcoded relative precision; estimate() pulls the
    mapped total from the index metadata pseudo-bin."""
    from varlociraptor_tpu.estimation.alignment_properties import (
        min_alignments_for_hphmm_mle,
    )
    from varlociraptor_tpu.io.bam_index import BamIndex

    assert min_alignments_for_hphmm_mle(30000) == 30000
    assert min_alignments_for_hphmm_mle(None) > 10**12  # non-fpc: scan all
    # coarser precision: the bound actually bites
    assert 0 < min_alignments_for_hphmm_mle(
        10**9, precision=0.5, precision_is_relative=True
    ) < 10**6
    idx = BamIndex.load(
        "/root/reference/tests/resources/tumor-first30000.bam"
    )
    assert idx is not None and idx.mapped_total() == 29972
