"""Fast and homopolymer pair-HMM mode tests."""

import math

import numpy as np
import pytest

from varlociraptor_tpu.estimation.alignment_properties import GapParams, HopParams
from varlociraptor_tpu.evidence.edit_distance import semiglobal_edit
from varlociraptor_tpu.evidence.realignment import path_score
from varlociraptor_tpu.ops.pairhmm import BatchedPairHMM


def test_path_score_close_to_forward_on_clean_match():
    hmm = BatchedPairHMM(GapParams())
    allele = b"ACGTACGTACGTACGT"
    read = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    quals = np.full(8, 40, dtype=np.uint8)
    fwd = hmm.forward([allele], [read], [quals])[0]
    _, _, ops = semiglobal_edit(allele, read)
    fast = path_score(ops, read, quals, hmm.gap)
    # single dominant path: fast score within ~1 log of full forward
    assert fast <= fwd + 1e-6
    assert fwd - fast < 2.5  # forward sums extra placements


def test_path_score_ranks_alleles_like_forward():
    hmm = BatchedPairHMM(GapParams())
    allele_ref = b"AAAACCCCGGGGTTTT"
    allele_alt = b"AAAACCCTGGGGTTTT"
    read = np.frombuffer(b"ACCCTGGG", dtype=np.uint8)
    quals = np.full(8, 30, dtype=np.uint8)
    scores = []
    for a in (allele_ref, allele_alt):
        _, _, ops = semiglobal_edit(a, read)
        scores.append(path_score(ops, read, quals, hmm.gap))
    assert scores[1] > scores[0]


def test_homopolymer_mode_softens_homopolymer_gaps():
    # hop probs make an extra A in a poly-A run much cheaper
    hop = HopParams(
        prob_seq_homopolymer=[math.log(0.01)] * 4,
        prob_ref_homopolymer=[math.log(0.01)] * 4,
        prob_seq_extend_homopolymer=[math.log(0.01)] * 4,
        prob_ref_extend_homopolymer=[math.log(0.01)] * 4,
    )
    exact = BatchedPairHMM(GapParams())
    hp = BatchedPairHMM(GapParams(), hop_params=hop, mode="homopolymer")
    allele = b"CCGGAAAAAATTCC"
    read = np.frombuffer(b"GGAAAAAAATT", dtype=np.uint8)  # one extra A
    quals = np.full(len(read), 35, dtype=np.uint8)
    p_exact = exact.forward([allele], [read], [quals])[0]
    p_hp = hp.forward([allele], [read], [quals])[0]
    assert p_hp > p_exact + 3  # homopolymer insertion far less penalized
