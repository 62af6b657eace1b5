"""Pair-HMM kernel tests against a brute-force numpy forward DP."""

import math

import numpy as np
import pytest

from varlociraptor_tpu.estimation.alignment_properties import GapParams
from varlociraptor_tpu.ops.pairhmm import BatchedPairHMM

LOG0 = -1e30


def brute_force_forward(allele, read, quals, gap):
    """O(XY) reference implementation of the same model."""
    t_mi, t_md, t_ii, t_dd = gap
    t_mm = math.log(1.0 - math.exp(t_mi) - math.exp(t_md))
    t_im = math.log(1.0 - math.exp(t_ii))
    t_dm = math.log(1.0 - math.exp(t_dd))
    X, Y = len(allele), len(read)
    mis = [-int(q) * math.log(10) / 10 for q in quals]
    noc = [math.log1p(-math.exp(m)) for m in mis]

    def lse(*xs):
        m = max(xs)
        if m <= LOG0 / 2:
            return LOG0
        return m + math.log(sum(math.exp(x - m) for x in xs))

    def e_m(i, j):
        if chr(read[j]).upper() == "N":
            return math.log(0.25)
        if chr(allele[i]).upper() == chr(read[j]).upper():
            return noc[j]
        return mis[j] + math.log(0.3333)

    M = np.full((X + 1, Y + 1), LOG0)
    D = np.full((X + 1, Y + 1), LOG0)
    I = np.full((X + 1, Y + 1), LOG0)
    for i in range(0, X + 1):
        for j in range(1, Y + 1):
            if i >= 1:
                start = 0.0 if j == 1 else LOG0
                M[i, j] = e_m(i - 1, j - 1) + lse(
                    t_mm + M[i - 1, j - 1],
                    t_dm + D[i - 1, j - 1],
                    t_im + I[i - 1, j - 1],
                    start,
                )
                D[i, j] = lse(t_md + M[i - 1, j], t_dd + D[i - 1, j])
            start_i = t_mi if j == 1 else LOG0
            I[i, j] = mis[j - 1] + lse(t_mi + M[i, j - 1], t_ii + I[i, j - 1], start_i)
    return lse(*(lse(M[i, Y], I[i, Y]) for i in range(X + 1)))


@pytest.fixture(scope="module")
def hmm():
    return BatchedPairHMM(GapParams())


def gap_array(hmm):
    return [float(x) for x in hmm.gap]


def test_perfect_match(hmm):
    allele = b"ACGTACGTACGTACGT"
    read = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    quals = np.full(8, 40, dtype=np.uint8)
    out = hmm.forward([allele], [read], [quals])[0]
    bf = brute_force_forward(allele, read, quals, gap_array(hmm))
    assert out == pytest.approx(bf, rel=1e-4, abs=1e-4)
    # perfect match in several positions: prob close to number_of_positions * prod(1-miscall)
    assert out > math.log(0.99) + math.log(1)  # at least one perfect placement


def test_mismatch_vs_match(hmm):
    allele_ref = b"AAAACCCCGGGGTTTT"
    allele_alt = b"AAAACCCTGGGGTTTT"
    read = np.frombuffer(b"ACCCTGGG", dtype=np.uint8)
    quals = np.full(8, 30, dtype=np.uint8)
    out = hmm.forward([allele_ref, allele_alt], [read] * 2, [quals] * 2)
    assert out[1] > out[0]  # read matches alt allele better
    for i, allele in enumerate([allele_ref, allele_alt]):
        bf = brute_force_forward(allele, read, quals, gap_array(hmm))
        assert out[i] == pytest.approx(bf, rel=1e-3, abs=1e-3)


def test_deletion_read(hmm):
    # read skips 2 bases of the allele (deletion in read)
    allele = b"ACGTACGTAAGGCCTTACGT"
    read = np.frombuffer(b"ACGTAAGGTTACGT", dtype=np.uint8)  # CC deleted
    quals = np.full(len(read), 35, dtype=np.uint8)
    out = hmm.forward([allele], [read], [quals])[0]
    bf = brute_force_forward(allele, read, quals, gap_array(hmm))
    assert out == pytest.approx(bf, rel=1e-3, abs=1e-3)


def test_insertion_read(hmm):
    allele = b"ACGTACGTACGT"
    read = np.frombuffer(b"ACGTTTACGT", dtype=np.uint8)  # TT inserted
    quals = np.full(len(read), 35, dtype=np.uint8)
    out = hmm.forward([allele], [read], [quals])[0]
    bf = brute_force_forward(allele, read, quals, gap_array(hmm))
    assert out == pytest.approx(bf, rel=1e-3, abs=1e-3)


def test_random_batch_matches_bruteforce(hmm):
    rng = np.random.default_rng(7)
    alleles, reads, quals = [], [], []
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for _ in range(6):
        x = rng.integers(10, 40)
        y = rng.integers(5, 20)
        alleles.append(bytes(rng.choice(bases, x)))
        reads.append(rng.choice(bases, y))
        quals.append(rng.integers(10, 40, y).astype(np.uint8))
    out = hmm.forward(alleles, reads, quals)
    for i in range(len(alleles)):
        bf = brute_force_forward(alleles[i], reads[i], quals[i], gap_array(hmm))
        assert out[i] == pytest.approx(bf, rel=1e-3, abs=2e-3), f"item {i}"
