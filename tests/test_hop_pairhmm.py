"""Hop-state homopolymer pair-HMM (HomopolyPairHMM reconstruction).

Checks: (1) the native C++ and the JAX wavefront hop kernels agree;
(2) the hop model reduces to the plain exact kernel when all hop
probabilities are zero; (3) the hop model diverges from the retired
positional-gap approximation in the documented direction (hop runs are
cheaper than positionally-boosted gaps on homopolymer-indel reads).
"""

import math
import os
import random

os.environ["VLT_HOP_STATES"] = "1"  # the hop-state kernel is opt-in

import numpy as np
import pytest

from varlociraptor_tpu.estimation.alignment_properties import GapParams, HopParams
from varlociraptor_tpu.ops.pairhmm import BatchedPairHMM

GAP = GapParams(
    prob_insertion_artifact=math.log(2.8e-6),
    prob_deletion_artifact=math.log(5.1e-6),
    prob_insertion_extend_artifact=float("-inf"),
    prob_deletion_extend_artifact=float("-inf"),
)
HOP = HopParams(
    prob_seq_homopolymer=[math.log(p) for p in (0.01, 0.02, 0.015, 0.005)],
    prob_ref_homopolymer=[math.log(p) for p in (0.008, 0.01, 0.02, 0.004)],
    prob_seq_extend_homopolymer=[math.log(0.3)] * 4,
    prob_ref_extend_homopolymer=[math.log(0.25)] * 4,
)


def _synth(n=24, seed=5):
    random.seed(seed)
    bases = b"ACGT"
    alleles, reads, quals, dists = [], [], [], []
    for t in range(n):
        alen = random.choice([40, 90, 150])
        a = bytearray()
        while len(a) < alen:
            b = random.choice(bases)
            a += bytes([b]) * random.choice([1, 1, 1, 2, 3, 5])
        a = bytes(a[:alen])
        rlen = random.choice([30, 60])
        p = random.randrange(max(1, alen - rlen))
        r = bytearray(a[p : p + rlen])
        for _ in range(random.randrange(3)):
            q = random.randrange(len(r))
            if random.random() < 0.5:
                r.insert(q, r[q])
            else:
                del r[q]
        alleles.append(a)
        reads.append(np.frombuffer(bytes(r), dtype=np.uint8))
        quals.append(np.full(len(r), 30, dtype=np.uint8))
        dists.append(None if t % 3 else 10)
    return alleles, reads, quals, dists


def test_native_matches_jax_hop_kernel():
    alleles, reads, quals, dists = _synth()
    h1 = BatchedPairHMM(GAP, hop_params=HOP, mode="homopolymer")
    h1._use_native = True
    out_native = h1.forward(alleles, reads, quals, dists)
    h2 = BatchedPairHMM(GAP, hop_params=HOP, mode="homopolymer")
    h2._use_native = False
    out_jax = h2.forward(alleles, reads, quals, dists)
    rel = np.abs(out_native - out_jax) / np.maximum(np.abs(out_native), 1.0)
    assert float(rel.max()) < 1e-4  # f32 (jax) vs f64 (native)


def test_zero_hops_reduce_to_exact_kernel():
    alleles, reads, quals, dists = _synth(n=12, seed=9)
    hop0 = HopParams()  # all LOG_ZERO
    hh = BatchedPairHMM(GAP, hop_params=hop0, mode="homopolymer")
    hh._use_native = True
    out_hop = hh.forward(alleles, reads, quals, dists)
    he = BatchedPairHMM(GAP, mode="exact")
    he._use_native = True
    out_exact = he.forward(alleles, reads, quals, dists)
    np.testing.assert_allclose(out_hop, out_exact, rtol=1e-9, atol=1e-9)


def test_hop_vs_positional_divergence_direction():
    """On homopolymer-indel reads the hop model assigns (on average) higher
    probability than the positional-gap approximation: hop runs pay the
    per-base hop rate once plus cheap extensions, while the approximation
    multiplies boosted gap-open costs per event and keeps the miscall
    emission on inserted bases."""
    alleles, reads, quals, dists = _synth(n=40, seed=11)
    h = BatchedPairHMM(GAP, hop_params=HOP, mode="homopolymer")
    h._use_native = True
    out_hop = h.forward(alleles, reads, quals, dists)
    os.environ["VLT_HOP_STATES"] = "0"
    try:
        hp = BatchedPairHMM(GAP, hop_params=HOP, mode="homopolymer")
        hp._use_native = True
        out_pos = hp.forward(alleles, reads, quals, dists)
    finally:
        os.environ["VLT_HOP_STATES"] = "1"
    assert float(np.mean(out_hop - out_pos)) > 0.0
