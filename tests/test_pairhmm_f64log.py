"""The f64 sequential log-space pair-HMM profile (VLT_PAIRHMM_F64LOG).

rust-bio's PairHMM keeps every DP cell as a LogProb and combines
predecessors with per-cell ln_sum_exp; our default native kernel is
rescaled linear-space f64.  docs/calibration_failures.md (round 4) shows
the two profiles agree to <=1e-12 nats — this test locks that equivalence
(and the banding interaction) so the negative result stays reproducible.
"""

import numpy as np
import pytest

from varlociraptor_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_case(rng, xlen, ylen):
    allele = rng.choice(_BASES, size=xlen).tobytes()
    read = rng.choice(_BASES, size=ylen).tobytes()
    mis = np.log(rng.uniform(1e-4, 0.05, size=ylen)).astype(np.float32)
    gap = np.log(
        np.array(
            [
                rng.uniform(1e-5, 1e-3),
                rng.uniform(1e-5, 1e-3),
                rng.uniform(0.01, 0.3),
                rng.uniform(0.01, 0.3),
            ]
        )
    ).astype(np.float32)
    return allele, read, mis, gap


def test_log_profile_matches_linear():
    rng = np.random.default_rng(7)
    alleles, reads, miscalls = [], [], []
    for _ in range(40):
        a, r, m, _ = _rand_case(rng, int(rng.integers(8, 120)), int(rng.integers(4, 90)))
        alleles.append(a)
        reads.append(r)
        miscalls.append(m)
    gap = np.log(np.array([1e-4, 1.2e-4, 0.08, 0.11])).astype(np.float32)
    lin = native.pairhmm_forward_batch(alleles, reads, miscalls, gap)
    logp = native.pairhmm_forward_batch(alleles, reads, miscalls, gap, profile="log")
    assert lin is not None and logp is not None
    np.testing.assert_allclose(logp, lin, rtol=0, atol=1e-10)


def test_log_profile_matches_linear_banded():
    rng = np.random.default_rng(11)
    alleles, reads, miscalls, bands = [], [], [], []
    for _ in range(24):
        a, r, m, _ = _rand_case(rng, int(rng.integers(20, 80)), int(rng.integers(10, 60)))
        alleles.append(a)
        reads.append(r)
        miscalls.append(m)
        bands.append(int(rng.integers(2, 12)))
    gap = np.log(np.array([2e-4, 1e-4, 0.15, 0.09])).astype(np.float32)
    lin = native.pairhmm_forward_batch(alleles, reads, miscalls, gap, max_edit=bands)
    logp = native.pairhmm_forward_batch(
        alleles, reads, miscalls, gap, max_edit=bands, profile="log"
    )
    np.testing.assert_allclose(logp, lin, rtol=0, atol=1e-10)


def test_log_profile_positional_gaps():
    # homopolymer mode: per-base positional gap arrays
    rng = np.random.default_rng(13)
    a, r, m, gap = _rand_case(rng, 50, 30)
    io_ = np.log(rng.uniform(1e-4, 0.02, 30)).astype(np.float32)
    ie = np.log(rng.uniform(0.01, 0.4, 30)).astype(np.float32)
    do = np.log(rng.uniform(1e-4, 0.02, 50)).astype(np.float32)
    de = np.log(rng.uniform(0.01, 0.4, 50)).astype(np.float32)
    kw = dict(ins_open=[io_], ins_ext=[ie], del_open=[do], del_ext=[de])
    lin = native.pairhmm_forward_batch([a], [r], [m], gap, **kw)
    logp = native.pairhmm_forward_batch([a], [r], [m], gap, profile="log", **kw)
    np.testing.assert_allclose(logp, lin, rtol=0, atol=1e-10)


def test_env_flag_plumbs_through(monkeypatch):
    from varlociraptor_tpu.ops import pairhmm as ph

    from varlociraptor_tpu.estimation.alignment_properties import GapParams

    monkeypatch.setenv("VLT_NATIVE_PAIRHMM", "1")
    monkeypatch.setenv("VLT_PAIRHMM_F64LOG", "1")
    hmm = ph.BatchedPairHMM(GapParams())
    a = [b"ACGTACGTACGT"]
    reads = [b"ACGTACGAACGT"]
    quals = [np.full(12, 30, np.uint8)]
    out1 = np.asarray(hmm.forward(a, reads, quals))
    monkeypatch.delenv("VLT_PAIRHMM_F64LOG")
    hmm2 = ph.BatchedPairHMM(GapParams())
    out2 = np.asarray(hmm2.forward(a, reads, quals))
    np.testing.assert_allclose(out1, out2, atol=1e-9)
