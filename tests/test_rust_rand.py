"""rust-rand parity RNG tests (utils/rust_rand.py)."""

import struct

import numpy as np

from varlociraptor_tpu.utils.rust_rand import (
    MASK32,
    ChaCha12,
    StdRng,
    SubsampleCandidates,
    _pcg32_seed_expand,
    _quarter_round,
)


def test_chacha_block_matches_cryptography_lib():
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = bytes(range(32))
    counter = 1
    full_nonce = struct.pack("<4I", counter, 0x09, 0x4A, 0x0)
    ks = Cipher(algorithms.ChaCha20(key, full_nonce), mode=None).encryptor().update(
        b"\x00" * 64
    )
    expected = list(struct.unpack("<16I", ks))

    init = (
        [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
        + list(struct.unpack("<8I", key))
        + [counter, 0x09, 0x4A, 0x0]
    )
    s = init[:]
    for _ in range(10):  # 20 rounds for the ChaCha20 cross-check
        _quarter_round(s, 0, 4, 8, 12)
        _quarter_round(s, 1, 5, 9, 13)
        _quarter_round(s, 2, 6, 10, 14)
        _quarter_round(s, 3, 7, 11, 15)
        _quarter_round(s, 0, 5, 10, 15)
        _quarter_round(s, 1, 6, 11, 12)
        _quarter_round(s, 2, 7, 8, 13)
        _quarter_round(s, 3, 4, 9, 14)
    out = [(x + y) & MASK32 for x, y in zip(s, init)]
    assert out == expected


def test_seed_expand_shape_and_determinism():
    a = _pcg32_seed_expand(48074578)
    b = _pcg32_seed_expand(48074578)
    assert a == b and len(a) == 32
    assert _pcg32_seed_expand(1) != a


def test_uniform_01_range_and_determinism():
    rng = StdRng.seed_from_u64(48074578)
    xs = [rng.gen_uniform_01() for _ in range(1000)]
    assert all(0.0 <= x < 1.0 for x in xs)
    assert abs(np.mean(xs) - 0.5) < 0.05
    rng2 = StdRng.seed_from_u64(48074578)
    assert [rng2.gen_uniform_01() for _ in range(10)] == xs[:10]


def test_subsample_candidates():
    sub = SubsampleCandidates(max_depth=10, depth=5)
    assert all(sub.keep() for _ in range(5))  # no subsampling needed
    sub = SubsampleCandidates(max_depth=200, depth=2000)
    kept = sum(sub.keep() for _ in range(2000))
    assert 150 < kept < 260  # rate ~0.1
