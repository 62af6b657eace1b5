"""Pallas column-recurrence pair-HMM kernel (ops/pallas_pairhmm.py) vs the
general anti-diagonal wavefront kernel, in interpreter mode (no TPU in CI).

The zero-extension model (reference GapParams defaults) collapses the
three-state semiglobal DP to a single-state column recurrence; this asserts
the collapse is exact (up to f32) against the independent log-space kernel.
"""

import math
import random

import numpy as np
import pytest

from varlociraptor_tpu.ops.pairhmm import NEG_INF, _forward_impl
from varlociraptor_tpu.ops.pallas_pairhmm import pallas_exact_forward

GAP = np.array(
    [math.log(2.8e-6), math.log(5.1e-6), NEG_INF, NEG_INF], dtype=np.float32
)


def _synth(n=21, seed=3):
    random.seed(seed)
    bases = b"ACGT"
    alleles, reads, quals = [], [], []
    for _t in range(n):
        alen = random.choice([40, 100, 192, 300])
        a = bytes(random.choice(bases) for _ in range(alen))
        rlen = random.choice([1, 30, 64, 100])
        p = random.randrange(max(1, alen - rlen)) if alen > rlen else 0
        r = bytearray(a[p : p + min(rlen, alen)])
        for _ in range(random.randrange(4)):
            if not r:
                break
            q = random.randrange(len(r))
            op = random.random()
            if op < 0.4:
                r[q] = random.choice(bases)
            elif op < 0.7:
                r.insert(q, random.choice(bases))
            else:
                del r[q]
        if not r:
            r = bytearray(b"A")
        alleles.append(a)
        reads.append(np.frombuffer(bytes(r), dtype=np.uint8))
        quals.append(np.full(len(r), random.choice([20, 30, 40]), dtype=np.uint8))
    return alleles, reads, quals


def test_pallas_matches_wavefront_interpret():
    import jax.numpy as jnp

    alleles, reads, quals = _synth()
    out_pl = pallas_exact_forward(alleles, reads, quals, GAP, interpret=True)

    B = 32
    X = ((max(len(a) for a in alleles) + 31) // 32) * 32
    Y = ((max(len(r) for r in reads) + 31) // 32) * 32
    al = np.zeros((B, X), np.uint8)
    alen = np.ones(B, np.int32)
    rd = np.zeros((B, Y), np.uint8)
    rlen = np.ones(B, np.int32)
    mis = np.full((B, Y), NEG_INF, np.float32)
    for b in range(len(alleles)):
        a = np.frombuffer(alleles[b], np.uint8)
        al[b, : len(a)] = a
        alen[b] = len(a)
        r = reads[b]
        rd[b, : len(r)] = r
        rlen[b] = len(r)
        mis[b, : len(r)] = -quals[b].astype(np.float64) * math.log(10) / 10
    me = np.full(B, -1, np.int32)
    out_ref = np.asarray(
        _forward_impl(
            jnp.asarray(al), jnp.asarray(alen), jnp.asarray(rd),
            jnp.asarray(mis), jnp.asarray(rlen), jnp.asarray(GAP),
            jnp.asarray(me), X, Y,
        )
    )[: len(alleles)]
    rel = np.abs(out_pl - out_ref) / np.maximum(np.abs(out_ref), 1.0)
    assert float(rel.max()) < 5e-4, rel.max()


def test_pallas_empty_read_masked():
    """A zero-length read window must return -1e30 (the wavefront's empty
    result), not a bogus positive log-prob from the forced pad column."""
    alleles = [b"ACGTACGTAC", b"ACGTACGTAC"]
    reads = [np.zeros(0, dtype=np.uint8), np.frombuffer(b"ACGT", np.uint8)]
    quals = [np.zeros(0, dtype=np.uint8), np.full(4, 30, np.uint8)]
    out = pallas_exact_forward(alleles, reads, quals, GAP, interpret=True)
    assert out[0] == -1e30
    # ACGT matches at 2 start positions -> ~log(2*(1-1e-3)^4) (semiglobal
    # forward sums over free starts; normalization cancels in ref/alt)
    assert abs(out[1] - math.log(2.0)) < 0.05


# --------------------------------------------------------------------------
# General finite-extension kernel
# --------------------------------------------------------------------------

GAP_ONT = np.array(
    [math.log(5.1e-3), math.log(4.2e-3), math.log(0.35), math.log(0.42)],
    dtype=np.float32,
)


def _wavefront(alleles, reads, quals, gap, io=None, ie=None, do=None, de=None):
    import jax.numpy as jnp

    from varlociraptor_tpu.ops.pairhmm import _forward_hp_impl

    B = 32
    X = ((max(len(a) for a in alleles) + 31) // 32) * 32
    Y = ((max(len(r) for r in reads) + 31) // 32) * 32
    al = np.zeros((B, X), np.uint8)
    alen = np.ones(B, np.int32)
    rd = np.zeros((B, Y), np.uint8)
    rlen = np.ones(B, np.int32)
    mis = np.full((B, Y), NEG_INF, np.float32)
    for b in range(len(alleles)):
        a = np.frombuffer(alleles[b], np.uint8)
        al[b, : len(a)] = a
        alen[b] = len(a)
        r = reads[b]
        rd[b, : len(r)] = r
        rlen[b] = len(r)
        mis[b, : len(r)] = -quals[b].astype(np.float64) * math.log(10) / 10
    me = np.full(B, -1, np.int32)
    if io is not None:
        io_p = np.full((B, Y), NEG_INF, np.float32)
        ie_p = np.full((B, Y), NEG_INF, np.float32)
        do_p = np.full((B, X), NEG_INF, np.float32)
        de_p = np.full((B, X), NEG_INF, np.float32)
        for b in range(len(alleles)):
            io_p[b, : len(io[b])] = io[b]
            ie_p[b, : len(ie[b])] = ie[b]
            do_p[b, : len(do[b])] = do[b]
            de_p[b, : len(de[b])] = de[b]
        return np.asarray(
            _forward_hp_impl(
                jnp.asarray(al), jnp.asarray(alen), jnp.asarray(rd),
                jnp.asarray(mis), jnp.asarray(rlen), jnp.asarray(io_p),
                jnp.asarray(ie_p), jnp.asarray(do_p), jnp.asarray(de_p),
                jnp.asarray(me), X, Y,
            )
        )[: len(alleles)]
    return np.asarray(
        _forward_impl(
            jnp.asarray(al), jnp.asarray(alen), jnp.asarray(rd),
            jnp.asarray(mis), jnp.asarray(rlen), jnp.asarray(gap),
            jnp.asarray(me), X, Y,
        )
    )[: len(alleles)]


def test_pallas_general_matches_wavefront():
    """Finite-extension column kernel (Kogge-Stone D scan) vs the log-space
    wavefront, ONT-like gap params."""
    from varlociraptor_tpu.ops.pallas_pairhmm import pallas_general_forward

    alleles, reads, quals = _synth(n=21, seed=11)
    out_pl = pallas_general_forward(alleles, reads, quals, GAP_ONT,
                                    interpret=True)
    out_ref = _wavefront(alleles, reads, quals, GAP_ONT)
    rel = np.abs(out_pl - out_ref) / np.maximum(np.abs(out_ref), 1.0)
    assert float(rel.max()) < 5e-4, rel.max()


def test_pallas_general_long_deletion_chain():
    """A read bridging a long deletion exercises deep D-extension chains
    (the log-shift scan's far terms)."""
    from varlociraptor_tpu.ops.pallas_pairhmm import pallas_general_forward

    random.seed(5)
    bases = b"ACGT"
    a = bytes(random.choice(bases) for _ in range(200))
    # read = 30 bp prefix + 30 bp starting 80 bp later (50 bp deletion)
    r = np.frombuffer(a[10:40] + a[90:120], np.uint8)
    q = np.full(60, 25, np.uint8)
    out_pl = pallas_general_forward([a], [r], [q], GAP_ONT, interpret=True)
    out_ref = _wavefront([a], [r.copy()], [q], GAP_ONT)
    rel = abs(out_pl[0] - out_ref[0]) / max(abs(out_ref[0]), 1.0)
    assert rel < 5e-4, (out_pl[0], out_ref[0])


def test_pallas_positional_matches_hp_wavefront():
    """Positional-gap variant (per-base homopolymer probs) vs
    _forward_hp_impl."""
    from varlociraptor_tpu.ops.pallas_pairhmm import pallas_positional_forward

    alleles, reads, quals = _synth(n=13, seed=7)
    random.seed(19)
    io, ie, do, de = [], [], [], []
    for a, r in zip(alleles, reads):
        io.append(np.float32(np.log(
            np.random.default_rng(1).uniform(1e-4, 2e-2, len(r))
        )) if len(r) else np.zeros(0, np.float32))
        ie.append(np.float32(np.log(
            np.random.default_rng(2).uniform(0.05, 0.5, len(r))
        )) if len(r) else np.zeros(0, np.float32))
        do.append(np.float32(np.log(
            np.random.default_rng(3).uniform(1e-4, 2e-2, len(a))
        )))
        de.append(np.float32(np.log(
            np.random.default_rng(4).uniform(0.05, 0.5, len(a))
        )))
    keep = [i for i in range(len(reads)) if len(reads[i]) > 0]
    alleles = [alleles[i] for i in keep]
    reads = [reads[i] for i in keep]
    quals = [quals[i] for i in keep]
    io = [io[i] for i in keep]
    ie = [ie[i] for i in keep]
    do = [do[i] for i in keep]
    de = [de[i] for i in keep]
    out_pl = pallas_positional_forward(
        alleles, reads, quals, io, ie, do, de, interpret=True
    )
    out_ref = _wavefront(alleles, reads, quals, None, io, ie, do, de)
    rel = np.abs(out_pl - out_ref) / np.maximum(np.abs(out_ref), 1.0)
    assert float(rel.max()) < 5e-4, rel.max()
