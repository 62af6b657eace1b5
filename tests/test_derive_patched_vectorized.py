"""Differential test: the vectorized derive_patched_allele op-walk vs a
scalar transliteration of edit_distance.rs:360-467 (the shape the repo
used through round 4)."""

import numpy as np
import pytest

from varlociraptor_tpu.evidence import edit_distance as ed
from varlociraptor_tpu.evidence.edit_distance import D, EditHit, I, M, S


class _Em:
    def __init__(self, seq, ref_offset, vrange, diff):
        self.seq = seq
        self.ref_offset = ref_offset
        self.variant_ref_range = vrange
        self.alt_vs_ref_len_diff = diff


def scalar_reference(emission, read, hit):
    if hit.explainable is None or hit.explainable:
        return None
    p_start = hit.range_start if hit.range_start is not None else hit.start
    p_ops = hit.range_ops if hit.range_ops is not None else hit.ops
    allele = np.frombuffer(bytes(emission.seq), dtype=np.uint8)
    lo, hi = emission.variant_ref_range
    pos_ref = p_start
    pos_read = 0
    out = bytearray(bytes(allele[:p_start]))
    read_b = np.asarray(read, dtype=np.uint8)
    for op in p_ops:
        in_range = lo <= (pos_ref + emission.ref_offset) < hi
        if op == M:
            out.append(allele[pos_ref]); pos_ref += 1; pos_read += 1
        elif op == S:
            out.append(read_b[pos_read] if in_range else allele[pos_ref])
            pos_ref += 1; pos_read += 1
        elif op == D:
            if not ed._PARITY_DEL and not in_range:
                out.append(allele[pos_ref])
            pos_ref += 1
        elif op == I:
            if in_range:
                out.append(read_b[pos_read])
            pos_read += 1
    del_len = abs(min(emission.alt_vs_ref_len_diff, 0))
    tail_end = max(len(allele) - del_len, pos_ref)
    out.extend(bytes(allele[pos_ref:tail_end]))
    return bytes(out)


@pytest.mark.parametrize("seed", range(40))
def test_vectorized_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    alen = int(rng.integers(20, 160))
    allele = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), alen))
    p_start = int(rng.integers(0, alen // 3))
    # random op walk that stays inside the allele
    ops, ref_used, read_used = [], 0, 0
    budget = alen - p_start
    while ref_used < budget - 1 and len(ops) < 200:
        op = int(rng.choice([M, M, M, M, S, D, I]))
        if op in (M, S, D):
            ref_used += 1
        if op in (M, S, I):
            read_used += 1
        ops.append(op)
    read = rng.choice(np.frombuffer(b"ACGT", np.uint8), max(read_used, 1) + 3)
    lo = int(rng.integers(0, alen))
    hi = lo + int(rng.integers(1, 20))
    ref_off = int(rng.integers(0, 5))
    diff = int(rng.integers(-6, 6))
    em = _Em(allele, ref_off, (lo + ref_off, hi + ref_off), diff)
    hit = EditHit(dist=3, start=p_start, end=alen, ops=ops)
    hit.explainable = False
    a = ed.derive_patched_allele(em, read, hit)
    b = scalar_reference(em, read, hit)
    assert a == b
