"""Differential test: the incremental fragment index (sliding-window
pairing) vs a direct transliteration of the legacy per-locus fetch scan
(types/mod.rs:283-340 semantics) — identical evidence sets required over
sliding windows, gap jumps, rebuilds, and multi-interval queries."""

import numpy as np
import pytest

from varlociraptor_tpu.evidence import extraction as ex
from varlociraptor_tpu.io.bam import BamRecord, BamWriter, BamReader


def legacy_scan(bam, contig, fetch_intervals, window):
    candidates = {}
    seen = []
    for start, end in fetch_intervals:
        fs, fe = max(0, start - window), end + window
        if seen and fs <= seen[-1][1]:
            fs = max(fs, seen[-1][1])
            if fs >= fe:
                continue
        seen.append((fs, fe))
        for rec in bam.fetch(contig, fs, fe):
            if rec.pos < fs or rec.pos >= fe:
                continue
            if rec.flag & 0x704:
                continue
            slot = candidates.get(rec.qname)
            if slot is None:
                candidates[rec.qname] = [rec, None]
            else:
                prev_left = slot[0]
                if (
                    prev_left.is_first_in_pair
                    and rec.is_first_in_pair
                    and prev_left.is_last_in_pair
                    and rec.is_last_in_pair
                ):
                    continue
                slot[1] = rec
    out = []
    for qname in sorted(candidates):
        left, right = candidates[qname]
        if right is not None and (left.mapq == 0 or right.mapq == 0):
            continue
        out.append((qname, left.pos, None if right is None else right.pos))
    return out


def _sim_bam(tmp_path, n_pairs=4000, span=200_000, seed=5):
    rng = np.random.default_rng(seed)
    recs = []
    for k in range(n_pairs):
        p1 = int(rng.integers(0, span))
        isize = int(rng.integers(180, 550))
        p2 = p1 + isize - 80
        mapq = int(rng.choice([60, 60, 60, 37, 0, 13]))
        for (p, first) in ((p1, True), (p2, False)):
            flag = 0x1 | (0x20 if first else 0x10) | (0x40 if first else 0x80)
            if rng.random() < 0.05:
                flag |= 0x400  # duplicate: skip-flagged
            if rng.random() < 0.02:
                flag |= 0x40 | 0x80  # both-partial quirk exercise
            recs.append(
                BamRecord(
                    qname=f"f{k}", flag=flag, tid=0, pos=p, mapq=mapq,
                    cigar=[(0, 80)], mtid=0, mpos=p2 if first else p1,
                    tlen=isize if first else -isize,
                    seq=np.full(80, ord("A"), np.uint8),
                    qual=np.full(80, 30, np.uint8), tags={},
                )
            )
    recs.sort(key=lambda r: r.pos)
    path = tmp_path / "t.bam"
    w = BamWriter(path, ["c1"], [span + 1000])
    for r in recs:
        w.write_record(r)
    w.close(index=True)
    return path


def _keys(evs):
    return [
        (e.qname(), e.left.pos, None if e.right is None else e.right.pos)
        for e in evs
    ]


def test_incremental_matches_legacy(tmp_path):
    path = _sim_bam(tmp_path, span=600_000, n_pairs=12000)
    bam_i = BamReader(path)
    bam_l = BamReader(path)
    rng = np.random.default_rng(17)
    p = 600
    W = 650
    mismatches = 0
    n_nonempty = 0
    while p < 560_000:
        pass_count = 1
        # mix of slides, jumps, shrinks, multi-intervals
        r = rng.random()
        if r < 0.7:
            intervals = [(p, p + 1)]
        elif r < 0.8:
            intervals = [(p, p + 40)]  # wider window (fe jumps)
        elif r < 0.9:
            intervals = [(p, p + 1), (p + 1500, p + 1501)]  # multi
        else:
            intervals = [(p, p + 1)]
            p += int(rng.integers(66_000, 70_000))  # gap jump next round
        got = ex.collect_fragments(bam_i, "c1", intervals, W)
        want = legacy_scan(bam_l, "c1", intervals, W)
        assert _keys(got) == want, f"at p={p} intervals={intervals}"
        if want:
            n_nonempty += 1
        p += int(rng.choice([3, 13, 80, 797]))
    assert n_nonempty > 40
