"""Columnar call path (calling/columnar.py + fastcall.py) vs the legacy
per-WorkItem path: gating must match EXACTLY, end-to-end records up to f32
engine noise (strings exactly, probabilities within tolerance)."""

import math
import os
import random

import numpy as np
import pytest

from varlociraptor_tpu.calling.call import CallOptions, call_generic
from varlociraptor_tpu.calling.columnar import ColumnarBatch, compact_slots
from varlociraptor_tpu.calling.observations import ObservationWriter
from varlociraptor_tpu.calling.variants import VariantInfo
from varlociraptor_tpu.evidence.observation import (
    ALT_LOCUS_MAJOR,
    ALT_LOCUS_NONE,
    ALT_LOCUS_SOME,
    Pileup,
    ReadObservation,
    set_prob_mapping,
    set_prob_overlap,
)
from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario
from varlociraptor_tpu.ops.biases import FULL_COMBOS_DEFAULT, build_bias_tensor
from varlociraptor_tpu.utils.logprob import PROB_05


def _rand_obs(rng, profile):
    o = ReadObservation()
    f16 = lambda x: float(np.float16(x))
    if profile == "alt":
        pa, pr = rng.uniform(-0.1, 0.0), rng.uniform(-30, -8)
    elif profile == "ref":
        pa, pr = rng.uniform(-30, -8), rng.uniform(-0.1, 0.0)
    elif profile == "tie":
        pa = pr = f16(rng.uniform(-3, 0))
    else:
        pa, pr = rng.uniform(-8, 0), rng.uniform(-8, 0)
    o.prob_alt = f16(pa)
    o.prob_ref = f16(pr)
    set_prob_mapping(
        o, f16(rng.choice([-1e-5, -0.01, -0.2, math.log(0.5)]))
    )
    o.prob_missed_allele = f16(rng.uniform(-8, 0))
    o.prob_sample_alt = f16(rng.choice([0.0, -0.1, -1.0]))
    set_prob_overlap(
        o, f16(rng.choice([-np.inf, -3.0, -0.5, 0.0]))
    )
    o.prob_hit_base = f16(rng.choice([-np.inf, 0.0, -0.7, -2.0]))
    o.strand = rng.randrange(4)
    o.read_orientation = rng.choice([0, 1, 1, 2, 2, 5])
    o.softclipped = rng.random() < 0.3
    o.paired = rng.random() < 0.8
    o.read_position = rng.choice([0, 0, 1])
    if rng.random() < 0.4:
        o.prob_observable_at_homopolymer_artifact = f16(rng.uniform(-4, 0))
        o.prob_observable_at_homopolymer_variant = f16(rng.uniform(-4, 0))
        o.homopolymer_indel_len = rng.choice([-2, -1, 1, 3])
    o.is_max_mapq = rng.random() < 0.5
    o.alt_locus = rng.choice(
        [ALT_LOCUS_NONE, ALT_LOCUS_NONE, ALT_LOCUS_SOME, ALT_LOCUS_MAJOR]
    )
    if rng.random() < 0.3:
        o.third_allele_evidence = rng.randrange(4)
    return o


def _rand_locus(rng, li):
    kind = rng.choice(["snv", "snv", "insertion", "deletion"])
    if kind == "snv":
        ref, alt = rng.choice("ACGT"), rng.choice("ACGT")
        while alt == ref:
            alt = rng.choice("ACGT")
        svlen = 0
    elif kind == "insertion":
        ref, alt = "A", "ACGT"
        svlen = 3
    else:
        ref, alt = "ACGTA", "A"
        svlen = 4
    v = VariantInfo(
        kind=kind,
        chrom="chr1",
        pos=1000 + 10 * li,
        ref_allele=ref,
        alt_allele=alt,
        svlen=svlen,
        precise=rng.random() > 0.1,
    )
    if not v.precise:
        v.cipos = (-5, 5)
    pileups = []
    for _s in range(2):
        shape = rng.choice(["empty", "few", "deep", "altdeep"])
        if shape == "empty":
            n = 0
        elif shape == "few":
            n = rng.randrange(1, 5)
        else:
            n = rng.randrange(12, 40)
        obs = []
        for _ in range(n):
            profile = (
                "alt"
                if (shape == "altdeep" and rng.random() < 0.7)
                else rng.choice(["alt", "ref", "ref", "tie", "mid"])
            )
            obs.append(_rand_obs(rng, profile))
        pileups.append(Pileup(read_observations=obs))
    return v, pileups


def _dataset(seed=7, n=80):
    rng = random.Random(seed)
    out = []
    for li in range(n):
        out.append(_rand_locus(rng, li))
    # force a singleton-adjust locus: exactly one alt-supporting read
    v, ps = _rand_locus(rng, n)
    one = _rand_obs(rng, "alt")
    refs = [_rand_obs(rng, "ref") for _ in range(6)]
    ps = [
        Pileup(read_observations=[one] + refs[:3]),
        Pileup(read_observations=refs[3:]),
    ]
    out.append((v, ps))
    return out


def test_gating_matches_object_path():
    data = _dataset()
    variants = [v for v, _ in data]
    pileups = [ps for _, ps in data]
    cb = ColumnarBatch.from_pileups(variants, pileups)
    opts = CallOptions()
    flags, is_snv_mnv, _ = cb.locus_flags(opts)
    # replicate the object path's preprocessing on COPIES
    import copy

    obj = copy.deepcopy(pileups)
    from varlociraptor_tpu.evidence.observation import (
        adjust_singleton_evidence,
    )
    from varlociraptor_tpu.calling.call import _combo_allowed

    for li, ps in enumerate(obj):
        if is_snv_mnv[li]:
            for p in ps:
                p.remove_nonstandard_alignments(False)
        adjust_singleton_evidence(ps)
    cb.apply_nonstandard_filter(is_snv_mnv, False)
    cb.apply_singleton_adjust()

    # counts must match after filtering
    for li, ps in enumerate(obj):
        for si, p in enumerate(ps):
            assert cb.counts[li, si] == len(p.read_observations), (li, si)
            assert cb.n_filtered[li, si] == p.n_filtered_out

    from varlociraptor_tpu.calling.fastcall import _allowed_matrix

    allowed = _allowed_matrix(flags)
    combo_active, fwd_rate, has_alt = cb.learn_and_gate(allowed)

    for li, ps in enumerate(obj):
        flags_li = tuple(
            flags[li][j] for j in range(6)
        )
        allowed_li = np.array(
            [_combo_allowed(c, flags_li) for c in FULL_COMBOS_DEFAULT]
        )
        assert (allowed[li] == allowed_li).all(), li
        depth = max(
            (len(p.read_observations) for p in ps), default=1
        )
        bt = build_bias_tensor(
            ps, FULL_COMBOS_DEFAULT, max(depth, 1), allowed=allowed_li
        )
        expect = bt.active & allowed_li
        expect[0] = True
        got = combo_active[li].copy()
        got[0] = True
        assert (got == expect).all(), (
            li,
            got,
            expect,
            [len(p.read_observations) for p in ps],
        )


def test_call_generic_columnar_vs_legacy(tmp_path):
    data = _dataset(seed=13, n=60)
    scenario = tumor_normal_scenario(0.75)
    obs = {}
    for si, name in enumerate(scenario.sample_names):
        path = tmp_path / f"{name}.obs.jsonl"
        with ObservationWriter(path, name) as w:
            for v, ps in data:
                w.write_record(v, ps[si])
        obs[name] = path

    out_fast = tmp_path / "fast.vcf"
    out_slow = tmp_path / "slow.vcf"
    n_fast = call_generic(scenario, obs, out_fast, CallOptions())
    os.environ["VLT_LEGACY_CALL"] = "1"
    try:
        n_slow = call_generic(scenario, obs, out_slow, CallOptions())
    finally:
        del os.environ["VLT_LEGACY_CALL"]
    assert n_fast == n_slow

    fast_lines = [
        l for l in out_fast.read_text().splitlines() if not l.startswith("#")
    ]
    slow_lines = [
        l for l in out_slow.read_text().splitlines() if not l.startswith("#")
    ]
    assert len(fast_lines) == len(slow_lines)
    n_exact = 0
    for lf, ls in zip(fast_lines, slow_lines):
        if lf == ls:
            n_exact += 1
            continue
        ff, fs = lf.split("\t"), ls.split("\t")
        # fixed columns + FORMAT layout identical
        assert ff[:7] == fs[:7], (lf, ls)
        assert ff[8] == fs[8]
        # INFO: numeric PROB_* within tolerance, everything else exact
        inf_f = dict(
            kv.split("=", 1) if "=" in kv else (kv, "") for kv in ff[7].split(";")
        )
        inf_s = dict(
            kv.split("=", 1) if "=" in kv else (kv, "") for kv in fs[7].split(";")
        )
        assert inf_f.keys() == inf_s.keys(), (lf, ls)
        for k in inf_f:
            if k.startswith("PROB_") and inf_f[k] not in (".", "inf"):
                assert abs(float(inf_f[k]) - float(inf_s[k])) < 0.3, (k, lf, ls)
            else:
                assert inf_f[k] == inf_s[k], (k, lf, ls)
        keys = ff[8].split(":")
        for col_f, col_s in zip(ff[9:], fs[9:]):
            df = dict(zip(keys, col_f.split(":")))
            ds = dict(zip(keys, col_s.split(":")))
            for k in keys:
                if k == "AF" and df[k] != ".":
                    assert abs(float(df[k]) - float(ds[k])) < 5e-3, (lf, ls)
                elif k == "AFD":
                    continue  # deci-PHRED densities; engine-noise sensitive
                else:
                    assert df[k] == ds[k], (k, lf, ls)
    # the bulk of records should be bitwise identical
    assert n_exact >= len(fast_lines) * 0.5, n_exact
