"""Artifact/bias model as per-observation tensor factors.

Re-implements the reference's 6-dimension bias model
(``/root/reference/src/variants/model/bias/``) tensor-first: every bias combo
contributes per-observation log factors ``bias_alt/bias_ref/bias_any`` that
multiply into the read likelihood; a locus's combo set is gated host-side by
the reference's is_possible/is_informative/is_likely heuristics
(``bias/mod.rs:37-104``) into an active-mask fed to the device kernel.

Combo layout: index 0 is always the no-artifact combo; indices 1.. are the
exactly-one-artifact combinations (``bias/mod.rs:131-218``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..utils.logprob import LOG_ZERO, PROB_05
from ..evidence.observation import (
    ALT_LOCUS_MAJOR,
    ALT_LOCUS_NONE,
    READ_POSITION_MAJOR,
    RO_F1R2,
    RO_F2R1,
    STRAND_BOTH,
    STRAND_FORWARD,
    STRAND_NONE,
    STRAND_REVERSE,
    Pileup,
)

# bias dimension enums (None == 0 everywhere)
SB_NONE, SB_FORWARD, SB_REVERSE = 0, 1, 2
ROB_NONE, ROB_F1R2, ROB_F2R1 = 0, 1, 2
RPB_NONE, RPB_SOME = 0, 1
SCB_NONE, SCB_SOME = 0, 1
HE_NONE, HE_SOME = 0, 1
ALB_NONE, ALB_SOME = 0, 1


@dataclass(frozen=True)
class BiasCombo:
    strand: int = SB_NONE
    read_orientation: int = ROB_NONE
    read_position: int = RPB_NONE
    softclip: int = SCB_NONE
    homopolymer: int = HE_NONE
    alt_locus: int = ALB_NONE

    @property
    def is_artifact(self):
        return any(
            x != 0
            for x in (
                self.strand,
                self.read_orientation,
                self.read_position,
                self.softclip,
                self.homopolymer,
                self.alt_locus,
            )
        )

    def short_labels(self):
        """MAP-indicator strings for the output VCF (SB/ROB/RPB/SCB/HE/ALB)."""
        return {
            "SB": {SB_NONE: ".", SB_FORWARD: "+", SB_REVERSE: "-"}[self.strand],
            "ROB": {ROB_NONE: ".", ROB_F1R2: "F1R2", ROB_F2R1: "F2R1"}[self.read_orientation],
            "RPB": {RPB_NONE: ".", RPB_SOME: "^"}[self.read_position],
            "SCB": {SCB_NONE: ".", SCB_SOME: "$"}[self.softclip],
            "HE": {HE_NONE: ".", HE_SOME: "*"}[self.homopolymer],
            "ALB": {ALB_NONE: ".", ALB_SOME: "*"}[self.alt_locus],
        }


def all_artifact_combinations(
    consider_read_orientation: bool,
    consider_strand: bool,
    consider_read_position: bool,
    consider_softclip: bool,
    consider_homopolymer: bool,
    consider_alt_locus: bool,
) -> list[BiasCombo]:
    """Exactly-one-artifact combos (bias/mod.rs:131-218)."""
    combos = []
    if consider_strand:
        combos += [BiasCombo(strand=SB_FORWARD), BiasCombo(strand=SB_REVERSE)]
    if consider_read_orientation:
        combos += [
            BiasCombo(read_orientation=ROB_F1R2),
            BiasCombo(read_orientation=ROB_F2R1),
        ]
    if consider_read_position:
        combos += [BiasCombo(read_position=RPB_SOME)]
    if consider_softclip:
        combos += [BiasCombo(softclip=SCB_SOME)]
    if consider_homopolymer:
        combos += [BiasCombo(homopolymer=HE_SOME)]
    if consider_alt_locus:
        combos += [BiasCombo(alt_locus=ALB_SOME)]
    return combos


# the fixed full combo layout used by the caller and benches
FULL_COMBOS_DEFAULT = [BiasCombo()] + all_artifact_combinations(
    True, True, True, True, True, True
)


@dataclass
class LearnedBiasParams:
    """Per-locus learned parameters (bias learn_parameters hooks)."""

    forward_rate: float = 0.5  # strand_bias.rs:79-123
    has_alt_loci: bool = False  # alt_locus_bias.rs:115-122


# ---------------------------------------------------------------------------
# parameter learning + gating (host side, mirrors reference heuristics)
# ---------------------------------------------------------------------------


def _strong_ref_obs(pileups):
    for p in pileups:
        for o in p.read_observations:
            if o.is_strong_ref_support():
                yield o


def estimate_forward_rate(pileups: list[Pileup]):
    """strand_bias.rs:79-123. Returns None if not estimable."""
    strong_all = 0.0
    strong_forward = 0.0
    for o in _strong_ref_obs(pileups):
        if o.strand != STRAND_BOTH:
            strong_all += math.exp(o.eff_prob_mapping())
        if o.strand == STRAND_FORWARD:
            strong_forward += math.exp(o.eff_prob_mapping())
    if strong_all > 2.0:
        frac = strong_forward / strong_all
        if strong_all > 100.0 and 0.0 < frac < 1.0:
            return frac
        if 0.4 <= frac <= 0.6:
            return 0.5
    return None


def learn_bias_params(pileups: list[Pileup]) -> LearnedBiasParams:
    fr = estimate_forward_rate(pileups)
    has_alt = any(
        o.alt_locus != ALT_LOCUS_NONE
        for p in pileups
        for o in p.read_observations
    )
    return LearnedBiasParams(
        forward_rate=fr if fr is not None else 0.5, has_alt_loci=has_alt
    )


# per-dimension informativeness (reference per-bias is_informative impls)


def _strand_informative(pileups):
    return estimate_forward_rate(pileups) is not None


def _read_orientation_informative(pileups):
    n_uncertain = sum(
        1
        for p in pileups
        for o in p.read_observations
        if o.read_orientation not in (RO_F1R2, RO_F2R1)
    )
    n = sum(len(p.read_observations) for p in pileups)
    enough_information = n_uncertain < n / 2.0 if n else False
    strong_total = 0
    strong_f1r2 = 0
    for p in pileups:
        for o in p.read_observations:
            if o.is_strong_ref_support() and o.read_orientation in (RO_F1R2, RO_F2R1):
                strong_total += 1
                if o.read_orientation == RO_F1R2:
                    strong_f1r2 += 1
    uniform = (
        strong_total > 2 and 0.3 <= strong_f1r2 / strong_total <= 0.7
        if strong_total > 2
        else False
    )
    return enough_information and uniform


def _read_position_informative(pileups):
    # read_position_bias.rs:64-117
    for p in pileups:
        expected_all = 0.0
        expected_major = 0.0
        expected_major_rate = 0.0
        for o in p.read_observations:
            if o.is_strong_ref_support():
                pm = math.exp(o.eff_prob_mapping())
                expected_all += pm
                if o.read_position == READ_POSITION_MAJOR:
                    expected_major += pm
                expected_major_rate += math.exp(o.eff_prob_mapping() + o.prob_hit_base)
        if expected_all > 10.0:
            major_rate = expected_major / expected_all
            if expected_major > 0.0 and abs(major_rate - expected_major_rate / 1.0) < 0.05:
                # reference compares against sum of prob_mapping*prob_hit_base
                return True
    return False


def _softclip_informative(pileups):
    return any(o.softclipped for p in pileups for o in p.read_observations)


def _homopolymer_informative(pileups):
    # homopolymer_error.rs:47-72 — all alt-supporting pileups need indels both ways
    for p in pileups:
        if not any(o.is_strong_alt_support() for o in p.read_observations):
            continue
        has_pos = any((o.homopolymer_indel_len or 0) > 0 for o in p.read_observations)
        has_neg = any((o.homopolymer_indel_len or 0) < 0 for o in p.read_observations)
        if not (has_pos and has_neg):
            return False
    return True


def _alt_locus_informative(pileups):
    # alt_locus_bias.rs:123-144
    def counts(pred):
        n = nm = 0
        for p in pileups:
            for o in p.read_observations:
                if pred(o):
                    n += 1
                    if not o.is_max_mapq:
                        nm += 1
        return n, nm

    n_alt, non_max_alt = counts(lambda o: o.is_strong_alt_support())
    n_ref, non_max_ref = counts(lambda o: o.is_strong_ref_support())
    enough_alt = (
        n_alt > 0 and non_max_alt > n_alt * 0.1 and (n_alt - non_max_alt) < 10
    )
    enough_ref = n_ref > 0 and non_max_ref < n_ref * 0.9
    has_alt = any(
        o.alt_locus != ALT_LOCUS_NONE for p in pileups for o in p.read_observations
    )
    return enough_alt and (has_alt or enough_ref)


# ---------------------------------------------------------------------------
# per-observation factors
# ---------------------------------------------------------------------------


def combo_factors_for_obs(combo: BiasCombo, obs, params: LearnedBiasParams):
    """(log bias_alt, log bias_ref, log bias_any) for one observation.

    Mirrors Artifacts::prob_alt/prob_ref/prob_any (bias/mod.rs:259-284) as the
    sum of per-dimension factors.
    """
    alt = ref = anyp = 0.0

    # strand (strand_bias.rs:28-56)
    s = obs.strand
    if combo.strand == SB_FORWARD:
        if s == STRAND_FORWARD:
            a = 0.0
        elif s == STRAND_NONE:
            a = 0.0
        else:
            a = LOG_ZERO
    elif combo.strand == SB_REVERSE:
        if s == STRAND_REVERSE:
            a = 0.0
        elif s == STRAND_NONE:
            a = 0.0
        else:
            a = LOG_ZERO
    else:
        if s == STRAND_BOTH:
            a = obs.prob_double_overlap
        elif s == STRAND_NONE:
            a = 0.0
        else:
            rate = params.forward_rate if s == STRAND_FORWARD else 1.0 - params.forward_rate
            a = (math.log(rate) if rate > 0 else LOG_ZERO) + obs.prob_single_overlap
    alt += a
    ref += PROB_05
    anyp += PROB_05

    # read orientation (read_orientation_bias.rs:18-33)
    ro = obs.read_orientation
    if combo.read_orientation == ROB_NONE:
        a = PROB_05
    elif combo.read_orientation == ROB_F1R2:
        a = 0.0 if ro == RO_F1R2 else (LOG_ZERO if ro == RO_F2R1 else PROB_05)
    else:
        a = 0.0 if ro == RO_F2R1 else (LOG_ZERO if ro == RO_F1R2 else PROB_05)
    alt += a
    ref += PROB_05
    anyp += PROB_05

    # read position (read_position_bias.rs:17-38)
    hit = obs.prob_hit_base
    one_minus_hit = _one_minus_prob_hit_base(hit)
    if combo.read_position == RPB_NONE:
        a = hit if obs.read_position == READ_POSITION_MAJOR else one_minus_hit
    else:
        a = 0.0 if obs.read_position == READ_POSITION_MAJOR else LOG_ZERO
    any_rp = hit if obs.read_position == READ_POSITION_MAJOR else one_minus_hit
    alt += a
    ref += any_rp
    anyp += any_rp

    # softclip (softclip_bias.rs:15-29)
    if combo.softclip == SCB_SOME:
        alt += 0.0 if obs.softclipped else LOG_ZERO
    # ref/any contribute ln_one

    # homopolymer (homopolymer_error.rs:23-41)
    if combo.homopolymer == HE_SOME:
        h = obs.prob_observable_at_homopolymer_artifact
    else:
        h = obs.prob_observable_at_homopolymer_variant
    h = 0.0 if h is None else h
    alt += h
    ref += h
    # any contributes ln_one

    # alt locus (alt_locus_bias.rs:62-105)
    if combo.alt_locus == ALB_SOME:
        if params.has_alt_loci:
            a = 0.0 if obs.alt_locus == ALT_LOCUS_MAJOR else LOG_ZERO
            r = LOG_ZERO if obs.alt_locus == ALT_LOCUS_MAJOR else 0.0
        else:
            a = LOG_ZERO if obs.is_max_mapq else 0.0
            r = PROB_05
    else:
        a = PROB_05
        r = PROB_05
    alt += a
    ref += r
    anyp += PROB_05

    return alt, ref, anyp


def _one_minus_prob_hit_base(hit):
    if hit == 0.0:
        return 0.0  # read length 1 (read_position_bias.rs:52-60)
    if hit == LOG_ZERO:
        return 0.0
    return math.log1p(-math.exp(hit))


def _combo_is_bias_evidence(combo: BiasCombo, obs, params) -> bool:
    """Bias::is_bias_evidence — prob_alt != 0 — plus homopolymer override
    (homopolymer_error.rs:80-82)."""
    if combo.homopolymer == HE_SOME:
        return (obs.homopolymer_indel_len or 0) != 0
    alt, _, _ = combo_factors_for_obs(combo, obs, params)
    return alt > LOG_ZERO


def combo_is_possible(combo, pileups, params) -> bool:
    if not combo.is_artifact:
        return True
    if combo.homopolymer == HE_SOME:
        return _homopolymer_informative(pileups)
    return any(
        combo_factors_for_obs(combo, o, params)[0] > LOG_ZERO
        for p in pileups
        for o in p.read_observations
    )


def combo_is_informative(combo, pileups) -> bool:
    if combo.strand != SB_NONE and not _strand_informative(pileups):
        return False
    if combo.read_orientation != ROB_NONE and not _read_orientation_informative(pileups):
        return False
    if combo.read_position != RPB_NONE and not _read_position_informative(pileups):
        return False
    if combo.softclip != SCB_NONE and not _softclip_informative(pileups):
        return False
    if combo.homopolymer != HE_NONE and not _homopolymer_informative(pileups):
        return False
    if combo.alt_locus != ALB_NONE and not _alt_locus_informative(pileups):
        return False
    return True


def combo_is_likely(combo, pileups, params) -> bool:
    """bias/mod.rs:62-104."""
    if not combo.is_artifact:
        return True
    if combo.homopolymer == HE_SOME:
        return _homopolymer_informative(pileups)
    min_ratio = 0.66666
    for p in pileups:
        strong_all = [
            o
            for o in p.read_observations
            if o.is_uniquely_mapping() and o.is_strong_alt_support()
        ]
        if len(strong_all) >= 10:
            strong_bias = sum(
                1 for o in strong_all if _combo_is_bias_evidence(combo, o, params)
            )
            if strong_bias / len(strong_all) >= min_ratio:
                return True
        elif all(o.is_ref_support() for o in p.read_observations):
            continue
        elif not p.read_observations:
            continue
        else:
            return True
    return False


# ---------------------------------------------------------------------------
# packing into device tensors
# ---------------------------------------------------------------------------


@dataclass
class BiasTensor:
    """Per-locus bias factors and gates for the device kernel.

    - combos: list[BiasCombo], index 0 = no-artifact
    - alt/ref/any: [n_samples, n_combos, depth] f32
    - active: [n_combos] bool (gating for artifact combos at this locus)
    """

    combos: list
    alt: np.ndarray
    ref: np.ndarray
    any: np.ndarray
    active: np.ndarray


def build_bias_tensor(
    pileups: list[Pileup], combos: list[BiasCombo], depth: int, allowed=None
) -> BiasTensor:
    """allowed: optional [n_combos] bool pre-gate (variant-class rules,
    cli omit flags); factors are only materialized for active combos."""
    params = learn_bias_params(pileups)
    n_samples = len(pileups)
    n_combos = len(combos)
    alt = np.zeros((n_samples, n_combos, depth), dtype=np.float32)
    ref = np.zeros((n_samples, n_combos, depth), dtype=np.float32)
    anyp = np.zeros((n_samples, n_combos, depth), dtype=np.float32)
    active = np.zeros(n_combos, dtype=bool)
    for ci, combo in enumerate(combos):
        if allowed is not None and not allowed[ci]:
            continue
        active[ci] = (
            combo_is_possible(combo, pileups, params)
            and combo_is_informative(combo, pileups)
            and combo_is_likely(combo, pileups, params)
        )
        if not active[ci] and combo.is_artifact:
            continue  # factors of gated-out combos are never read
        for si, p in enumerate(pileups):
            for oi, o in enumerate(p.read_observations[:depth]):
                a, r, y = combo_factors_for_obs(combo, o, params)
                alt[si, ci, oi] = a
                ref[si, ci, oi] = r
                anyp[si, ci, oi] = y
    return BiasTensor(combos=combos, alt=alt, ref=ref, any=anyp, active=active)


def compact_combos(bias_alt, bias_ref, bias_any, combo_active, bucket=True):
    """Gather each locus's active combos into leading combo slots.

    Most loci activate 1-3 of the ~9 single-artifact combos; evaluating the
    full combo axis wastes the device kernels' dominant dimension.  Returns
    (alt, ref, any [L,S,Bc,D], slot_active [L,Bc], slot_map [L,Bc] int —
    original combo index per slot).  Slot 0 is always the no-artifact combo;
    Bc is bucketed to a power of two so jit recompiles stay bounded.
    """
    L, S, B, D = bias_alt.shape
    counts = combo_active.sum(axis=1)
    max_active = max(1, int(counts.max()) if L else 1)
    Bc = 1 << (max_active - 1).bit_length() if bucket else max_active
    Bc = min(Bc, B)
    slot_map = np.zeros((L, Bc), dtype=np.int64)
    slot_active = np.zeros((L, Bc), dtype=bool)
    for li in range(L):
        idxs = np.nonzero(combo_active[li])[0][:Bc]
        k = len(idxs)
        slot_map[li, :k] = idxs
        slot_active[li, :k] = True
    gather = slot_map[:, None, :, None]
    take = lambda a: np.take_along_axis(a, gather, axis=2)
    return (
        take(bias_alt),
        take(bias_ref),
        take(bias_any),
        slot_active,
        slot_map,
    )
