"""Per-read observations and fixed-shape observation tensors.

Re-design of the reference's ``ReadObservation`` / ``Pileup``
(``/root/reference/src/variants/evidence/observations/read_observation.rs:221-278``,
``.../pileup.rs:7-48``) as a structure-of-arrays: each locus's pileup is packed
into fixed-depth padded numpy arrays (the batch collation in
``ObservationBatch``), which feed the batched JAX likelihood kernels.

Host-side post-processing mirrors the reference exactly:
- major read position / major alt locus (``read_observation.rs:505-591``)
- MAPQ adjustment (``read_observation.rs:456-503``)
- singleton-evidence adjustment (``read_observation.rs:548-562``)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..utils.logprob import (
    LOG_ZERO,
    PROB_05,
    PROB_095,
    kass_raftery,
    KR_POSITIVE,
    KR_STRONG,
    np_ln_one_minus_exp,
    np_ln_sum_exp,
)

# ---------------------------------------------------------------------------
# categorical encodings (device-friendly int8)
# ---------------------------------------------------------------------------

STRAND_NONE = 0
STRAND_FORWARD = 1
STRAND_REVERSE = 2
STRAND_BOTH = 3

STRAND_NAMES = {STRAND_NONE: ".", STRAND_FORWARD: "+", STRAND_REVERSE: "-", STRAND_BOTH: "*"}


def strand_or(a: int, b: int) -> int:
    """Mirrors Strand::bitor_assign (read_observation.rs:112-122)."""
    if a == STRAND_NONE:
        return b
    if b == STRAND_NONE:
        return a
    return a if a == b else STRAND_BOTH


# SequenceReadPairOrientation
RO_NONE = 0
RO_F1R2 = 1
RO_F2R1 = 2
RO_F1F2 = 3
RO_F2F1 = 4
RO_R1R2 = 5
RO_R2R1 = 6
RO_R1F2 = 7
RO_R2F1 = 8

RO_BY_NAME = {
    "None": RO_NONE,
    "F1R2": RO_F1R2,
    "F2R1": RO_F2R1,
    "F1F2": RO_F1F2,
    "F2F1": RO_F2F1,
    "R1R2": RO_R1R2,
    "R2R1": RO_R2R1,
    "R1F2": RO_R1F2,
    "R2F1": RO_R2F1,
}
RO_NAMES = {v: k for k, v in RO_BY_NAME.items()}

# ReadPosition
READ_POSITION_SOME = 0
READ_POSITION_MAJOR = 1

# AltLocus
ALT_LOCUS_NONE = 0
ALT_LOCUS_SOME = 1
ALT_LOCUS_MAJOR = 2

HOMOPOLYMER_NONE = 127  # sentinel for "no homopolymer indel info"


@dataclass(slots=True)
class ReadObservation:
    """One read(-pair)'s evidence at one locus. All probs natural-log."""

    name: str | None = None
    fragment_id: int | None = None
    prob_mapping: float = 0.0
    prob_mismapping: float = LOG_ZERO
    prob_mapping_adj: float | None = None
    prob_mismapping_adj: float | None = None
    prob_alt: float = LOG_ZERO
    prob_ref: float = LOG_ZERO
    prob_alt_adj: float | None = None
    prob_ref_adj: float | None = None
    prob_missed_allele: float = LOG_ZERO
    prob_sample_alt: float = 0.0
    prob_double_overlap: float = LOG_ZERO
    prob_single_overlap: float = 0.0
    prob_hit_base: float = LOG_ZERO
    strand: int = STRAND_NONE
    read_orientation: int = RO_NONE
    softclipped: bool = False
    paired: bool = False
    # raw (pre-process) read position; None if unknown
    read_position_raw: int | None = None
    # processed: READ_POSITION_MAJOR / READ_POSITION_SOME
    read_position: int = READ_POSITION_SOME
    prob_observable_at_homopolymer_artifact: float | None = None
    prob_observable_at_homopolymer_variant: float | None = None
    homopolymer_indel_len: int | None = None
    is_max_mapq: bool = False
    # raw: list of (contig, pos) alt loci from XA; processed: categorical
    alt_loci_raw: list = field(default_factory=list)
    alt_locus: int = ALT_LOCUS_NONE
    third_allele_evidence: int | None = None

    # ---- accessor semantics matching the reference (adj overrides raw) ----
    def eff_prob_mapping(self):
        return self.prob_mapping_adj if self.prob_mapping_adj is not None else self.prob_mapping

    def eff_prob_mismapping(self):
        return (
            self.prob_mismapping_adj
            if self.prob_mismapping_adj is not None
            else self.prob_mismapping
        )

    def eff_prob_alt(self):
        return self.prob_alt_adj if self.prob_alt_adj is not None else self.prob_alt

    def eff_prob_ref(self):
        return self.prob_ref_adj if self.prob_ref_adj is not None else self.prob_ref

    def bayes_factor_alt(self) -> float:
        if self.prob_alt == self.prob_ref:
            return 1.0
        d = self.prob_alt - self.prob_ref
        return math.inf if d > 700 else math.exp(d)

    def bayes_factor_ref(self) -> float:
        if self.prob_alt == self.prob_ref:
            return 1.0
        d = self.prob_ref - self.prob_alt
        return math.inf if d > 700 else math.exp(d)

    def is_uniquely_mapping(self) -> bool:
        return self.eff_prob_mapping() >= PROB_095

    def is_strong_alt_support(self) -> bool:
        return kass_raftery(self.bayes_factor_alt()) >= KR_STRONG

    def is_strong_ref_support(self) -> bool:
        return kass_raftery(self.bayes_factor_ref()) >= KR_STRONG

    def is_ref_support(self) -> bool:
        return self.prob_ref > self.prob_alt

    def is_positive_ref_support(self) -> bool:
        return kass_raftery(self.bayes_factor_ref()) >= KR_POSITIVE

    def has_homopolymer_error(self) -> bool:
        return bool(self.homopolymer_indel_len)


def set_prob_mapping(obs: ReadObservation, prob_mapping: float):
    obs.prob_mapping = prob_mapping
    obs.prob_mismapping = np_ln_one_minus_exp(prob_mapping)


def set_prob_overlap(obs: ReadObservation, prob_double_overlap: float):
    obs.prob_double_overlap = prob_double_overlap
    obs.prob_single_overlap = np_ln_one_minus_exp(prob_double_overlap)


@dataclass
class Pileup:
    """All observations of one sample at one locus."""

    read_observations: list[ReadObservation] = field(default_factory=list)
    depth_observations: list = field(default_factory=list)
    # the depth observation (the reference's unfilled placeholder,
    # depth_observation.rs / sample.rs:330 TODO): raw fragment coverage
    # overlapping the variant's loci BEFORE subsampling and allele-support
    # filtering — the coverage signal the CNV caller consumes (immune to
    # --max-depth capping)
    raw_depth: int | None = None
    n_filtered_out: int = 0

    def remove_nonstandard_alignments(self, omit_read_orientation_bias: bool):
        """For SNV/MNV: drop non-standard read orientations
        (pileup.rs:26-43). Returns number removed."""
        if omit_read_orientation_bias:
            return 0
        keep = [
            o
            for o in self.read_observations
            if o.read_orientation in (RO_F1R2, RO_F2R1, RO_NONE)
        ]
        removed = len(self.read_observations) - len(keep)
        self.n_filtered_out += removed
        self.read_observations = keep
        return removed


# ---------------------------------------------------------------------------
# post-processing (reference read_observation.rs:456-605)
# ---------------------------------------------------------------------------


def _calc_major_feature(values):
    """Most common value if it is a clear winner with count>1, else None."""
    from collections import Counter

    counter = Counter(values)
    if not counter:
        return None
    ranked = counter.most_common()
    feat, count = ranked[0]
    if count == 1:
        return None
    if len(ranked) > 1 and ranked[1][1] == count:
        return None
    return feat


def major_read_position(observations: list[ReadObservation]):
    return _calc_major_feature(
        o.read_position_raw
        for o in observations
        if o.prob_alt > o.prob_ref and o.read_position_raw is not None
    )


def locus_to_bucket(locus, max_read_len: int):
    contig, pos = locus
    coeff = max_read_len * 10
    if coeff == 0:
        return (contig, pos)
    return (contig, (pos // coeff) * coeff)


def major_alt_locus(observations: list[ReadObservation], max_read_len: int):
    return _calc_major_feature(
        locus_to_bucket(locus, max_read_len)
        for o in observations
        for locus in o.alt_loci_raw
    )


def process_observations(
    observations: list[ReadObservation], max_read_len: int
) -> None:
    """In-place raw->processed conversion (read_observation.rs:294-352)."""
    major_pos = major_read_position(observations)
    major_locus = major_alt_locus(observations, max_read_len)
    for o in observations:
        if o.read_position_raw is not None and major_pos is not None:
            o.read_position = (
                READ_POSITION_MAJOR if o.read_position_raw == major_pos else READ_POSITION_SOME
            )
        else:
            o.read_position = READ_POSITION_SOME
        if major_locus is not None:
            if any(
                locus_to_bucket(l, max_read_len) == major_locus for l in o.alt_loci_raw
            ):
                o.alt_locus = ALT_LOCUS_MAJOR
            elif not o.alt_loci_raw:
                o.alt_locus = ALT_LOCUS_NONE
            else:
                o.alt_locus = ALT_LOCUS_SOME
        else:
            o.alt_locus = ALT_LOCUS_NONE


def adjust_prob_mapping(observations: list[ReadObservation], max_mapq: int) -> None:
    """Anti-inflated-MAPQ recalibration (read_observation.rs:456-503)."""
    if not observations:
        return
    max_prob_mapping = np_ln_one_minus_exp(-max_mapq * math.log(10.0) / 10.0)
    probs = [
        o.prob_mapping
        if math.isclose(o.prob_mapping, max_prob_mapping, rel_tol=1e-9, abs_tol=1e-12)
        else PROB_05
        for o in observations
    ]
    prob_sum = np_ln_sum_exp(np.array(probs))
    n = len(observations)
    if n < 20:
        prob_sum = np_ln_sum_exp(np.array([prob_sum, PROB_05]))
        n += 1
    average = prob_sum - math.log(n)
    for o in observations:
        o.prob_mapping_adj = average
        o.prob_mismapping_adj = np_ln_one_minus_exp(average)


def adjust_singleton_evidence(pileups: list[Pileup]) -> bool:
    """PCR-error guard for a single alt-supporting read across all samples
    (read_observation.rs:548-562)."""
    alt_obs = [
        o
        for p in pileups
        for o in p.read_observations
        if o.prob_alt > o.prob_ref
    ]
    if len(alt_obs) == 1:
        alt_obs[0].prob_alt_adj = PROB_05
        alt_obs[0].prob_ref_adj = PROB_05
        return True
    return False


def expected_depth(observations: list[ReadObservation]) -> int:
    """Expected sequencing depth under mapping uncertainty
    (read_observation.rs:43-47)."""
    if not observations:
        return 0
    return int(round(math.exp(np_ln_sum_exp(np.array([o.prob_mapping for o in observations])))))


# ---------------------------------------------------------------------------
# tensor collation
# ---------------------------------------------------------------------------

# feature layout of the [depth, n_features] f32 observation tensor
FEATURES = [
    "prob_mapping",
    "prob_mismapping",
    "prob_alt",
    "prob_ref",
    "prob_missed_allele",
    "prob_sample_alt",
    "prob_double_overlap",
    "prob_single_overlap",
    "prob_hit_base",
    "strand",
    "read_orientation",
    "softclipped",
    "paired",
    "read_position",
    "prob_homopolymer_artifact_observable",
    "prob_homopolymer_variant_observable",
    "homopolymer_indel_len",
    "is_max_mapq",
    "alt_locus",
    "third_allele_evidence",
]
F = {name: i for i, name in enumerate(FEATURES)}
N_FEATURES = len(FEATURES)


def pileup_to_arrays(pileup: Pileup, depth: int) -> tuple[np.ndarray, np.ndarray]:
    """Pack a pileup into ([depth, N_FEATURES] f32, [depth] bool mask).

    Applies the adj-override semantics, so the tensor carries the *effective*
    probabilities the likelihood uses.  -inf is kept (f32 handles it; device
    kernels mask with finite large-negatives as needed).
    """
    feats = np.zeros((depth, N_FEATURES), dtype=np.float32)
    mask = np.zeros(depth, dtype=bool)
    obs_list = pileup.read_observations[:depth]
    for i, o in enumerate(obs_list):
        mask[i] = True
        feats[i, F["prob_mapping"]] = o.eff_prob_mapping()
        feats[i, F["prob_mismapping"]] = o.eff_prob_mismapping()
        feats[i, F["prob_alt"]] = o.eff_prob_alt()
        feats[i, F["prob_ref"]] = o.eff_prob_ref()
        feats[i, F["prob_missed_allele"]] = o.prob_missed_allele
        feats[i, F["prob_sample_alt"]] = o.prob_sample_alt
        feats[i, F["prob_double_overlap"]] = o.prob_double_overlap
        feats[i, F["prob_single_overlap"]] = o.prob_single_overlap
        feats[i, F["prob_hit_base"]] = o.prob_hit_base
        feats[i, F["strand"]] = o.strand
        feats[i, F["read_orientation"]] = o.read_orientation
        feats[i, F["softclipped"]] = float(o.softclipped)
        feats[i, F["paired"]] = float(o.paired)
        feats[i, F["read_position"]] = o.read_position
        feats[i, F["prob_homopolymer_artifact_observable"]] = (
            o.prob_observable_at_homopolymer_artifact
            if o.prob_observable_at_homopolymer_artifact is not None
            else np.nan
        )
        feats[i, F["prob_homopolymer_variant_observable"]] = (
            o.prob_observable_at_homopolymer_variant
            if o.prob_observable_at_homopolymer_variant is not None
            else np.nan
        )
        feats[i, F["homopolymer_indel_len"]] = (
            o.homopolymer_indel_len
            if o.homopolymer_indel_len is not None
            else HOMOPOLYMER_NONE
        )
        feats[i, F["is_max_mapq"]] = float(o.is_max_mapq)
        feats[i, F["alt_locus"]] = o.alt_locus
        feats[i, F["third_allele_evidence"]] = (
            o.third_allele_evidence if o.third_allele_evidence is not None else np.nan
        )
    return feats, mask


@dataclass
class ObservationBatch:
    """[n_loci, n_samples, depth, N_FEATURES] padded observation tensor."""

    features: np.ndarray
    mask: np.ndarray  # [n_loci, n_samples, depth]

    @classmethod
    def collate(cls, pileups_per_locus: list[list[Pileup]], depth: int | None = None):
        n_loci = len(pileups_per_locus)
        n_samples = len(pileups_per_locus[0]) if n_loci else 0
        if depth is None:
            depth = max(
                (len(p.read_observations) for ps in pileups_per_locus for p in ps),
                default=1,
            )
            depth = max(depth, 1)
        feats = np.zeros((n_loci, n_samples, depth, N_FEATURES), dtype=np.float32)
        mask = np.zeros((n_loci, n_samples, depth), dtype=bool)
        for li, ps in enumerate(pileups_per_locus):
            for si, p in enumerate(ps):
                f, m = pileup_to_arrays(p, depth)
                feats[li, si] = f
                mask[li, si] = m
        return cls(features=feats, mask=mask)
