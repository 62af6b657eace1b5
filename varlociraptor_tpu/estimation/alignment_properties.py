"""Alignment properties: insert-size stats, CIGAR extrema, error-model params.

Mirrors the reference's ``AlignmentProperties``
(``/root/reference/src/estimation/alignment_properties.rs:58-79``) including its
JSON serialization (testcase ``properties`` strings round-trip).  Estimation
from BAM (``estimate()``, reference ``alignment_properties.rs:148-465``) is
implemented in numpy over the first N records.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import numpy as np

LOG_ZERO = -math.inf


def _logprob_from_rate(rate: float) -> float:
    return math.log(rate) if rate > 0 else LOG_ZERO


@dataclass
class InsertSize:
    mean: float = 0.0
    sd: float = 0.0


@dataclass
class GapParams:
    """PairHMM gap open/extend log-probabilities
    (reference pairhmm.rs:122-142; defaults ins 2.8e-6 / del 5.1e-6)."""

    prob_insertion_artifact: float = math.log(2.8e-6)
    prob_deletion_artifact: float = math.log(5.1e-6)
    prob_insertion_extend_artifact: float = LOG_ZERO
    prob_deletion_extend_artifact: float = LOG_ZERO


@dataclass
class HopParams:
    """Homopolymer hop log-probs per base (A,C,G,T) for the homopolymer
    pair-HMM (reference pairhmm.rs:208-294)."""

    prob_seq_homopolymer: list = field(default_factory=lambda: [LOG_ZERO] * 4)
    prob_ref_homopolymer: list = field(default_factory=lambda: [LOG_ZERO] * 4)
    prob_seq_extend_homopolymer: list = field(default_factory=lambda: [LOG_ZERO] * 4)
    prob_ref_extend_homopolymer: list = field(default_factory=lambda: [LOG_ZERO] * 4)


def _default_homopolymer_error_model():
    # BackwardsCompatibility::default_homopolymer_error_model
    # (alignment_properties.rs:39-50)
    return {
        0: 0.9975414130829068,
        1: 0.0010076175889726332,
        -1: 0.0010076175889726332,
        -2: 0.00020152351779452663,
        2: 0.00010076175889726332,
        3: 5.038087944863166e-5,
        -3: 9.068558300753699e-5,
    }


@dataclass
class AlignmentProperties:
    insert_size: InsertSize | None = None
    max_del_cigar_len: int | None = None
    max_ins_cigar_len: int | None = None
    frac_max_softclip: float | None = None
    max_read_len: int = 100
    max_mapq: int = 60
    gap_params: GapParams = field(default_factory=GapParams)
    hop_params: HopParams = field(default_factory=HopParams)
    wildtype_homopolymer_error_model: dict = field(
        default_factory=_default_homopolymer_error_model
    )
    initial: bool = False

    # ------------------------------------------------------------------
    @classmethod
    def from_json(cls, text: str) -> "AlignmentProperties":
        d = json.loads(text)
        props = cls()
        if d.get("insert_size") is not None:
            props.insert_size = InsertSize(
                mean=d["insert_size"]["mean"], sd=d["insert_size"]["sd"]
            )
        props.max_del_cigar_len = d.get("max_del_cigar_len")
        props.max_ins_cigar_len = d.get("max_ins_cigar_len")
        props.frac_max_softclip = d.get("frac_max_softclip")
        props.max_read_len = d.get("max_read_len", 100)
        props.max_mapq = d.get("max_mapq", 60)
        if "gap_params" in d and d["gap_params"] is not None:
            g = d["gap_params"]

            def lp(v):
                return v if v is not None else LOG_ZERO

            props.gap_params = GapParams(
                prob_insertion_artifact=lp(g.get("prob_insertion_artifact")),
                prob_deletion_artifact=lp(g.get("prob_deletion_artifact")),
                prob_insertion_extend_artifact=lp(g.get("prob_insertion_extend_artifact")),
                prob_deletion_extend_artifact=lp(g.get("prob_deletion_extend_artifact")),
            )
        if "hop_params" in d and d["hop_params"] is not None:
            h = d["hop_params"]

            def lpv(v):
                return [x if x is not None else LOG_ZERO for x in v]

            props.hop_params = HopParams(
                prob_seq_homopolymer=lpv(h["prob_seq_homopolymer"]),
                prob_ref_homopolymer=lpv(h["prob_ref_homopolymer"]),
                prob_seq_extend_homopolymer=lpv(h["prob_seq_extend_homopolymer"]),
                prob_ref_extend_homopolymer=lpv(h["prob_ref_extend_homopolymer"]),
            )
        if "wildtype_homopolymer_error_model" in d:
            props.wildtype_homopolymer_error_model = {
                int(k): v for k, v in d["wildtype_homopolymer_error_model"].items()
            }
        return props

    def to_json(self) -> str:
        def lp(v):
            return None if v == LOG_ZERO else v

        return json.dumps(
            {
                "insert_size": (
                    {"mean": self.insert_size.mean, "sd": self.insert_size.sd}
                    if self.insert_size
                    else None
                ),
                "max_del_cigar_len": self.max_del_cigar_len,
                "max_ins_cigar_len": self.max_ins_cigar_len,
                "frac_max_softclip": self.frac_max_softclip,
                "max_read_len": self.max_read_len,
                "max_mapq": self.max_mapq,
                "gap_params": {
                    "prob_insertion_artifact": lp(self.gap_params.prob_insertion_artifact),
                    "prob_deletion_artifact": lp(self.gap_params.prob_deletion_artifact),
                    "prob_insertion_extend_artifact": lp(
                        self.gap_params.prob_insertion_extend_artifact
                    ),
                    "prob_deletion_extend_artifact": lp(
                        self.gap_params.prob_deletion_extend_artifact
                    ),
                },
                "hop_params": {
                    "prob_seq_homopolymer": [lp(x) for x in self.hop_params.prob_seq_homopolymer],
                    "prob_ref_homopolymer": [lp(x) for x in self.hop_params.prob_ref_homopolymer],
                    "prob_seq_extend_homopolymer": [
                        lp(x) for x in self.hop_params.prob_seq_extend_homopolymer
                    ],
                    "prob_ref_extend_homopolymer": [
                        lp(x) for x in self.hop_params.prob_ref_extend_homopolymer
                    ],
                },
                "wildtype_homopolymer_error_model": {
                    str(k): v for k, v in self.wildtype_homopolymer_error_model.items()
                },
            }
        )

    # ------------------------------------------------------------------
    def update_max_cigar_ops_len(self, record, allow_hardclips: bool = False):
        """Continuously track maxima while preprocessing
        (alignment_properties.rs:94-144)."""
        from ..io.bam import OP_D, OP_H, OP_I, OP_S

        is_regular = True
        has_soft_clip = False
        read_len = max(record.read_len, 1)
        for op, l in record.cigar:
            if op == OP_S:
                frac = l / read_len
                if self.frac_max_softclip is not None:
                    self.frac_max_softclip = max(self.frac_max_softclip, frac)
                elif self.initial:
                    self.frac_max_softclip = frac
                is_regular = False
                has_soft_clip = True
            elif op == OP_D:
                if self.max_del_cigar_len is not None:
                    self.max_del_cigar_len = max(self.max_del_cigar_len, int(l))
                elif self.initial:
                    self.max_del_cigar_len = int(l)
                is_regular = False
            elif op == OP_I:
                if self.max_ins_cigar_len is not None:
                    self.max_ins_cigar_len = max(self.max_ins_cigar_len, int(l))
                elif self.initial:
                    self.max_ins_cigar_len = int(l)
                is_regular = False
            elif op == OP_H and not allow_hardclips:
                is_regular = False
        return is_regular, has_soft_clip


def estimate(bam_reader, omit_insert_size: bool = False, num_records: int | None = None):
    """Estimate alignment properties from the first records of a BAM.

    Simplified but behaviorally matching estimator (reference
    ``alignment_properties.rs:148-465``): 5-95 percentile-trimmed insert-size
    mean/sd over proper pairs, CIGAR maxima, max read len, max MAPQ observed.
    Gap/hop MLE from transition counts is deferred to the full estimator.
    """
    props = AlignmentProperties(initial=True)
    props.max_del_cigar_len = None
    props.max_ins_cigar_len = None
    props.frac_max_softclip = None

    tlens = []
    max_read_len = 0
    max_mapq = 0
    n = 0
    n_records = num_records or 1_000_000
    for rec in bam_reader:
        if rec.is_unmapped or rec.is_duplicate or rec.is_secondary or rec.is_qc_fail:
            continue
        n += 1
        if n > n_records:
            break
        max_read_len = max(max_read_len, rec.read_len)
        max_mapq = max(max_mapq, rec.mapq)
        props.update_max_cigar_ops_len(rec)
        if (
            not omit_insert_size
            and rec.is_paired
            and not rec.is_mate_unmapped
            and rec.tid == rec.mtid
            and rec.tlen > 0
            and not rec.is_supplementary
        ):
            tlens.append(rec.tlen)

    props.initial = False
    props.max_read_len = max(max_read_len, 1)
    props.max_mapq = max_mapq
    if tlens and not omit_insert_size:
        arr = np.array(tlens, dtype=np.float64)
        lo, hi = np.percentile(arr, [5.0, 95.0])
        trimmed = arr[(arr >= lo) & (arr <= hi)]
        if len(trimmed) >= 2:
            props.insert_size = InsertSize(
                mean=float(np.mean(trimmed)), sd=float(np.std(trimmed, ddof=1))
            )
    return props
