"""Observation file format (the pipeline's checkpoint artifact).

The reference serializes per-read observations into BCF INFO fields
(bincode + f16, ``/root/reference/src/calling/variants/preprocessing/mod.rs:921-1038``,
format version 15).  Our format is a gzip'd JSON-lines file carrying the same
20 per-read fields (f16-quantized log-probs like the reference's MiniLogProb)
plus the variant metadata and the serialized preprocess options in a header
line — self-describing and versioned, like the reference's BCF-header scheme
(``preprocessing/mod.rs:160-178``).
"""

from __future__ import annotations

import gzip
import json
import math

import numpy as np

from ..evidence.observation import Pileup, ReadObservation
from ..calling.variants import VariantInfo

OBSERVATION_FORMAT_VERSION = "vlt-tpu-1"  # parity target: reference v15


def _q(x):
    """f16-quantize a log-prob (MiniLogProb semantics, utils/mod.rs:448-474)."""
    if x is None:
        return None
    if x == -math.inf:
        return "-inf"
    h = float(np.float16(x))
    if math.isinf(h):
        return float(np.float32(x))
    return h


def _unq(x):
    if x is None:
        return None
    if x == "-inf":
        return -math.inf
    return float(x)


def obs_to_dict(o: ReadObservation) -> dict:
    return {
        "f": o.fragment_id,
        # MAPQ adjustment happens at preprocess time, so the *effective*
        # mapping probability is what gets serialized (the reference
        # serializes via the adjusted accessor, preprocessing/mod.rs:921+)
        "pm": _q(o.eff_prob_mapping()),
        "pa": _q(o.prob_alt),
        "pr": _q(o.prob_ref),
        "pme": _q(o.prob_missed_allele),
        "psa": _q(o.prob_sample_alt),
        "pdo": _q(o.prob_double_overlap),
        "phb": _q(o.prob_hit_base),
        "st": o.strand,
        "ro": o.read_orientation,
        "rp": o.read_position,
        "sc": int(o.softclipped),
        "pd": int(o.paired),
        "pha": _q(o.prob_observable_at_homopolymer_artifact),
        "phv": _q(o.prob_observable_at_homopolymer_variant),
        "hil": o.homopolymer_indel_len,
        "mm": int(o.is_max_mapq),
        "al": o.alt_locus,
        "ta": o.third_allele_evidence,
    }


def dict_to_obs(d: dict) -> ReadObservation:
    from ..evidence.observation import set_prob_mapping, set_prob_overlap

    o = ReadObservation()
    set_prob_mapping(o, _unq(d["pm"]))
    o.prob_alt = _unq(d["pa"])
    o.prob_ref = _unq(d["pr"])
    o.prob_missed_allele = _unq(d["pme"])
    o.prob_sample_alt = _unq(d["psa"])
    set_prob_overlap(o, _unq(d["pdo"]))
    o.prob_hit_base = _unq(d["phb"])
    o.strand = d["st"]
    o.read_orientation = d["ro"]
    o.read_position = d["rp"]
    o.softclipped = bool(d["sc"])
    o.paired = bool(d["pd"])
    o.prob_observable_at_homopolymer_artifact = _unq(d["pha"])
    o.prob_observable_at_homopolymer_variant = _unq(d["phv"])
    o.homopolymer_indel_len = d["hil"]
    o.is_max_mapq = bool(d["mm"])
    o.alt_locus = d["al"]
    o.fragment_id = d.get("f")
    o.third_allele_evidence = d["ta"]
    return o


class ObservationWriter:
    def __init__(self, path, sample_name: str, options: dict | None = None):
        self.path = path
        self._fh = gzip.open(path, "wt") if str(path).endswith(".gz") else open(path, "wt")
        header = {
            "format_version": OBSERVATION_FORMAT_VERSION,
            "sample": sample_name,
            "options": options or {},
        }
        print(json.dumps(header), file=self._fh)

    def write_record(self, variant: VariantInfo, pileup: Pileup, aux: dict | None = None):
        rec = {
            "chrom": variant.chrom,
            "pos": variant.pos,
            "kind": variant.kind,
            "ref": variant.ref_allele,
            "alt": variant.alt_allele,
            "svlen": variant.svlen,
            "precise": variant.precise,
            "haplotype": variant.haplotype,
            "het": variant.heterozygosity,
            "som": variant.somatic_effective_mutation_rate,
            "obs": [obs_to_dict(o) for o in pileup.read_observations],
        }
        if variant.cipos is not None:
            rec["cipos"] = list(variant.cipos)
        if variant.ciend is not None:
            rec["ciend"] = list(variant.ciend)
        if pileup.raw_depth is not None:
            # depth observation (reference placeholder depth_observation.rs)
            rec["dp"] = pileup.raw_depth
        if aux:
            # --propagate-info-fields passthrough (utils/aux_info.rs:52-135)
            rec["aux"] = aux
        print(json.dumps(rec), file=self._fh)

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class ObservationReader:
    def __init__(self, path):
        self.path = path
        self._fh = gzip.open(path, "rt") if str(path).endswith(".gz") else open(path, "rt")
        self.header = json.loads(self._fh.readline())
        if self.header.get("format_version") != OBSERVATION_FORMAT_VERSION:
            raise ValueError(
                f"observation format version mismatch in {path}: "
                f"{self.header.get('format_version')} != {OBSERVATION_FORMAT_VERSION}; "
                "please rerun preprocess"
            )

    @property
    def sample_name(self):
        return self.header["sample"]

    def __iter__(self):
        for line in self._fh:
            d = json.loads(line)
            variant = VariantInfo(
                kind=d["kind"],
                chrom=d["chrom"],
                pos=d["pos"],
                ref_allele=d["ref"],
                alt_allele=d["alt"],
                svlen=d.get("svlen", 0),
                precise=d.get("precise", True),
                cipos=tuple(d["cipos"]) if d.get("cipos") else None,
                ciend=tuple(d["ciend"]) if d.get("ciend") else None,
                haplotype=d.get("haplotype"),
                heterozygosity=d.get("het"),
                somatic_effective_mutation_rate=d.get("som"),
            )
            pileup = Pileup(
                read_observations=[dict_to_obs(o) for o in d["obs"]],
                raw_depth=d.get("dp"),
            )
            variant.aux_info = d.get("aux") or {}
            yield variant, pileup

    def close(self):
        self._fh.close()
