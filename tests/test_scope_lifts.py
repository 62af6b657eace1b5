"""Round-2 scope-limit lifts: full-prior trios (prior.rs:718-761), chained
l2fc, multi-motif methylation candidates (cli.rs:128-132), strict scenario
YAML validation (grammar/mod.rs:131 deny_unknown_fields)."""

import math

import numpy as np
import pytest

from varlociraptor_tpu.calling.call import CallOptions, call_generic
from varlociraptor_tpu.calling.observations import ObservationWriter
from varlociraptor_tpu.calling.variants import VariantInfo
from varlociraptor_tpu.evidence.observation import (
    Pileup,
    ReadObservation,
    set_prob_mapping,
    set_prob_overlap,
)
from varlociraptor_tpu.grammar.scenario import Scenario
from varlociraptor_tpu.io.vcf import VcfReader

TRIO_SCENARIO = {
    "samples": {
        "mother": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.1},
        "father": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.1},
        "child": {
            "universe": "[0.0,1.0]",
            "ploidy": 2,
            "resolution": 0.1,
            "inheritance": {"mendelian": {"from": ["mother", "father"]}},
        },
    },
    "species": {"heterozygosity": 0.001, "germline-mutation-rate": 1e-3},
    "events": {
        "germline": "mother:0.5 & father:0.0 & child:0.5",
        "denovo": "mother:0.0 & father:0.0 & child:0.5",
    },
}


def _obs(alt: bool):
    o = ReadObservation()
    set_prob_mapping(o, -1e-9)
    o.prob_alt = -1e-9 if alt else math.log(1e-8)
    o.prob_ref = math.log(1e-8) if alt else -1e-9
    o.prob_missed_allele = math.log(0.5)
    o.prob_sample_alt = 0.0
    set_prob_overlap(o, -math.inf)
    return o


def _pileup(n_alt, n_ref):
    return Pileup(
        read_observations=[_obs(True) for _ in range(n_alt)]
        + [_obs(False) for _ in range(n_ref)]
    )


def test_full_prior_trio(tmp_path):
    """--full-prior with S=3 (mendelian trio) runs through the dense joint
    prior path and prefers inherited-het over denovo when the mother is het."""
    scenario = Scenario(TRIO_SCENARIO)
    piles = {
        "mother": _pileup(10, 10),
        "father": _pileup(0, 20),
        "child": _pileup(10, 10),
    }
    obs_paths = {}
    for name, pile in piles.items():
        p = tmp_path / f"{name}.obs.jsonl"
        with ObservationWriter(p, sample_name=name) as w:
            w.write_record(
                VariantInfo(
                    kind="snv", chrom="chr1", pos=100,
                    ref_allele="A", alt_allele="T", alt_base="T",
                ),
                pile,
            )
        obs_paths[name] = p
    out = tmp_path / "calls.vcf"
    n = call_generic(
        scenario, obs_paths, out,
        CallOptions(full_prior=True, resolution=0.1, batch_size=4),
    )
    assert n == 1
    rec = VcfReader(out).records()[0]
    pg = float(rec.info["PROB_GERMLINE"])
    pd = float(rec.info["PROB_DENOVO"]) if rec.info["PROB_DENOVO"] != "inf" else np.inf
    assert np.isfinite(pg)
    assert pg < pd  # inherited het beats denovo under the mendelian prior


def test_multi_motif_methylation_candidates(tmp_path):
    from varlociraptor_tpu.candidates.methylation import find_candidates

    ref = tmp_path / "ref.fa"
    ref.write_text(">c1\nACGGATCCGTA\n")
    (tmp_path / "ref.fa.fai").write_text("c1\t11\t4\t11\t12\n")
    n_cg = find_candidates(ref, tmp_path / "cg.vcf", motif="CG")
    n_gatc = find_candidates(ref, tmp_path / "gatc.vcf", motif="GATC")
    n_both = find_candidates(ref, tmp_path / "both.vcf", motif="CG,GATC")
    assert n_both == n_cg + n_gatc > 0
    recs = VcfReader(tmp_path / "both.vcf").records()
    assert [r.pos for r in recs] == sorted(r.pos for r in recs)


def test_strict_scenario_yaml_rejects_unknown_fields():
    with pytest.raises(ValueError, match="unknown field"):
        Scenario(
            {
                "samples": {"s": {"universe": "[0.0,1.0]", "ploidyy": 2}},
                "events": {"present": "s:]0.0,1.0]"},
            }
        )
    with pytest.raises(ValueError, match="unknown field"):
        Scenario(
            {
                "samples": {"s": {"universe": "[0.0,1.0]"}},
                "events": {"present": "s:]0.0,1.0]"},
                "extra_top": 1,
            }
        )
