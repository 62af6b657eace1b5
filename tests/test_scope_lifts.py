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


CONTAM_TRIO_SCENARIO = {
    "samples": {
        "normal": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.1},
        "tumor": {
            "universe": "[0.0,1.0]",
            "resolution": 0.1,
            "contamination": {"by": "normal", "fraction": 0.25},
        },
        "relapse": {
            "universe": "[0.0,1.0]",
            "resolution": 0.1,
            "contamination": {"by": "normal", "fraction": 0.4},
        },
    },
    "species": {"heterozygosity": 0.001},
    "events": {
        "somatic": "tumor:]0.0,1.0] & normal:0.0 & relapse:]0.0,1.0]",
        "germline": "tumor:]0.0,1.0] & normal:0.5 & relapse:]0.0,1.0]",
    },
}


def _write_trio_obs(tmp_path, piles, tag):
    obs_paths = {}
    for name, pile in piles.items():
        p = tmp_path / f"{tag}-{name}.obs.jsonl"
        with ObservationWriter(p, sample_name=name) as w:
            w.write_record(
                VariantInfo(
                    kind="snv", chrom="chr1", pos=100,
                    ref_allele="A", alt_allele="T", alt_base="T",
                ),
                pile,
            )
        obs_paths[name] = p
    return obs_paths


def _probs(out):
    rec = VcfReader(out).records()[0]
    return {
        k: float(v)
        for k, v in rec.info.items()
        if k.startswith("PROB_") and v != "inf"
    }


def test_full_prior_contaminated_three_samples(tmp_path):
    """--full-prior with S=3 AND contamination (the round-2
    NotImplementedError at ops/posterior.py): the generic joint contraction
    must (a) reduce exactly to the pure-pedigree path at fraction 0.0 and
    (b) produce finite, correctly-ordered posteriors at real fractions
    (prior.rs:298-438 composed with likelihood.rs:63-158 has no sample
    limit in the reference)."""
    import copy

    piles = {
        "normal": _pileup(0, 20),
        "tumor": _pileup(10, 10),
        "relapse": _pileup(8, 12),
    }
    obs_paths = _write_trio_obs(tmp_path, piles, "c")
    opts = CallOptions(full_prior=True, resolution=0.1, batch_size=4)

    # (a) fraction 0.0 == no contamination entry at all
    zero = copy.deepcopy(CONTAM_TRIO_SCENARIO)
    zero["samples"]["tumor"]["contamination"]["fraction"] = 0.0
    zero["samples"]["relapse"]["contamination"]["fraction"] = 0.0
    out_zero = tmp_path / "zero.vcf"
    call_generic(Scenario(zero), obs_paths, out_zero, opts)

    clean = copy.deepcopy(CONTAM_TRIO_SCENARIO)
    del clean["samples"]["tumor"]["contamination"]
    del clean["samples"]["relapse"]["contamination"]
    out_clean = tmp_path / "clean.vcf"
    call_generic(Scenario(clean), obs_paths, out_clean, opts)

    pz, pc = _probs(out_zero), _probs(out_clean)
    assert set(pz) == set(pc)
    for k in pz:
        assert abs(pz[k] - pc[k]) < 1e-2, (k, pz[k], pc[k])

    # (b) real contamination fractions: finite + somatic wins this pileup
    out = tmp_path / "contam.vcf"
    call_generic(Scenario(CONTAM_TRIO_SCENARIO), obs_paths, out, opts)
    p = _probs(out)
    assert np.isfinite(p["PROB_SOMATIC"])
    assert p["PROB_SOMATIC"] < p.get("PROB_GERMLINE", np.inf)
    assert p["PROB_SOMATIC"] < p.get("PROB_ABSENT", np.inf)


def test_full_prior_contaminated_four_samples_axis_placement(tmp_path):
    """S=4 exercises the remaining pair-factor placements of the generic
    contraction: a (sample1 by sample0) pair lands entirely on the LEAD
    axes and a (sample2 by sample3) pair entirely on the TAIL axes."""
    import copy

    scenario = {
        "samples": {
            "s0": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.25},
            "s1": {
                "universe": "[0.0,1.0]",
                "resolution": 0.25,
                "contamination": {"by": "s0", "fraction": 0.3},
            },
            "s2": {
                "universe": "[0.0,1.0]",
                "resolution": 0.25,
                "contamination": {"by": "s3", "fraction": 0.2},
            },
            "s3": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.25},
        },
        "species": {"heterozygosity": 0.001},
        "events": {
            "present": "s0:]0.0,1.0] | s1:]0.0,1.0] | s2:]0.0,1.0] | s3:]0.0,1.0]",
        },
    }
    piles = {
        "s0": _pileup(0, 16),
        "s1": _pileup(8, 8),
        "s2": _pileup(8, 8),
        "s3": _pileup(0, 16),
    }
    obs_paths = _write_trio_obs(tmp_path, piles, "q")
    opts = CallOptions(full_prior=True, resolution=0.25, batch_size=4)

    zero = copy.deepcopy(scenario)
    zero["samples"]["s1"]["contamination"]["fraction"] = 0.0
    zero["samples"]["s2"]["contamination"]["fraction"] = 0.0
    out_zero = tmp_path / "q-zero.vcf"
    call_generic(Scenario(zero), obs_paths, out_zero, opts)

    clean = copy.deepcopy(scenario)
    del clean["samples"]["s1"]["contamination"]
    del clean["samples"]["s2"]["contamination"]
    out_clean = tmp_path / "q-clean.vcf"
    call_generic(Scenario(clean), obs_paths, out_clean, opts)

    pz, pc = _probs(out_zero), _probs(out_clean)
    assert set(pz) == set(pc)
    for k in pz:
        assert abs(pz[k] - pc[k]) < 1e-2, (k, pz[k], pc[k])

    out = tmp_path / "q-contam.vcf"
    call_generic(Scenario(scenario), obs_paths, out, opts)
    p = _probs(out)
    assert np.isfinite(p["PROB_PRESENT"])
    assert p["PROB_PRESENT"] < p.get("PROB_ABSENT", np.inf)


def test_full_prior_contaminated_lead_by_tail_placement(tmp_path):
    """S=4 with s1 contaminated BY s3: the pair factor spans a LEAD axis
    (si=1) and a TAIL axis (by=3) — the row-placement branch."""
    import copy

    scenario = {
        "samples": {
            "s0": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.25},
            "s1": {
                "universe": "[0.0,1.0]",
                "resolution": 0.25,
                "contamination": {"by": "s3", "fraction": 0.35},
            },
            "s2": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.25},
            "s3": {"universe": "[0.0,1.0]", "ploidy": 2, "resolution": 0.25},
        },
        "species": {"heterozygosity": 0.001},
        "events": {
            "present": "s0:]0.0,1.0] | s1:]0.0,1.0] | s2:]0.0,1.0] | s3:]0.0,1.0]",
        },
    }
    piles = {
        "s0": _pileup(0, 16),
        "s1": _pileup(8, 8),
        "s2": _pileup(0, 16),
        "s3": _pileup(4, 12),
    }
    obs_paths = _write_trio_obs(tmp_path, piles, "r")
    opts = CallOptions(full_prior=True, resolution=0.25, batch_size=4)

    zero = copy.deepcopy(scenario)
    zero["samples"]["s1"]["contamination"]["fraction"] = 0.0
    out_zero = tmp_path / "r-zero.vcf"
    call_generic(Scenario(zero), obs_paths, out_zero, opts)
    clean = copy.deepcopy(scenario)
    del clean["samples"]["s1"]["contamination"]
    out_clean = tmp_path / "r-clean.vcf"
    call_generic(Scenario(clean), obs_paths, out_clean, opts)
    pz, pc = _probs(out_zero), _probs(out_clean)
    for k in pz:
        assert abs(pz[k] - pc[k]) < 1e-2, (k, pz[k], pc[k])

    out = tmp_path / "r-contam.vcf"
    call_generic(Scenario(scenario), obs_paths, out, opts)
    assert np.isfinite(_probs(out)["PROB_PRESENT"])
