"""Estimation extras: effective mutation rate (numeric parity with the
reference's inline test, estimation/effective_mutation_rate.rs:76-83),
mutational burden modes, and the 2-sample VAF scatter plot."""

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

SCENARIO = {
    "samples": {"s": {"universe": "[0.0,1.0]", "resolution": 0.05}},
    "events": {"present": "s:]0.0,1.0]"},
}


def _obs(alt: bool):
    o = ReadObservation()
    set_prob_mapping(o, -1e-9)
    if alt:
        o.prob_alt, o.prob_ref = -1e-9, math.log(1e-6)
    else:
        o.prob_alt, o.prob_ref = math.log(1e-6), -1e-9
    o.prob_missed_allele = math.log(0.5)
    o.prob_sample_alt = 0.0
    set_prob_overlap(o, -math.inf)
    return o


def _pileup(n_alt, n_ref):
    return Pileup(
        read_observations=[_obs(True)] * n_alt + [_obs(False)] * n_ref
    )


@pytest.fixture(scope="module")
def calls(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("burden")
    obs_path = tmp_path / "s.jsonl"
    with ObservationWriter(obs_path, sample_name="s") as w:
        for i, (na, nr) in enumerate([(10, 10), (5, 15), (18, 2), (0, 20)]):
            v = VariantInfo(
                kind="snv", chrom="chr1", pos=100 + 50 * i,
                ref_allele="A", alt_allele="T", alt_base="T",
            )
            w.write_record(v, _pileup(na, nr))
    out = tmp_path / "calls.vcf"
    call_generic(Scenario(SCENARIO), {"s": obs_path}, out, CallOptions())
    return out


def test_effective_mutation_rate_reference_value():
    """Williams et al. example from the reference's inline test:
    linspace(0.12, 0.25, 2539) -> slope 596.16 +- 0.01."""
    from varlociraptor_tpu.estimation.effective_mutation_rate import estimate

    e = estimate(np.linspace(0.12, 0.25, 2539))
    assert abs(e["mu_per_beta"] - 596.16) < 0.01
    assert e["n"] == 2539


def test_effective_mutation_rate_duplicate_grouping():
    """Duplicate AFs collapse to one regression point (BTreeMap keyed on
    1/f, effective_mutation_rate.rs:35-41) — they raise the cumulative
    count but get no extra regression weight."""
    from varlociraptor_tpu.estimation.effective_mutation_rate import estimate

    base = [0.12, 0.15, 0.2, 0.25]
    with_dups = base + [0.15] * 50
    e1 = estimate(base)
    e2 = estimate(with_dups)
    # same x support; duplicated 0.15 shifts cumulative counts upward but
    # the fit still has exactly 4 points
    assert e1["n"] == 4 and e2["n"] == 54
    assert np.isfinite(e2["mu_per_beta"])


ANN_CODING = (
    "T|missense_variant|MODERATE|GENE|ENSG1|Transcript|ENST1|"
    "protein_coding|1/5|x|x|x|x|42|x"
)


def _annotate(calls, tmp_path, ann=ANN_CODING):
    """Append an ANN INFO entry to every record (the reference requires
    VEP/snpEff annotation and skips unannotated records)."""
    out = tmp_path / "annotated.vcf"
    lines = []
    ann_written = False
    for line in calls.read_text().splitlines():
        if line.startswith("##") and not ann_written:
            lines.append(
                '##INFO=<ID=ANN,Number=.,Type=String,Description="ann">'
            )
            ann_written = True
        if line and not line.startswith("#"):
            f = line.split("\t")
            f[7] = f[7] + f";ANN={ann}"
            line = "\t".join(f)
        lines.append(line)
    out.write_text("\n".join(lines) + "\n")
    return out


def test_mutational_burden_modes(calls, tmp_path):
    from varlociraptor_tpu.estimation.mutational_burden import (
        collect_estimates,
    )

    annotated = _annotate(calls, tmp_path)
    curve = collect_estimates(annotated, ["present"], "s", mode="curve")
    vals = curve["data"]["values"]
    assert vals, "curve mode must emit data points"
    # SNV records stratify by substitution signature (A>T here)
    assert all(d["vartype"] == "A>T" for d in vals)
    v0 = vals[0]
    assert v0["vaf"] == 0.0 and v0["tmb"] > 0.0
    # cumulative curve is non-increasing in VAF
    tmbs = [d["tmb"] for d in vals]
    assert all(a >= b - 1e-12 for a, b in zip(tmbs, tmbs[1:]))

    hist = collect_estimates(annotated, ["present"], "s", mode="hist")
    hvals = hist["data"]["values"]
    # reference hist windows are +-0.05 around centers 0.05 apart — they
    # overlap, so masses double-count by design; just check shape/positivity
    assert hvals and all(d["tmb"] > 0.0 for d in hvals)
    assert sum(d["tmb"] for d in hvals) >= tmbs[0] - 1e-9

    multibar = collect_estimates(
        annotated, ["present"], "s", mode="multibar", cutoff=0.2
    )
    mvals = multibar["data"]["values"]
    assert mvals and all(
        d["vartype"] == "A>T" and d["sample"] == "s" for d in mvals
    )

    table = collect_estimates(annotated, ["present"], "s", mode="table")
    assert table["table"].startswith("min_vaf\ttmb\tvartype")
    assert len(table["table"].splitlines()) > 10


def test_mutational_burden_requires_annotation(calls):
    """Unannotated records are skipped (is_valid_variant warns on missing
    ANN, mutational_burden.rs:35-42) — with none left, estimation fails
    like the reference's NoRecordsFound."""
    import pytest as _pytest

    from varlociraptor_tpu.estimation.mutational_burden import (
        collect_estimates,
    )

    with _pytest.raises(ValueError, match="no valid"):
        collect_estimates(calls, ["present"], "s", mode="curve")


def test_mutational_burden_noncoding_skipped(calls, tmp_path):
    from varlociraptor_tpu.estimation.mutational_burden import (
        collect_estimates,
    )

    noncoding = _annotate(
        calls,
        tmp_path,
        ann="T|x|x|x|x|x|x|lincRNA|x|x|x|x|x|42|x",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no valid"):
        collect_estimates(noncoding, ["present"], "s", mode="curve")


def test_vaf_scatter(tmp_path):
    from varlociraptor_tpu.estimation.sample_variants import vaf_scatter

    sc = {
        "samples": {
            "a": {"universe": "[0.0,1.0]", "resolution": 0.05},
            "b": {"universe": "[0.0,1.0]", "resolution": 0.05},
        },
        "events": {"present": "a:]0.0,1.0] | b:]0.0,1.0]"},
    }
    pa = tmp_path / "a.jsonl"
    pb = tmp_path / "b.jsonl"
    for path, name, frac in ((pa, "a", (12, 8)), (pb, "b", (4, 16))):
        with ObservationWriter(path, sample_name=name) as w:
            v = VariantInfo(
                kind="snv", chrom="chr1", pos=100,
                ref_allele="A", alt_allele="T", alt_base="T",
            )
            w.write_record(v, _pileup(*frac))
    out = tmp_path / "calls.vcf"
    call_generic(Scenario(sc), {"a": pa, "b": pb}, out, CallOptions())
    spec = vaf_scatter(out, "a", "b")
    # vega v5 blueprint: source data + kde2d density + isocontour overlay
    # (templates/plots/vaf_scatter_contour.json semantics)
    by_name = {d["name"]: d for d in spec["data"]}
    pts = by_name["source"]["values"]
    assert len(pts) == 1
    assert pts[0]["sample"] == "b"
    assert pts[0]["normal_vaf"] > pts[0]["tumor_vaf"]
    assert by_name["density"]["transform"][0]["type"] == "kde2d"
    assert by_name["contours"]["transform"][0]["type"] == "isocontour"
    assert any(m["type"] == "path" for m in spec["marks"])


def test_af_to_gt_reference_semantics():
    """conversion/genotype.rs:27-45: exact 0.5/1.0/0.0 are genotyped
    directly; any other AF with DP>0 is heterozygous (subclone); no
    observations -> ./."""
    from varlociraptor_tpu.conversion.genotype import af_to_gt

    assert af_to_gt(0.5) == "0/1"
    assert af_to_gt(1.0) == "1/1"
    assert af_to_gt(0.0) == "0/0"
    assert af_to_gt(0.9, dp=20) == "0/1"
    assert af_to_gt(0.1, dp=20) == "0/1"
    assert af_to_gt(0.3, dp=0) == "./."
    assert af_to_gt(None) == "./."
