"""Model-based contamination estimation (contamination.rs:36-473): on a
constructed two-sample fixture whose somatic VAF spectrum is scaled by a
known purity, the posterior must recover the contamination fraction."""

import math

import numpy as np

from varlociraptor_tpu.calling.observations import ObservationWriter
from varlociraptor_tpu.calling.variants import VariantInfo
from varlociraptor_tpu.estimation.contamination import (
    estimate_contamination,
    write_tsv,
)
from varlociraptor_tpu.evidence.observation import (
    Pileup,
    ReadObservation,
    set_prob_mapping,
    set_prob_overlap,
)

TRUE_CONTAMINATION = 0.3  # purity 0.7


def _obs(alt: bool):
    o = ReadObservation()
    set_prob_mapping(o, -1e-9)
    o.prob_alt = -1e-9 if alt else math.log(1e-8)
    o.prob_ref = math.log(1e-8) if alt else -1e-9
    o.prob_missed_allele = math.log(0.5)
    o.prob_sample_alt = 0.0
    set_prob_overlap(o, -math.inf)
    return o


def _write_fixture(tmp_path):
    purity = 1.0 - TRUE_CONTAMINATION
    depth = 60
    # somatic VAF quantiles up to max somatic VAF 1.0, observed scaled by purity
    true_vafs = np.linspace(0.1, 1.0, 24)
    paths = {}
    for name in ("sample", "contaminant"):
        path = tmp_path / f"{name}.obs.jsonl"
        with ObservationWriter(path, sample_name=name) as w:
            for i, v in enumerate(true_vafs):
                if name == "sample":
                    k = int(round(depth * purity * v))
                    pile = Pileup(
                        read_observations=[_obs(True) for _ in range(k)]
                        + [_obs(False) for _ in range(depth - k)]
                    )
                else:
                    pile = Pileup(
                        read_observations=[_obs(False) for _ in range(30)]
                    )
                w.write_record(
                    VariantInfo(
                        kind="snv", chrom="chr1", pos=1000 + 100 * i,
                        ref_allele="A", alt_allele="T", alt_base="T",
                    ),
                    pile,
                )
        paths[name] = path
    return paths


def test_recovers_known_contamination(tmp_path):
    paths = _write_fixture(tmp_path)
    result = estimate_contamination(paths["sample"], paths["contaminant"])
    assert result["n_variants"] >= 20
    best = result["rows"][0]
    # the ems=1.0 curve should dominate and peak at the true contamination
    assert best["expected_max_somatic_vaf"] == 1.0
    assert abs(best["contamination"] - TRUE_CONTAMINATION) <= 0.05, best
    # TSV writes the reference's layout
    import io

    buf = io.StringIO()
    write_tsv(result, buf)
    header = buf.getvalue().splitlines()[0]
    assert header == "maximum somatic VAF\tcontamination\tposterior density"


def test_pathologist_prior_shifts_posterior(tmp_path):
    paths = _write_fixture(tmp_path)
    free = estimate_contamination(paths["sample"], paths["contaminant"])
    # a sharp prior at 60% contamination from 1000 counted cells must pull
    # the posterior towards it
    strong = estimate_contamination(
        paths["sample"], paths["contaminant"], prior_estimate=(0.6, 1000)
    )
    assert (
        strong["max_posterior_contamination"]
        > free["max_posterior_contamination"]
    )
