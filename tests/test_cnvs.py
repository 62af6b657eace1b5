"""Experimental CNV caller (cnvs.rs:25-700 port): a synthetic tumor/normal
call set with an amplified middle segment must yield one gain segment with
the right copy number and boundaries."""

import math

import numpy as np

from varlociraptor_tpu.calling.cnvs import CnvStates, call_cnvs
from varlociraptor_tpu.io.vcf import VcfReader, VcfRecord, VcfWriter


def _calls_vcf(path):
    """60 het loci: normal depth 40 everywhere; tumor depth doubles and VAF
    shifts to 1/3 / 2/3 inside loci 20..40 (one-copy gain, af=1.0)."""
    rng = np.random.default_rng(5)
    header = [
        '##INFO=<ID=PROB_GERMLINE_HET,Number=A,Type=Float,Description="x">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="x">',
        '##FORMAT=<ID=AF,Number=1,Type=Float,Description="x">',
    ]
    with VcfWriter(path, sample_names=["tumor", "normal"], header_lines=header) as w:
        for i in range(60):
            in_cnv = 20 <= i < 40
            d_n = 40
            d_t = int(rng.poisson(60 if in_cnv else 40))
            af_t = (
                (1 / 3 if rng.random() < 0.5 else 2 / 3)
                if in_cnv
                else 0.5 + rng.normal(0, 0.02)
            )
            w.write(
                VcfRecord(
                    chrom="chr1",
                    pos=1000 + i * 500,
                    id=".",
                    ref="A",
                    alts=["T"],
                    info={"PROB_GERMLINE_HET": "0.01"},
                    format=["DP", "AF"],
                    samples=[
                        {"DP": str(d_t), "AF": f"{af_t:.4f}"},
                        {"DP": str(d_n), "AF": "0.5"},
                    ],
                )
            )


def test_states_match_reference_structure():
    s = CnvStates.build(purity=1.0)
    # 10 afs x 22 non-zero gains + 1 null state at af=1.0
    assert s.n == 10 * 22 + 1
    assert s.gain[s.null_state()] == 0
    f = s.expected_depth_factor()
    null = s.null_state()
    assert abs(f[null] - 1.0) < 1e-12


def test_cnv_segmentation(tmp_path):
    calls = tmp_path / "calls.vcf"
    _calls_vcf(calls)
    out = tmp_path / "cnvs.vcf"
    n = call_cnvs(
        calls, out, tumor_sample="tumor", normal_sample="normal",
        purity=0.95, min_bayes_factor=1e3,
    )
    assert n >= 1
    recs = VcfReader(out).records()
    seg = max(recs, key=lambda r: float(r.qual))
    assert seg.alts == ["<CNV>"]
    cn = int(seg.info["CN"])
    assert cn == 3, seg.info  # one-copy gain
    # boundaries within a couple of loci of the simulated segment
    assert abs(seg.pos - (1000 + 20 * 500)) <= 2 * 500
    assert abs(int(seg.info["END"]) - (1000 + 39 * 500)) <= 2 * 500 + 1
    assert float(seg.qual) > 10  # confident vs no-CNV


def test_cnv_depth_from_observation_files(tmp_path):
    """Depth observations (the reference's unfilled placeholder,
    depth_observation.rs / sample.rs:330 TODO) flow from preprocess
    observation files into the CNV caller: the calls' FORMAT DP is
    deliberately WRONG (flat 40 everywhere — as if --max-depth capped it),
    while the observation files carry the true amplified coverage; the
    gain is only recoverable through --tumor-obs/--normal-obs."""
    from varlociraptor_tpu.calling.observations import (
        ObservationWriter,
    )
    from varlociraptor_tpu.calling.variants import VariantInfo
    from varlociraptor_tpu.evidence.observation import Pileup

    rng = np.random.default_rng(7)
    header = [
        '##INFO=<ID=PROB_GERMLINE_HET,Number=A,Type=Float,Description="x">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="x">',
        '##FORMAT=<ID=AF,Number=1,Type=Float,Description="x">',
    ]
    calls = tmp_path / "calls.vcf"
    obs = {}
    writers = {
        s: ObservationWriter(tmp_path / f"{s}.obs.jsonl", sample_name=s)
        for s in ("tumor", "normal")
    }
    with VcfWriter(calls, sample_names=["tumor", "normal"], header_lines=header) as w:
        for i in range(60):
            in_cnv = 20 <= i < 40
            pos = 1000 + i * 500
            d_t = int(rng.poisson(80 if in_cnv else 40))
            # two-copy gain: VAF 1/4 or 3/4, depth 2x (consistent CN 4)
            af_t = (
                (1 / 4 if rng.random() < 0.5 else 3 / 4)
                if in_cnv
                else 0.5 + rng.normal(0, 0.02)
            )
            w.write(
                VcfRecord(
                    chrom="chr1", pos=pos, id=".", ref="A", alts=["T"],
                    info={"PROB_GERMLINE_HET": "0.01"},
                    format=["DP", "AF"],
                    samples=[
                        {"DP": "40", "AF": f"{af_t:.4f}"},  # capped/wrong
                        {"DP": "40", "AF": "0.5"},
                    ],
                )
            )
            vi = VariantInfo(
                kind="snv", chrom="chr1", pos=pos,
                ref_allele="A", alt_allele="T", alt_base="T",
            )
            writers["tumor"].write_record(
                vi, Pileup(read_observations=[], raw_depth=d_t)
            )
            writers["normal"].write_record(
                vi, Pileup(read_observations=[], raw_depth=40)
            )
    for w_ in writers.values():
        w_.close()

    # without obs files: flat DP -> depth signal invisible, no confident
    # 3-copy gain segment recoverable from depth
    out_plain = tmp_path / "plain.vcf"
    call_cnvs(
        calls, out_plain, tumor_sample="tumor", normal_sample="normal",
        purity=0.95, min_bayes_factor=1e3,
    )
    plain_cns = [
        int(r.info["CN"])
        for r in VcfReader(out_plain).records()
        if float(r.qual) > 10
    ]

    out_obs = tmp_path / "withobs.vcf"
    n = call_cnvs(
        calls, out_obs, tumor_sample="tumor", normal_sample="normal",
        purity=0.95, min_bayes_factor=1e3,
        tumor_obs=tmp_path / "tumor.obs.jsonl",
        normal_obs=tmp_path / "normal.obs.jsonl",
    )
    assert n >= 1
    recs = VcfReader(out_obs).records()
    seg = max(recs, key=lambda r: float(r.qual))
    cn = int(seg.info["CN"])
    assert cn == 4, seg.info  # two-copy gain (depth 2x at af~1/2 shift)
    assert float(seg.qual) > 10
    assert abs(seg.pos - (1000 + 20 * 500)) <= 2 * 500
    # the plain run must NOT see the same confident depth-driven gain
    assert cn not in plain_cns


def test_allele_freq_pdf_reference_edges():
    """cnvs.rs:442-455 inline test: impossible binomial outcomes are
    ln_zero (k=round(af*depth); p=1 with k<n, and p=0 with k>0)."""
    import numpy as np

    from varlociraptor_tpu.calling.cnvs import _ln_binom_pmf

    assert _ln_binom_pmf(np.array([round(0.64 * 10)]), 1.0, np.array([10]))[0] == -np.inf
    assert _ln_binom_pmf(np.array([round(0.1 * 10)]), 0.0, np.array([10]))[0] == -np.inf
