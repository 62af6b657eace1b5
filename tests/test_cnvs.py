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
