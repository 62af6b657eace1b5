"""End-to-end CLI tests: preprocess -> call -> filter -> conversions."""

import json

import pytest

from varlociraptor_tpu.cli import run
from varlociraptor_tpu.io.vcf import VcfReader


@pytest.fixture(scope="module")
def testcase_dir(ref_resources):
    return ref_resources / "testcases" / "test01"


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory, testcase_dir):
    """Run preprocess for both samples + tumor-normal calling once."""
    tmp = tmp_path_factory.mktemp("cli")
    # write the inline reference
    import yaml

    doc = yaml.safe_load(open(testcase_dir / "testcase.yaml"))
    ref_path = tmp / "ref.fa"
    ref_path.write_text(f">{doc['reference']['name']}\n{doc['reference']['seq']}\n")
    props = tmp / "props.json"
    props.write_text(doc["samples"]["tumor"]["properties"])

    for name in ("tumor", "normal"):
        assert (
            run(
                [
                    "preprocess",
                    "variants",
                    str(ref_path),
                    "--bam",
                    str(testcase_dir / f"{name}.bam"),
                    "--candidates",
                    str(testcase_dir / "candidates.vcf"),
                    "--output",
                    str(tmp / f"{name}.obs.jsonl"),
                    "--sample-name",
                    name,
                    "--alignment-properties",
                    str(props),
                ]
            )
            == 0
        )
    assert (
        run(
            [
                "call",
                "variants",
                "tumor-normal",
                "--tumor",
                str(tmp / "tumor.obs.jsonl"),
                "--normal",
                str(tmp / "normal.obs.jsonl"),
                "--purity",
                "1.0",
                "--output",
                str(tmp / "calls.vcf"),
            ]
        )
        == 0
    )
    return tmp


def test_call_output(pipeline):
    recs = VcfReader(pipeline / "calls.vcf").records()
    assert len(recs) == 1
    assert "PROB_SOMATIC_TUMOR" in recs[0].info
    assert "PROB_ABSENT" in recs[0].info


def test_fdr_filter(pipeline):
    assert (
        run(
            [
                "filter-calls",
                "control-fdr",
                str(pipeline / "calls.vcf"),
                "--output",
                str(pipeline / "fdr.vcf"),
                "--events",
                "somatic_tumor",
                "--fdr",
                "1.0",
            ]
        )
        == 0
    )
    VcfReader(pipeline / "fdr.vcf").records()


def test_posterior_odds(pipeline):
    assert (
        run(
            [
                "filter-calls",
                "posterior-odds",
                str(pipeline / "calls.vcf"),
                "--output",
                str(pipeline / "odds.vcf"),
                "--events",
                "somatic_tumor",
                "--odds",
                "none",
            ]
        )
        == 0
    )


def test_decode_phred_and_genotype(pipeline):
    assert (
        run(
            [
                "decode-phred",
                str(pipeline / "calls.vcf"),
                "--output",
                str(pipeline / "plain.vcf"),
            ]
        )
        == 0
    )
    rec = VcfReader(pipeline / "plain.vcf").records()[0]
    p = float(rec.info["PROB_ABSENT"])
    assert 0.0 <= p <= 1.0
    assert (
        run(
            [
                "genotype",
                str(pipeline / "calls.vcf"),
                "--output",
                str(pipeline / "gt.vcf"),
            ]
        )
        == 0
    )
    rec = VcfReader(pipeline / "gt.vcf").records()[0]
    assert rec.samples[0]["GT"] in ("0/0", "0/1", "1/1", "./.")


def test_methylation_candidates(tmp_path):
    fa = tmp_path / "m.fa"
    fa.write_text(">c\nACGCGATCTT\n")
    out = tmp_path / "meth.vcf"
    assert run(["methylation-candidates", str(fa), str(out)]) == 0
    recs = VcfReader(out).records()
    assert len(recs) == 2  # CG at 2 and 4? (ACGCGATC: CG at idx 1? -> verify >0)
    assert all(r.alts == ["<METH>"] for r in recs)


def test_estimate_alignment_properties_cli(ref_tests, capsys):
    assert (
        run(
            [
                "estimate",
                "alignment-properties",
                str(ref_tests / "chr17.prefix.fa"),
                "--bam",
                str(ref_tests / "test.bam"),
            ]
        )
        == 0
    )
    props = json.loads(capsys.readouterr().out)
    assert props["max_read_len"] > 0


def test_meth_candidates_reference_count(ref_tests, tmp_path):
    """tests/lib.rs:453-458: CG candidates on test_meth_ev_1 == 6."""
    from varlociraptor_tpu.candidates.methylation import find_candidates

    n = find_candidates(
        ref_tests / "resources/test_meth_ev_1/genome.fasta",
        tmp_path / "cand.vcf",
        motif="CG",
    )
    assert n == 6


def test_call_on_reference_observation_file(ref_resources, tmp_path):
    """Interop: call directly on a varlociraptor-preprocessed observation
    record (bincode-packed BCF INFO arrays, preprocessing/mod.rs:818-1038).
    giab_12's embedded observations must yield the het call its testcase
    expects."""
    from varlociraptor_tpu.calling.call import CallOptions, call_generic
    from varlociraptor_tpu.grammar.scenario import Scenario
    from varlociraptor_tpu.io.vcf import open_variant_file

    td = ref_resources / "testcases/test_giab_12"
    sc = Scenario.from_path(td / "scenario.yaml")
    out = tmp_path / "calls.vcf"
    n = call_generic(sc, {"index": td / "candidates.vcf"}, out, CallOptions())
    assert n == 1
    rec = open_variant_file(out).records()[0]
    assert float(rec.info_get("PROB_HET")) < 0.05
    assert float(rec.samples[0]["AF"].split(",")[0]) == 0.5


def test_reference_observation_decode(ref_resources):
    from varlociraptor_tpu.calling.ref_obs import open_observations

    r = open_observations(
        ref_resources / "testcases/test_uzuner_fp_mnv1/candidates.vcf", "sample"
    )
    (info, pileup), = list(r)
    assert info.kind == "mnv" and len(pileup.read_observations) == 102
    assert all(o.paired for o in pileup.read_observations)


def test_region_sharding_and_chaining(ref_resources, tmp_path):
    """preprocess --region + comma-chained obs shards at call time."""
    from varlociraptor_tpu.calling.preprocess import PreprocessOptions, preprocess
    from varlociraptor_tpu.calling.ref_obs import open_observations

    td = ref_resources / "testcases/test_giab_12"
    s1 = tmp_path / "s1.obs.jsonl"
    s2 = tmp_path / "s2.obs.jsonl"
    n1 = preprocess(
        td / "candidates.vcf", td / "index.bam", td / "ref.fa", s1,
        options=PreprocessOptions(region="1:1-500"),
    )
    n2 = preprocess(
        td / "candidates.vcf", td / "index.bam", td / "ref.fa", s2,
        options=PreprocessOptions(region="1:501-2000"),
    )
    assert (n1, n2) == (0, 1)
    items = list(open_observations(f"{s1},{s2}"))
    assert len(items) == 1 and items[0][0].pos == 1078


def test_unsorted_candidates_rejected(ref_resources, tmp_path):
    """variant_buffer.rs parity: coordinate-unsorted candidates error."""
    import pytest as _pytest

    from varlociraptor_tpu.calling.preprocess import preprocess

    vcf = tmp_path / "unsorted.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr10\t500\t.\tA\tG\t.\t.\t.\nchr10\t100\t.\tA\tG\t.\t.\t.\n"
    )
    with _pytest.raises(ValueError, match="is not sorted"):
        preprocess(
            vcf,
            ref_resources / "tumor-first30000.bam",
            ref_resources / "chr10.fa",
            tmp_path / "x.obs.jsonl",
        )


def test_fdr_unknown_event_rejected(ref_resources, tmp_path):
    """fdr.rs:66-91 InvalidFDRControlEvents parity."""
    import pytest as _pytest

    from varlociraptor_tpu.filtration.fdr import control_fdr

    with _pytest.raises(ValueError, match="none of the events"):
        control_fdr(
            ref_resources / "test_fdr_ev_2/calls.matched.bcf",
            tmp_path / "y.vcf",
            events=["NOSUCH"],
            alpha=0.05,
        )
