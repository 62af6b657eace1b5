import glob

import pytest
import yaml

from varlociraptor_tpu.grammar import (
    Scenario,
    compile_scenario_events,
    parse_formula,
    parse_universe,
)
from varlociraptor_tpu.grammar import formula as fm
from varlociraptor_tpu.grammar.compiler import compile_event
from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario


def test_parse_atoms():
    f = parse_formula("tumor:]0.0,1.0] & normal:0.0")
    assert isinstance(f, fm.Conjunction)
    a, b = f.operands
    assert a.sample == "tumor"
    assert not a.vafs.is_set
    assert a.vafs.range_value.left_exclusive
    assert b.vafs.set_values == (0.0,)


def test_parse_universe():
    specs = parse_universe("[0.0,0.5[ | 0.5 | 1.0")
    assert len(specs) == 3
    assert specs[0].range_value.right_exclusive
    assert specs[1].set_values == (0.5,)


def test_parse_variant_and_lfc():
    f = parse_formula("C>T & tumor:]0.0,1.0]")
    assert isinstance(f.operands[0], fm.Variant)
    f2 = parse_formula("l2fc(a,b) >= 1.5")
    assert isinstance(f2, fm.Lfc)
    assert f2.value == 1.5
    f3 = parse_formula("!(a:0.0)")
    assert isinstance(f3, fm.Negation)


def test_negation_against_universe():
    sc = tumor_normal_scenario(1.0)
    ufn = sc.universe_fn("chr1")
    # !normal:0.0 against universe [0.0,0.5[ | 0.5 | 1.0
    f = fm.normalize(
        fm.Negation(parse_formula("normal:0.0")), sc.expressions, ufn
    )
    # complement: ]0.0,0.5[ | {0.5} | {1.0} (possibly merged)
    assert not isinstance(f, fm.FalseLit)
    txt = fm.formula_str(f)
    assert "0.0" in txt

    # absent formula exists
    assert "absent" in sc.expressions


def test_compile_tumor_normal_events():
    sc = tumor_normal_scenario(0.75)
    events, pts = compile_scenario_events(sc, "chr1")
    names = [e.name for e in events]
    assert names[0] == "absent"
    assert "somatic_tumor" in names
    assert "artifact_somatic_tumor" in names
    # sample order is sorted: normal=0, tumor=1
    assert sc.sample_names == ["normal", "tumor"]
    ev = {e.name: e for e in events}
    st = ev["somatic_tumor"]
    assert len(st.branches) == 1
    br = st.branches[0]
    # normal (idx 0) must be {0.0}; tumor (idx 1) range ]0,1]
    assert br.spectra[0].is_set and br.spectra[0].values == (0.0,)
    assert not br.spectra[1].is_set
    assert br.spectra[1].left_exclusive
    # absent event all-zero
    assert ev["absent"].all_absent()
    assert 0.5 in pts and 1.0 in pts


def test_compile_fills_missing_samples():
    sc = tumor_normal_scenario(1.0)
    # somatic_normal mentions only normal in some scenarios; craft one
    ev = compile_event(
        "x", parse_formula("normal:0.5"), sc, "chr1"
    )
    # tumor gets its universe [0.0,1.0] added
    assert len(ev.branches) == 1
    br = ev.branches[0]
    assert br.spectra[0].values == (0.5,)
    assert not br.spectra[1].is_set


def test_disjunction_branches():
    sc = tumor_normal_scenario(1.0)
    ev = compile_event(
        "x", parse_formula("normal:0.5 | normal:1.0"), sc, "chr1"
    )
    # after merge_atoms this may merge to a set {0.5,1.0} -> single branch
    total_points = set()
    for br in ev.branches:
        sp = br.spectra[0]
        assert sp.is_set
        total_points.update(sp.values)
    assert total_points == {0.5, 1.0}


def test_all_reference_scenarios_parse(ref_resources):
    """Every scenario.yaml in the reference testcases must parse + compile."""
    paths = sorted(
        glob.glob(str(ref_resources / "testcases" / "*" / "scenario.yaml"))
    )
    assert len(paths) > 100
    n_compiled = 0
    failures = []
    for p in paths:
        try:
            sc = Scenario.from_path(p)
            # use a contig from the testcase yaml if needed; "chr1" fallback
            events, _ = compile_scenario_events(sc, "chr1", with_artifact_twins=False)
            assert len(events) >= 2
            n_compiled += 1
        except Exception as e:  # noqa: BLE001
            failures.append((p.split("/")[-2], str(e)[:120]))
    # allow a small number of exotic failures for now but surface them
    assert n_compiled >= len(paths) * 0.9, f"failures: {failures[:10]}"


def test_merge_atoms_semantic_equivalence():
    """formula.rs:1622-1672 (test_merge_atoms): the negated-expression event
    must cover exactly the same VAF region as its hand-expanded form. The
    reference asserts syntactic equality after BDD simplification; we assert
    semantic equality of the compiled branch programs on a probe grid."""
    import numpy as np
    import yaml

    from varlociraptor_tpu.grammar.compiler import compile_event
    from varlociraptor_tpu.grammar.scenario import Scenario

    doc = yaml.safe_load(
        """
species:
  heterozygosity: 0.001
  germline-mutation-rate: 1e-3
  ploidy:
    male: {all: 2, X: 1, Y: 1}
    female: {all: 2, X: 2, Y: 0}
  genome-size: 3.5e9
samples:
  tumor:
    sex: female
    somatic-effective-mutation-rate: 1e-6
    inheritance: {clonal: {from: normal, somatic: false}}
    contamination: {by: normal, fraction: 0.11}
  normal: {sex: female, somatic-effective-mutation-rate: 1e-10}
expressions:
  loh: "normal:0.5 & tumor:1.0"
  loh_or_amplification: "normal:0.5 & tumor:[0.9,1.0["
events:
  germline: "(normal:0.5 | normal:1.0) & !($loh | $loh_or_amplification)"
  expected: "(normal:0.5 & tumor:{0.0, 0.5}) | (normal:0.5 & tumor:]0.0,0.5[) | (normal:0.5 & tumor:]0.5,0.9[) | normal:1.0"
"""
    )
    sc = Scenario(doc)

    def member(ev, nv, tv):
        for br in ev.branches:
            ok = True
            for sp, v in zip(br.spectra, (nv, tv)):
                if sp.kind == 0:
                    if not any(abs(v - x) < 1e-9 for x in sp.values):
                        ok = False
                        break
                else:
                    lo = v > sp.start if sp.left_exclusive else v >= sp.start
                    hi = v < sp.end if sp.right_exclusive else v <= sp.end
                    if not (lo and hi):
                        ok = False
                        break
            if ok:
                return True
        return False

    g = compile_event("germline", sc.event_formulas["germline"], sc, "all")
    e = compile_event("expected", sc.event_formulas["expected"], sc, "all")
    probes = sorted(
        set(np.linspace(0, 1, 21)) | {0.05, 0.45, 0.55, 0.89, 0.9, 0.91, 0.99, 1.0}
    )
    for nv in probes:
        for tv in probes:
            assert member(g, nv, tv) == member(e, nv, tv), (nv, tv)


def test_vafrange_overlap_exclusivity_tiebreaks():
    """formula.rs:1137-1170: at equal boundary values an exclusive bound
    lies strictly inside an inclusive one (regression: the tie-breaks were
    inverted, crashing negation over exclusive-bound universes)."""
    from varlociraptor_tpu.grammar.formula import VAFRange

    incl = VAFRange(0.0, 0.5, False, False)
    excl = VAFRange(0.0, 0.5, True, True)
    assert excl.overlap(incl) == "contained"
    assert incl.overlap(excl) == "contains"
    # half-open vs closed
    ho = VAFRange(0.0, 0.5, True, False)
    assert ho.overlap(incl) == "start"
    assert incl.overlap(ho) == "contains"


def test_vafrange_intersect_keeps_exclusive_bound():
    """formula.rs:1234-1262: equal boundaries intersect to the OR of the
    exclusivities."""
    from varlociraptor_tpu.grammar.formula import VAFRange

    i = VAFRange(0.0, 0.5, True, False).intersect(VAFRange(0.0, 0.5, False, False))
    assert i.left_exclusive and not i.right_exclusive
    j = VAFRange(0.0, 0.5, False, True).intersect(VAFRange(0.0, 0.5, True, False))
    assert j.left_exclusive and j.right_exclusive


def test_negation_over_exclusive_universe():
    """Negating an inclusive range against the common
    '{0.0,0.5,1.0} | ]0.0,0.5[ | ]0.5,1.0[' universe must not crash and
    must produce the complement."""
    from varlociraptor_tpu.grammar.formula import (
        VAFRange,
        VAFSpectrum,
        negate_spectrum_against_universe,
    )

    universe = [
        VAFSpectrum.from_set([0.0, 0.5, 1.0]),
        VAFSpectrum.range(VAFRange(0.0, 0.5, True, True)),
        VAFSpectrum.range(VAFRange(0.5, 1.0, True, True)),
    ]
    got = negate_spectrum_against_universe(
        VAFSpectrum.range(VAFRange(0.0, 0.5, False, False)), universe
    )
    # complement = {1.0} and ]0.5,1.0[
    pts = set()
    for s in got:
        if s.set_values is not None:
            pts |= set(s.set_values)
    assert 1.0 in pts and 0.5 not in pts and 0.0 not in pts
