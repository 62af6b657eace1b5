"""Randomized consistency check of the formula-normalization pipeline:
for random formulas over two samples, the compiled branch program
(expansion -> negation pushdown against the universe -> merge/flatten,
formula.rs:473-485) must agree with direct recursive evaluation of the
parsed AST at every probe point inside the universe."""

import random

import numpy as np
import yaml

from varlociraptor_tpu.grammar import formula as fm
from varlociraptor_tpu.grammar.compiler import compile_event
from varlociraptor_tpu.grammar.scenario import Scenario

SPECS = [
    "0.0",
    "0.5",
    "1.0",
    "{0.0,0.5}",
    "{0.5,1.0}",
    "[0.0,0.5]",
    "[0.2,0.8]",
    "]0.1,0.6]",
    "[0.4,1.0[",
    "]0.0,1.0]",
    "[0.0,1.0[",
    "]0.25,0.75[",
]


def _random_formula(rng, depth=0):
    if depth >= 3 or rng.random() < 0.35:
        return f"s{rng.randrange(2)}:{rng.choice(SPECS)}"
    op = rng.random()
    a = _random_formula(rng, depth + 1)
    b = _random_formula(rng, depth + 1)
    if op < 0.4:
        return f"({a} & {b})"
    if op < 0.8:
        return f"({a} | {b})"
    return f"!({a})"


def _complement_contains(sp, v):
    """Reference negation semantics for one atom against universe [0,1]
    (formula.rs:759-855 + split_at:1106-1135): pure set complement for
    sets; for ranges, an EXCLUSIVE bound strictly inside the universe
    drops its boundary point from the complement (split_at carves it off
    with an exclusive piece), while an exclusive bound coinciding with an
    inclusive universe endpoint survives as a degenerate singleton."""
    if sp.is_set:
        return not any(abs(v - x) < 1e-12 for x in sp.set_values)
    r = sp.range_value
    if r.contains(v):
        return False
    if v == r.start and r.left_exclusive and r.start > 0.0:
        return False
    if v == r.end and r.right_exclusive and r.end < 1.0:
        return False
    return True


def _eval_direct(node, vafs, neg=False):
    """Direct recursive evaluation of the parsed AST with De Morgan
    pushdown, modeling the reference's atom-complement semantics."""
    if isinstance(node, fm.Conjunction):
        sub = (_eval_direct(c, vafs, neg) for c in node.operands)
        return any(sub) if neg else all(sub)
    if isinstance(node, fm.Disjunction):
        sub = (_eval_direct(c, vafs, neg) for c in node.operands)
        return all(sub) if neg else any(sub)
    if isinstance(node, fm.Negation):
        return _eval_direct(node.operand, vafs, not neg)
    if isinstance(node, fm.TrueLit):
        return not neg
    if isinstance(node, fm.FalseLit):
        return neg
    assert isinstance(node, fm.Atom), type(node)
    v = vafs[node.sample]
    if neg:
        return _complement_contains(node.vafs, v)
    return node.vafs.contains(v)


def _member(ev, vafs):
    for br in ev.branches:
        ok = True
        for sp, v in zip(br.spectra, vafs.values()):
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


def test_random_formulas_compile_to_equivalent_branch_programs():
    rng = random.Random(20260818)
    sc = Scenario(
        yaml.safe_load(
            """
samples:
  s0: {universe: "[0.0,1.0]"}
  s1: {universe: "[0.0,1.0]"}
events:
  placeholder: "s0:1.0"
"""
        )
    )
    # boundary-heavy probe grid: spectrum endpoints +- epsilon included
    probes = sorted(
        set(np.round(np.linspace(0, 1, 11), 6))
        | {0.1, 0.2, 0.25, 0.4, 0.6, 0.75, 0.8}
        | {0.1 + 1e-7, 0.6 - 1e-7, 0.25 + 1e-7}
    )
    n_checked = 0
    for i in range(40):
        text = _random_formula(rng)
        ast = fm.parse_formula(text)
        ev = compile_event(f"ev{i}", ast, sc, "all")
        for v0 in probes:
            for v1 in probes:
                direct = _eval_direct(ast, {"s0": v0, "s1": v1})
                compiled = _member(ev, {"s0": v0, "s1": v1})
                assert direct == compiled, (text, v0, v1, direct, compiled)
                n_checked += 1
    assert n_checked == 40 * len(probes) ** 2


def test_random_interval_algebra_consistency():
    """Pointwise consistency of the interval algebra: intersect(a,b)
    contains v iff a and b both contain v; a successful union contains v
    iff a or b contains v; overlap 'none' iff no common point on the
    probe grid."""
    from varlociraptor_tpu.grammar.formula import (
        VAFRange,
        VAFSpectrum,
        _intersect_spectra,
        _try_union_spectra,
    )

    rng = random.Random(48074578)
    grid = [round(i / 20, 3) for i in range(21)]

    def rand_spectrum():
        if rng.random() < 0.3:
            k = rng.randrange(1, 4)
            return VAFSpectrum.from_set(rng.sample(grid, k))
        lo, hi = sorted(rng.sample(grid, 2))
        return VAFSpectrum.range(
            VAFRange(lo, hi, rng.random() < 0.5, rng.random() < 0.5)
        )

    for _ in range(300):
        a, b = rand_spectrum(), rand_spectrum()
        inter = _intersect_spectra(a, b)
        union = _try_union_spectra(a, b)
        for v in grid:
            ina, inb = a.contains(v), b.contains(v)
            assert inter.contains(v) == (ina and inb), (a, b, v)
            if union is not None:
                assert union.contains(v) == (ina or inb), (a, b, v, union)
        if a.is_set is False and b.is_set is False:
            ov = a.range_value.overlap(b.range_value)
            any_common = any(a.contains(v) and b.contains(v) for v in grid)
            if ov == "none":
                assert not any_common, (a, b)


def test_random_formulas_discrete_universe():
    """Same compiled-vs-direct equivalence over a DISCRETE universe
    (0.0 | 0.5 | 1.0): negation runs the set-vs-set difference path
    (formula.rs:773-780), which is a pure complement — no boundary
    quirks."""
    rng = random.Random(1234)
    sc = Scenario(
        yaml.safe_load(
            """
samples:
  s0: {universe: "0.0 | 0.5 | 1.0"}
  s1: {universe: "0.0 | 0.5 | 1.0"}
events:
  placeholder: "s0:1.0"
"""
        )
    )
    specs = ["0.0", "0.5", "1.0", "{0.0,0.5}", "{0.5,1.0}", "{0.0,1.0}"]

    def rand_formula(depth=0):
        if depth >= 3 or rng.random() < 0.35:
            return f"s{rng.randrange(2)}:{rng.choice(specs)}"
        op = rng.random()
        a, b = rand_formula(depth + 1), rand_formula(depth + 1)
        if op < 0.4:
            return f"({a} & {b})"
        if op < 0.8:
            return f"({a} | {b})"
        return f"!({a})"

    probes = [0.0, 0.5, 1.0]
    for i in range(40):
        text = rand_formula()
        ast = fm.parse_formula(text)
        ev = compile_event(f"dev{i}", ast, sc, "all")
        for v0 in probes:
            for v1 in probes:
                direct = _eval_direct(ast, {"s0": v0, "s1": v1})
                compiled = _member(ev, {"s0": v0, "s1": v1})
                assert direct == compiled, (text, v0, v1, direct, compiled)


def test_random_formulas_with_variant_and_lfc_compile():
    """Compile-smoke: random formulas mixing VAF atoms with IUPAC variant
    selectors and l2fc predicates (incl. under negation — variant flips
    `positive`, l2fc flips the comparison op, formula.rs:713-758) must
    compile without errors and honor plain-VAF membership."""
    rng = random.Random(777)
    sc = Scenario(
        yaml.safe_load(
            """
samples:
  s0: {universe: "[0.0,1.0]"}
  s1: {universe: "[0.0,1.0]"}
events:
  placeholder: "s0:1.0"
"""
        )
    )
    leaves = [
        's0:{0.0,0.5}', "s1:[0.2,0.8]", "s0:]0.0,1.0]", "s1:0.5",
        "C>T", "A>G",
        "l2fc(s0,s1) >= 1.0", "l2fc(s1,s0) < 0.5",
    ]

    def rand_formula(depth=0):
        if depth >= 3 or rng.random() < 0.4:
            return rng.choice(leaves)
        op = rng.random()
        a, b = rand_formula(depth + 1), rand_formula(depth + 1)
        if op < 0.4:
            return f"({a} & {b})"
        if op < 0.8:
            return f"({a} | {b})"
        return f"!({a})"

    n_nontrivial = 0
    for i in range(60):
        text = rand_formula()
        ast = fm.parse_formula(text)
        ev = compile_event(f"vl{i}", ast, sc, "all")
        # every branch must carry one spectrum per sample (missing samples
        # auto-filled with the whole universe, vaftree.rs:250-296)
        for br in ev.branches:
            assert len(br.spectra) == 2
        if ev.branches:
            n_nontrivial += 1
    assert n_nontrivial > 30
