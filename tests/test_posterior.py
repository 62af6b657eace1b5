"""Posterior engine tests against hand-computed / reference-property values.

Mirrors the reference's likelihood unit tests
(/root/reference/src/variants/model/likelihood.rs:252-395): absent pileups,
AF=0.5 likelihood maximum, posterior sanity for present/absent events.
"""

import math

import numpy as np
import pytest

from varlociraptor_tpu.evidence.observation import (
    ObservationBatch,
    Pileup,
    ReadObservation,
    set_prob_mapping,
    set_prob_overlap,
)
from varlociraptor_tpu.ops.biases import BiasCombo, build_bias_tensor
from varlociraptor_tpu.ops.event_program import (
    BranchSpec,
    EventSpec,
    SpectrumSpec,
    absent_event,
)
from varlociraptor_tpu.ops.grid import AFGrid
from varlociraptor_tpu.ops.posterior import PosteriorEngine, SampleConfig

LOG_ZERO = -math.inf


def mk_obs(prob_alt, prob_ref, prob_mapping=0.0):
    o = ReadObservation()
    set_prob_mapping(o, prob_mapping if prob_mapping < 0 else -1e-9)
    o.prob_alt = prob_alt
    o.prob_ref = prob_ref
    o.prob_missed_allele = math.log(
        0.5 * (math.exp(prob_alt) + math.exp(prob_ref))
    ) if max(prob_alt, prob_ref) > LOG_ZERO else LOG_ZERO
    o.prob_sample_alt = 0.0
    set_prob_overlap(o, LOG_ZERO)
    return o


def ref_obs():
    # strong ref observation: prob_ref=1, prob_alt~0
    return mk_obs(math.log(1e-6), -1e-9)


def alt_obs():
    return mk_obs(-1e-9, math.log(1e-6))


def build_inputs(pileups_per_locus, events, samples=None, depth=16):
    batch = ObservationBatch.collate(pileups_per_locus, depth=depth)
    L, S, D, _ = batch.features.shape
    combos = [BiasCombo()]  # no-artifact only
    bias = [
        build_bias_tensor(ps, combos, depth) for ps in pileups_per_locus
    ]
    bias_alt = np.stack([b.alt for b in bias])
    bias_ref = np.stack([b.ref for b in bias])
    bias_any = np.stack([b.any for b in bias])
    combo_active = np.stack([b.active for b in bias])
    grid = AFGrid.build(0.01, extra_points=[0.5])
    engine = PosteriorEngine(
        events,
        grid,
        samples or [SampleConfig("s0")],
    )
    branch_gates = np.ones((L, engine.n_branches), dtype=bool)
    ln_prior_absent = np.full(L, math.log(0.5), dtype=np.float32)
    out = engine.run(
        batch.features,
        batch.mask,
        bias_alt,
        bias_ref,
        bias_any,
        combo_active,
        branch_gates,
        ln_prior_absent,
    )
    return engine, out


def two_events(n_samples=1):
    present = EventSpec(
        name="present",
        branches=(
            BranchSpec(
                spectra=tuple(
                    SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True)
                    for _ in range(n_samples)
                )
            ),
        ),
    )
    return [absent_event(n_samples), present]


def test_absent_pileup_prefers_absent():
    pileup = Pileup(read_observations=[ref_obs() for _ in range(10)])
    engine, out = build_inputs([[pileup]], two_events())
    post = out["posteriors"][0]
    assert post[0] > post[1]  # absent wins
    assert math.exp(post[0]) > 0.9


def test_alt_pileup_prefers_present():
    pileup = Pileup(read_observations=[alt_obs() for _ in range(10)])
    engine, out = build_inputs([[pileup]], two_events())
    post = out["posteriors"][0]
    assert post[1] > post[0]
    assert math.exp(post[1]) > 0.9


def test_half_alt_map_af_near_half():
    obs = [alt_obs() for _ in range(8)] + [ref_obs() for _ in range(8)]
    pileup = Pileup(read_observations=obs)
    engine, out = build_inputs([[pileup]], two_events())
    post = out["posteriors"][0]
    assert post[1] > post[0]
    map_af = float(out["af"][0, 0])  # device-side MAP (present event)
    assert 0.35 <= map_af <= 0.65


def test_posteriors_normalize():
    pileup = Pileup(read_observations=[alt_obs(), ref_obs(), ref_obs()])
    engine, out = build_inputs([[pileup]], two_events())
    total = np.logaddexp.reduce(out["posteriors"][0])
    assert total == pytest.approx(0.0, abs=1e-5)


def test_empty_pileup_no_nan():
    engine, out = build_inputs([[Pileup()]], two_events())
    assert not np.isnan(out["posteriors"]).any()


def test_tumor_normal_contamination_somatic():
    """Tumor contaminated by normal: somatic-tumor vs absent."""
    # tumor has alt reads, normal clean ref
    tumor = Pileup(read_observations=[alt_obs() for _ in range(6)] + [ref_obs() for _ in range(6)])
    normal = Pileup(read_observations=[ref_obs() for _ in range(12)])
    events = [
        absent_event(2),
        # somatic tumor: tumor ]0,1], normal {0}
        EventSpec(
            name="somatic_tumor",
            branches=(
                BranchSpec(
                    spectra=(
                        SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True),
                        SpectrumSpec.from_set([0.0]),
                    )
                ),
            ),
        ),
        # germline het: both 0.5
        EventSpec(
            name="germline_het",
            branches=(
                BranchSpec(
                    spectra=(
                        SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True),
                        SpectrumSpec.from_set([0.5]),
                    )
                ),
            ),
        ),
    ]
    samples = [
        SampleConfig("tumor", contaminated_by=1, contamination_fraction=0.25),
        SampleConfig("normal"),
    ]
    engine, out = build_inputs([[tumor, normal]], events, samples=samples)
    post = out["posteriors"][0]
    names = [e.name for e in engine.events]
    assert names[int(np.argmax(post))] == "somatic_tumor"


def test_germline_het_detected():
    tumor = Pileup(
        read_observations=[alt_obs() for _ in range(7)] + [ref_obs() for _ in range(7)]
    )
    normal = Pileup(
        read_observations=[alt_obs() for _ in range(7)] + [ref_obs() for _ in range(7)]
    )
    events = [
        absent_event(2),
        EventSpec(
            name="somatic_tumor",
            branches=(
                BranchSpec(
                    spectra=(
                        SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True),
                        SpectrumSpec.from_set([0.0]),
                    )
                ),
            ),
        ),
        EventSpec(
            name="germline_het",
            branches=(
                BranchSpec(
                    spectra=(
                        SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True),
                        SpectrumSpec.from_set([0.5]),
                    )
                ),
            ),
        ),
    ]
    samples = [
        SampleConfig("tumor", contaminated_by=1, contamination_fraction=0.0),
        SampleConfig("normal"),
    ]
    engine, out = build_inputs([[tumor, normal]], events, samples=samples)
    post = out["posteriors"][0]
    names = [e.name for e in engine.events]
    assert names[int(np.argmax(post))] == "germline_het"


def test_effective_mutation_rate_williams():
    """effective_mutation_rate.rs:78-84 — Williams et al. 2016 example."""
    import numpy as np

    from varlociraptor_tpu.estimation.effective_mutation_rate import estimate

    r = estimate(np.linspace(0.12, 0.25, 2539))
    assert abs(r["mu_per_beta"] - 596.16) < 0.01


def test_likelihood_absent_equals_prob_ref():
    """likelihood.rs:274-345: at af=0 with certain mapping, the per-read
    likelihood equals the (bias-weighted) prob_ref."""
    import numpy as np
    import jax.numpy as jnp

    from varlociraptor_tpu.evidence.observation import F, FEATURES
    from varlociraptor_tpu.ops.likelihood import sample_loglik_grid

    D = 10
    feats = np.zeros((1, 1, D, len(FEATURES)), dtype=np.float32)
    feats[..., F["prob_alt"]] = 0.0        # ln(1)
    feats[..., F["prob_ref"]] = -1e30      # ln(0)
    feats[..., F["prob_mapping"]] = 0.0    # certain mapping
    feats[..., F["prob_mismapping"]] = -1e30
    feats[..., F["prob_missed_allele"]] = 0.0
    feats[..., F["prob_sample_alt"]] = 0.0
    mask = np.ones((1, 1, D), dtype=bool)
    zeros = np.zeros((1, 1, 1, D), dtype=np.float32)
    grid = jnp.asarray(np.array([0.0, 1.0], dtype=np.float32))
    ll = sample_loglik_grid(
        jnp.asarray(feats), jnp.asarray(mask), zeros, zeros, zeros, grid
    )
    # af=0 -> every read must come from ref, whose prob is 0 -> -inf-ish
    assert float(ll[0, 0, 0, 0]) < -1e29
    # af=1 -> alt explains all reads perfectly
    assert abs(float(ll[0, 0, 0, 1])) < 1e-5


def test_chained_l2fc_matches_bruteforce():
    """l2fc(a,b) & l2fc(b,c) chained constraints (log2_fold_change.rs
    composes freely in the vaftree): tree elimination must equal the dense
    triple-grid integral."""
    from varlociraptor_tpu.ops.event_program import LfcConstraint
    from varlociraptor_tpu.ops.likelihood import sample_loglik_grid
    import jax.numpy as jnp

    n_s = 3
    chained = EventSpec(
        name="equal_all",
        branches=(
            BranchSpec(
                spectra=tuple(
                    SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True)
                    for _ in range(n_s)
                ),
                lfcs=(
                    LfcConstraint(0, 1, "==", 0.0),
                    LfcConstraint(1, 2, "<=", 1.0),
                ),
            ),
        ),
    )
    events = [absent_event(n_s), chained]
    piles = [
        [
            Pileup(read_observations=[alt_obs() for _ in range(6)] + [ref_obs() for _ in range(6)])
            for _ in range(n_s)
        ]
    ]
    samples = [SampleConfig(f"s{i}") for i in range(n_s)]
    engine, out = build_inputs(piles, events, samples=samples)

    # brute force: dense sum over the 3-sample grid with both masks
    g = engine.grid.values
    batch = ObservationBatch.collate(piles, depth=16)
    combos = [BiasCombo()]
    bias = build_bias_tensor(piles[0], combos, 16)
    ll = np.asarray(
        sample_loglik_grid(
            jnp.asarray(batch.features), jnp.asarray(batch.mask),
            jnp.asarray(bias.alt[None]), jnp.asarray(bias.ref[None]),
            jnp.asarray(bias.any[None]), jnp.asarray(g.astype(np.float32)),
        )
    )[0, :, 0]  # [S, G]
    bi = engine.event_branch_idx[1][0]
    w = np.zeros((n_s, len(g)))
    # indicator-free: reproduce engine trapezoid weights via its own helper
    import jax

    n_obs = jnp.asarray(batch.mask.sum(-1), dtype=jnp.float32)
    wfull = np.asarray(engine._branch_weights(n_obs))  # [L,NB,S,G]
    w = wfull[0, bi]  # [S,G]
    m01 = engine.branch_lfc_masks[bi][0][2]
    m12 = engine.branch_lfc_masks[bi][1][2]
    total = -np.inf
    vals = ll + w  # [S,G]
    for i0 in range(len(g)):
        for i1 in range(len(g)):
            if not m01[i0, i1]:
                continue
            row = vals[0, i0] + vals[1, i1] + vals[2] + np.where(m12[i1], 0.0, -np.inf)
            total = np.logaddexp(total, np_ln_sum_exp_safe(row))
    # engine branch value before absent-split: recompute via joint output is
    # entangled; instead compare posteriors ratio using a direct engine hook
    got_T = None
    # evaluate engine's internal T by re-running _run_impl pieces is
    # overkill; instead verify the POSTERIOR matches a brute-force
    # two-event model built from the same integrals
    # absent branch: {0} set spectra -> indicator weight 0 at the zero point
    absent_T = float(ll[:, engine.zero_idx].sum())
    import math as _math

    pa = _math.log(0.5)
    from varlociraptor_tpu.ops.likelihood import _ln1mexp as _l1m

    # both events all_uniform_prior=False default: absent-only split applies
    ln_not_absent = float(np.asarray(_l1m(jnp.asarray(pa))))
    z0_chained = False  # ]0,1] excludes zero -> no zero point
    bv_chained = float(np.logaddexp(ln_not_absent + total, -np.inf))
    bv_absent = float(np.logaddexp(-np.inf, pa + absent_T))
    joint = np.array([_math.log(0.5) + bv_absent, _math.log(0.5) + bv_chained])
    want_post = joint - np_ln_sum_exp_safe(joint)
    np.testing.assert_allclose(out["posteriors"][0], want_post, rtol=1e-4, atol=2e-3)


def np_ln_sum_exp_safe(x):
    x = np.asarray(x, dtype=np.float64)
    m = np.max(x)
    if not np.isfinite(m):
        return m
    return float(m + np.log(np.sum(np.exp(x - m))))


def test_per_sample_resolution_subgrid():
    """A sample with a coarse scenario `resolution:` integrates on the
    k*resolution lattice (generic.rs:357 adaptive-integration step) — the
    engine's active subgrid must contain exactly that lattice plus the
    sample's own set values / range endpoints, and posteriors must stay
    close to the dense-grid evaluation."""
    import jax.numpy as jnp

    from varlociraptor_tpu.bench_utils import (
        engine_inputs,
        tumor_normal_engine,
    )
    from varlociraptor_tpu.grammar.compiler import compile_scenario_events
    from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario
    from varlociraptor_tpu.ops.biases import FULL_COMBOS_DEFAULT

    scenario, engine = tumor_normal_engine()
    # sample order is sorted: normal=0 (res 0.1), tumor=1 (res 0.01)
    ni = scenario.sample_names.index("normal")
    ti = scenario.sample_names.index("tumor")
    assert len(engine.active_idx[ti]) == engine.grid.size
    normal_vals = set(np.round(engine.values_s[ni].astype(float), 6))
    for k in range(11):
        assert round(k * 0.1, 6) in normal_vals
    # coarse: strictly fewer points than the dense grid
    assert len(engine.active_idx[ni]) < engine.grid.size / 3

    # dense control: same scenario, resolution=None on every sample
    events, grid_points = compile_scenario_events(scenario, "chr1")
    grid = AFGrid.build(0.01, extra_points=grid_points)
    dense_samples = []
    for name in scenario.sample_names:
        s = scenario.samples[name]
        if s.contamination is not None:
            dense_samples.append(
                SampleConfig(
                    name,
                    contaminated_by=scenario.idx(s.contamination.by),
                    contamination_fraction=s.contamination.fraction,
                )
            )
        else:
            dense_samples.append(SampleConfig(name))
    dense = PosteriorEngine(
        events,
        grid,
        dense_samples,
        resolution=0.01,
        all_uniform_prior=True,
        n_artifact_combos=len(FULL_COMBOS_DEFAULT) - 1,
    )
    inputs = engine_inputs(engine, n_loci=64, depth=32, seed=3)
    out_c = engine.run(*inputs)
    out_d = dense.run(*inputs)
    # posteriors: the coarse normal axis changes the integration lattice
    # (closer to the reference's own 0.1-step adaptive integration); values
    # must stay within a small tolerance of the dense evaluation
    pc = out_c["posteriors"]
    pd = out_d["posteriors"]
    finite = np.isfinite(pc) & np.isfinite(pd)
    assert np.all(np.abs(pc[finite] - pd[finite]) < 3.0), (
        np.max(np.abs(pc[finite] - pd[finite]))
    )
    # MAP event choice essentially unchanged (ties may flip on random data)
    same = np.mean(out_c["best_nonartifact"] == out_d["best_nonartifact"])
    assert same > 0.95, same


def test_cyclic_contamination_component_matches_bruteforce():
    """Contamination cycles longer than 2 (rho-shaped component: cycle
    0->1->2->0 plus tree node 3->1) contract via the tree-width-2
    eliminator; verify against direct joint enumeration."""
    import jax.numpy as jnp

    samples = [
        SampleConfig("s0", contaminated_by=1, contamination_fraction=0.1),
        SampleConfig("s1", contaminated_by=2, contamination_fraction=0.2),
        SampleConfig("s2", contaminated_by=0, contamination_fraction=0.3),
        SampleConfig("s3", contaminated_by=1, contamination_fraction=0.15),
    ]
    grid = AFGrid.build(0.1, extra_points=[0.5])
    engine = PosteriorEngine(two_events(4), grid, samples, resolution=0.1)
    assert sorted(map(sorted, engine.components)) == [[0, 1, 2, 3]]
    assert set(engine._component_cycle([0, 1, 2, 3])) == {0, 1, 2}

    rng = np.random.default_rng(5)
    L, B, NB = 3, 2, engine.n_branches
    G = [len(engine.values_s[i]) for i in range(4)]
    par = [1, 2, 0, 1]
    # integration weights are NEG_INF outside each branch's spectrum
    # support (the engine's contraction relies on this invariant)
    w_list = []
    for i in range(4):
        wv = rng.normal(size=(L, NB, G[i])).astype(np.float32)
        cls, masks = engine.support_classes[i]
        for n in range(NB):
            wv[:, n, ~masks[cls[n]]] = -np.inf
        w_list.append(jnp.asarray(wv))
    F = {
        i: jnp.asarray(
            rng.normal(size=(L, B, G[i], G[par[i]])).astype(np.float32)
        )
        for i in range(4)
    }

    comp = [0, 1, 2, 3]
    got = np.asarray(engine._component_reduce(comp, {}, F, w_list))

    # brute force: lse over (g0,g1,g2,g3)
    w = [np.asarray(x) for x in w_list]
    f = {i: np.asarray(x) for i, x in F.items()}
    tot = np.zeros((L, B, NB, G[0], G[1], G[2], G[3]))
    tot += w[0][:, None, :, :, None, None, None]
    tot += w[1][:, None, :, None, :, None, None]
    tot += w[2][:, None, :, None, None, :, None]
    tot += w[3][:, None, :, None, None, None, :]
    tot += f[0][:, :, None, :, :, None, None]
    tot += f[1][:, :, None, None, :, :, None]
    tot += np.transpose(f[2], (0, 1, 3, 2))[:, :, None, :, None, :, None]
    tot += f[3][:, :, None, None, :, None, :].swapaxes(4, 6)  # F3[g3,g1]
    ref = tot.reshape(L, B, NB, -1)
    m = ref.max(-1)
    ms = np.where(np.isfinite(m), m, 0.0)
    ref = np.where(
        np.isfinite(m),
        ms + np.log(np.exp(ref - ms[..., None]).sum(-1)),
        -np.inf,
    )
    assert np.allclose(got, ref, atol=2e-4), np.max(np.abs(got - ref))

    # keep= every node: brute force retaining that axis
    axes = {0: (4, 5, 6), 1: (3, 5, 6), 2: (3, 4, 6), 3: (3, 4, 5)}
    for keep, ax in axes.items():
        gk = np.asarray(
            engine._component_reduce(comp, {}, F, w_list, keep=keep)
        )
        mt = tot.max(axis=ax, keepdims=True)
        mts = np.where(np.isfinite(mt), mt, 0.0)
        rk = np.where(
            np.isfinite(mt),
            mts + np.log(np.exp(tot - mts).sum(axis=ax, keepdims=True)),
            -np.inf,
        )
        rk = np.squeeze(rk, axis=ax)
        fin = np.isfinite(rk)
        assert np.array_equal(np.isfinite(gk), fin), keep
        assert np.allclose(gk[fin], rk[fin], atol=2e-4), (
            keep,
            np.max(np.abs(gk[fin] - rk[fin])),
        )


def test_cyclic_contamination_end_to_end():
    """Full run() with a 3-cycle of mutually contaminated samples."""
    p = [
        Pileup(read_observations=[alt_obs() for _ in range(8)]),
        Pileup(read_observations=[alt_obs() for _ in range(8)]),
        Pileup(read_observations=[alt_obs() for _ in range(8)]),
    ]
    samples = [
        SampleConfig("a", contaminated_by=1, contamination_fraction=0.1),
        SampleConfig("b", contaminated_by=2, contamination_fraction=0.1),
        SampleConfig("c", contaminated_by=0, contamination_fraction=0.1),
    ]
    engine, out = build_inputs([p], two_events(3), samples=samples)
    post = out["posteriors"][0]
    names = [e.name for e in engine.events]
    assert np.isfinite(out["marginal"]).all()
    assert names[int(np.argmax(post))] == "present"
    assert np.all(out["af"][0] > 0.9)  # all-alt pileups -> AF ~ 1


def test_lfc_group_joint_matches_tree_eliminate():
    """The generic l2fc joint enumerator must agree with the structured
    tree eliminator on configurations both support (3 singleton samples,
    2-constraint chain)."""
    import jax.numpy as jnp
    from varlociraptor_tpu.ops.event_program import LfcConstraint

    n_s = 3
    chained = EventSpec(
        name="equal_all",
        branches=(
            BranchSpec(
                spectra=tuple(
                    SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True)
                    for _ in range(n_s)
                ),
                lfcs=(
                    LfcConstraint(0, 1, "==", 0.0),
                    LfcConstraint(1, 2, "<=", 1.0),
                ),
            ),
        ),
    )
    grid = AFGrid.build(0.1, extra_points=[0.5])
    engine = PosteriorEngine(
        [absent_event(n_s), chained],
        grid,
        [SampleConfig(f"s{i}") for i in range(n_s)],
        resolution=0.1,
    )
    bi = engine.event_branch_idx[1][0]
    group = engine.branch_lfc_masks[bi]
    nodes = sorted({s for (a, b, _) in group for s in (a, b)})
    rng = np.random.default_rng(9)
    L, B, NB = 2, 2, engine.n_branches
    G = [len(engine.values_s[i]) for i in range(n_s)]
    loglik = {
        i: jnp.asarray(rng.normal(size=(L, B, G[i])).astype(np.float32))
        for i in range(n_s)
    }
    w_list = [
        jnp.asarray(rng.normal(size=(L, NB, G[i])).astype(np.float32))
        for i in range(n_s)
    ]
    comp_of = {i: (i,) for i in range(n_s)}
    t_tree, z_tree = engine._lfc_tree_eliminate(group, nodes, loglik, w_list, bi)
    t_gen, z_gen = engine._lfc_group_joint(
        group, nodes, loglik, {}, w_list, bi, comp_of
    )
    np.testing.assert_allclose(
        np.asarray(t_gen), np.asarray(t_tree), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(z_gen), np.asarray(z_tree), rtol=1e-5, atol=1e-4
    )


def test_cyclic_l2fc_end_to_end():
    """Cyclic l2fc constraint graph (a~b, b~c, c~a): generic enumeration;
    posterior must match a brute-force triple-grid integral."""
    from varlociraptor_tpu.ops.event_program import LfcConstraint
    from varlociraptor_tpu.ops.likelihood import sample_loglik_grid
    import jax.numpy as jnp
    import math as _math

    n_s = 3
    cyc = EventSpec(
        name="all_close",
        branches=(
            BranchSpec(
                spectra=tuple(
                    SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True)
                    for _ in range(n_s)
                ),
                lfcs=(
                    LfcConstraint(0, 1, "<=", 1.0),
                    LfcConstraint(1, 2, "<=", 1.0),
                    LfcConstraint(2, 0, "<=", 1.0),
                ),
            ),
        ),
    )
    events = [absent_event(n_s), cyc]
    piles = [
        [
            Pileup(
                read_observations=[alt_obs() for _ in range(6)]
                + [ref_obs() for _ in range(6)]
            )
            for _ in range(n_s)
        ]
    ]
    samples = [SampleConfig(f"s{i}") for i in range(n_s)]
    engine, out = build_inputs(piles, events, samples=samples)

    g = engine.grid.values
    batch = ObservationBatch.collate(piles, depth=16)
    combos = [BiasCombo()]
    bias = build_bias_tensor(piles[0], combos, 16)
    ll = np.asarray(
        sample_loglik_grid(
            jnp.asarray(batch.features), jnp.asarray(batch.mask),
            jnp.asarray(bias.alt[None]), jnp.asarray(bias.ref[None]),
            jnp.asarray(bias.any[None]), jnp.asarray(g.astype(np.float32)),
        )
    )[0, :, 0]  # [S, G]
    bi = engine.event_branch_idx[1][0]
    n_obs = jnp.asarray(batch.mask.sum(-1), dtype=jnp.float32)
    wfull = np.asarray(engine._branch_weights(n_obs))[0, bi]  # [S,G]
    masks = {(a, b): m for (a, b, m) in engine.branch_lfc_masks[bi]}
    m01, m12, m02 = masks[(0, 1)], masks[(1, 2)], masks[(0, 2)]
    vals = ll + wfull
    total = -np.inf
    for i0 in range(len(g)):
        for i1 in range(len(g)):
            if not m01[i0, i1]:
                continue
            keep2 = m12[i1] & m02[i0, :]
            row = np.where(keep2, vals[2], -np.inf) + vals[0, i0] + vals[1, i1]
            total = np.logaddexp(total, np_ln_sum_exp_safe(row))
    absent_T = float(ll[:, engine.zero_idx].sum())
    pa = _math.log(0.5)
    from varlociraptor_tpu.ops.likelihood import _ln1mexp as _l1m

    ln_not_absent = float(np.asarray(_l1m(jnp.asarray(pa))))
    bv_cyc = ln_not_absent + total
    bv_absent = pa + absent_T
    joint = np.array([_math.log(0.5) + bv_absent, _math.log(0.5) + bv_cyc])
    want_post = joint - np_ln_sum_exp_safe(joint)
    np.testing.assert_allclose(
        out["posteriors"][0], want_post, rtol=1e-4, atol=2e-3
    )


def test_chained_l2fc_over_contaminated_end_to_end():
    """Chained l2fc where samples are contaminated (s0, s1 both
    contaminated by s2; constraints l2fc(0,1) & l2fc(1,2)): generic joint
    enumeration over the union component."""
    from varlociraptor_tpu.ops.event_program import LfcConstraint

    n_s = 3
    ev = EventSpec(
        name="linked",
        branches=(
            BranchSpec(
                spectra=tuple(
                    SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True)
                    for _ in range(n_s)
                ),
                lfcs=(
                    LfcConstraint(0, 1, "==", 0.0),
                    LfcConstraint(1, 2, "<=", 1.0),
                ),
            ),
        ),
    )
    events = [absent_event(n_s), ev]
    piles = [
        [
            Pileup(
                read_observations=[alt_obs() for _ in range(8)]
                + [ref_obs() for _ in range(8)]
            )
            for _ in range(n_s)
        ]
    ]
    samples = [
        SampleConfig("s0", contaminated_by=2, contamination_fraction=0.1),
        SampleConfig("s1", contaminated_by=2, contamination_fraction=0.1),
        SampleConfig("s2"),
    ]
    engine, out = build_inputs(piles, events, samples=samples)
    post = out["posteriors"][0]
    names = [e.name for e in engine.events]
    assert np.isfinite(out["marginal"]).all()
    # all three pileups are half-alt -> equal VAFs -> "linked" must win
    assert names[int(np.argmax(post))] == "linked"


def test_full_prior_mutual_contamination():
    """--full-prior with a mutual-contamination 2-cycle: the joint-prior
    path must match the same engine run with a flat joint prior vs the
    absent-split run at prior 0.5 (both encode a uniform prior here)."""
    import jax.numpy as jnp
    import math as _math

    piles = [
        [
            Pileup(
                read_observations=[alt_obs() for _ in range(8)]
                + [ref_obs() for _ in range(8)]
            ),
            Pileup(read_observations=[ref_obs() for _ in range(16)]),
        ]
    ]
    samples = [
        SampleConfig("a", contaminated_by=1, contamination_fraction=0.1),
        SampleConfig("b", contaminated_by=0, contamination_fraction=0.05),
    ]
    events = two_events(2)
    batch = ObservationBatch.collate(piles, depth=16)
    combos = [BiasCombo()]
    bias = build_bias_tensor(piles[0], combos, 16)
    grid = AFGrid.build(0.01, extra_points=[0.5])
    engine = PosteriorEngine(events, grid, samples, all_uniform_prior=True)
    L = 1
    G = grid.size
    branch_gates = np.ones((L, engine.n_branches), dtype=bool)
    ln_prior_absent = np.full(L, _math.log(0.5), dtype=np.float32)
    flat = np.zeros((L, G, G), dtype=np.float32)  # uniform joint prior
    out_fp = engine.run(
        batch.features, batch.mask, bias.alt[None], bias.ref[None],
        bias.any[None], np.ones((L, 1), bool), branch_gates,
        ln_prior_absent, ln_prior_joint=flat,
    )
    assert np.isfinite(out_fp["marginal"]).all()
    names = [e.name for e in engine.events]
    assert names[int(np.argmax(out_fp["posteriors"][0]))] == "present"


def test_full_prior_applies_l2fc_masks():
    """--full-prior must fold per-branch l2fc masks into the joint
    evaluation (previously they were silently dropped)."""
    import jax.numpy as jnp
    import math as _math
    from varlociraptor_tpu.ops.event_program import LfcConstraint
    from varlociraptor_tpu.ops.likelihood import sample_loglik_grid

    ev = EventSpec(
        name="equal",
        branches=(
            BranchSpec(
                spectra=(
                    SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True),
                    SpectrumSpec.from_range(0.0, 1.0, left_exclusive=True),
                ),
                lfcs=(LfcConstraint(0, 1, "==", 0.0),),
            ),
        ),
    )
    events = [absent_event(2), ev]
    # sample 0 at VAF ~0.5, sample 1 at VAF ~1.0 -> "equal" must be penalized
    piles = [
        [
            Pileup(
                read_observations=[alt_obs() for _ in range(8)]
                + [ref_obs() for _ in range(8)]
            ),
            Pileup(read_observations=[alt_obs() for _ in range(16)]),
        ]
    ]
    batch = ObservationBatch.collate(piles, depth=16)
    combos = [BiasCombo()]
    bias = build_bias_tensor(piles[0], combos, 16)
    grid = AFGrid.build(0.01, extra_points=[0.5])
    engine = PosteriorEngine(
        events, grid, [SampleConfig("a"), SampleConfig("b")],
        all_uniform_prior=True,
    )
    L, G = 1, grid.size
    branch_gates = np.ones((L, engine.n_branches), dtype=bool)
    lpa = np.full(L, _math.log(0.5), dtype=np.float32)
    flat = np.zeros((L, G, G), dtype=np.float32)
    out = engine.run(
        batch.features, batch.mask, bias.alt[None], bias.ref[None],
        bias.any[None], np.ones((L, 1), bool), branch_gates, lpa,
        ln_prior_joint=flat,
    )

    # brute force on the dense grid with the mask
    g = grid.values
    ll = np.asarray(
        sample_loglik_grid(
            jnp.asarray(batch.features), jnp.asarray(batch.mask),
            jnp.asarray(bias.alt[None]), jnp.asarray(bias.ref[None]),
            jnp.asarray(bias.any[None]), jnp.asarray(g.astype(np.float32)),
        )
    )[0, :, 0]  # [S,G]
    n_obs = jnp.asarray(batch.mask.sum(-1), dtype=jnp.float32)
    bi = engine.event_branch_idx[1][0]
    w = np.asarray(engine._branch_weights(n_obs))[0]  # [NB,S,G]
    m = engine.branch_lfc_masks[bi][0][2]
    d0 = ll[0] + w[bi, 0]
    d1 = ll[1] + w[bi, 1]
    joint = d0[:, None] + d1[None, :] + np.where(m, 0.0, -np.inf)
    t_eq = np_ln_sum_exp_safe(joint.ravel())
    bi_a = engine.event_branch_idx[0][0]
    t_abs = np_ln_sum_exp_safe(
        (ll[0] + w[bi_a, 0])[:, None] + (ll[1] + w[bi_a, 1])[None, :]
    )
    jv = np.array([_math.log(0.5) + t_abs, _math.log(0.5) + t_eq])
    want = jv - np_ln_sum_exp_safe(jv)
    np.testing.assert_allclose(
        out["posteriors"][0], want, rtol=1e-4, atol=2e-3
    )


def test_afd_backbone_spans_full_subgrid():
    """Shipped AFDs must keep full-range support (top-K peak points plus
    the strided backbone): the contamination estimator's piecewise-linear
    pdf treats out-of-support VAFs as probability zero, so a peak-only
    AFD would hard-zero fraction candidates the reference scores finite."""
    pileup = Pileup(read_observations=[alt_obs() for _ in range(12)])
    engine, out = build_inputs([[pileup]], two_events())
    d = out["densities_dphred"][0, 0]  # [G]
    shipped = np.nonzero(d != 32767)[0]
    active = np.asarray(engine.active_idx[0])
    # the supported span (AFs above the observable bound carry finite
    # density) must be covered with backbone-bounded gaps — not just a
    # peak neighborhood.  With 12 alt reads the peak sits at AF ~1 while
    # the observable bound is ~1/12, so the span is wide.
    assert len(shipped) >= 12
    span = shipped[-1] - shipped[0]
    assert span > len(active) // 2, (shipped[0], shipped[-1])
    gaps = np.diff(np.searchsorted(active, shipped))
    assert gaps.max() <= int(np.ceil(len(active) / 15)) + 1


def test_full_prior_four_samples_matches_bruteforce():
    """Generic pedigree full-prior (S=4, no contamination): scan-based
    joint enumeration on coarse subgrids vs direct sum."""
    import jax.numpy as jnp
    import math as _math
    from varlociraptor_tpu.ops.likelihood import sample_loglik_grid

    n_s = 4
    piles = [
        [
            Pileup(
                read_observations=[alt_obs() for _ in range(4 + 2 * i)]
                + [ref_obs() for _ in range(8 - 2 * i)]
            )
            for i in range(n_s)
        ]
    ]
    batch = ObservationBatch.collate(piles, depth=16)
    combos = [BiasCombo()]
    bias = build_bias_tensor(piles[0], combos, 16)
    grid = AFGrid.build(0.1, extra_points=[0.5])
    engine = PosteriorEngine(
        two_events(n_s),
        grid,
        [SampleConfig(f"s{i}") for i in range(n_s)],
        resolution=0.1,
        all_uniform_prior=True,
    )
    L = 1
    G = [len(engine.values_s[i]) for i in range(n_s)]
    flat = np.zeros((L,) + tuple(G), dtype=np.float32)
    out = engine.run(
        batch.features, batch.mask, bias.alt[None], bias.ref[None],
        bias.any[None], np.ones((L, 1), bool),
        np.ones((L, engine.n_branches), bool),
        np.full(L, _math.log(0.5), dtype=np.float32),
        ln_prior_joint=flat,
    )

    # brute force over the 4-sample subgrid product
    n_obs = jnp.asarray(batch.mask.sum(-1), dtype=jnp.float32)
    wfull = np.asarray(engine._branch_weights(n_obs))[0]  # [NB,S,Gfull]
    act = [np.asarray(engine.active_idx[i]) for i in range(n_s)]
    ll_full = np.asarray(
        sample_loglik_grid(
            jnp.asarray(batch.features), jnp.asarray(batch.mask),
            jnp.asarray(bias.alt[None]), jnp.asarray(bias.ref[None]),
            jnp.asarray(bias.any[None]),
            jnp.asarray(grid.values.astype(np.float32)),
        )
    )[0, :, 0]  # [S,Gfull]
    jv = []
    for ei in range(2):
        bi = engine.event_branch_idx[ei][0]
        d = [
            (ll_full[s] + wfull[bi, s])[act[s]] for s in range(n_s)
        ]
        tot = (
            d[0][:, None, None, None]
            + d[1][None, :, None, None]
            + d[2][None, None, :, None]
            + d[3][None, None, None, :]
        )
        jv.append(_math.log(0.5) + np_ln_sum_exp_safe(tot.ravel()))
    jv = np.array(jv)
    want = jv - np_ln_sum_exp_safe(jv)
    np.testing.assert_allclose(
        out["posteriors"][0], want, rtol=1e-4, atol=2e-3
    )


def test_run_fetch_false_roundtrip():
    """run(fetch=False) + fetch_run must reproduce run() exactly — the
    single packed wire buffer (f32 | bitcast i16 | bitcast u8 afd_idx)
    round-trips every output including map_slot and the u8 AFD indices."""
    pileups = [
        [Pileup(read_observations=[alt_obs() for _ in range(6)])],
        [Pileup(read_observations=[ref_obs() for _ in range(4)])],
    ]
    engine, out = build_inputs(pileups, two_events())
    # rebuild the same inputs and go through the async handles path
    depth = 16
    batch = ObservationBatch.collate(pileups, depth=depth)
    combos = [BiasCombo()]
    bias = [build_bias_tensor(ps, combos, depth) for ps in pileups]
    L = len(pileups)
    handles = engine.run(
        batch.features,
        batch.mask,
        np.stack([b.alt for b in bias]),
        np.stack([b.ref for b in bias]),
        np.stack([b.any for b in bias]),
        np.stack([b.active for b in bias]),
        np.ones((L, engine.n_branches), dtype=bool),
        np.full(L, math.log(0.5), dtype=np.float32),
        fetch=False,
    )
    out2 = engine.fetch_run(handles)
    assert set(out2) == set(out)
    assert "map_slot" in out2 and out2["map_slot"].shape == (L,)
    for k in out:
        np.testing.assert_array_equal(out[k], out2[k], err_msg=k)
