"""Synthetic workload generation + engine setup shared by bench.py and
__graft_entry__.py."""

from __future__ import annotations

import math

import numpy as np

from .evidence.observation import F, N_FEATURES
from .grammar.compiler import compile_scenario_events
from .grammar.scenario import tumor_normal_scenario
from .ops.biases import FULL_COMBOS_DEFAULT
from .ops.grid import AFGrid
from .ops.posterior import PosteriorEngine, SampleConfig


def synth_batch(n_loci=256, n_samples=2, depth=64, n_combos=9, seed=0):
    """Random but realistic observation tensors for a tumor/normal batch."""
    rng = np.random.default_rng(seed)
    feats = np.zeros((n_loci, n_samples, depth, N_FEATURES), dtype=np.float32)
    mask = rng.random((n_loci, n_samples, depth)) < 0.9
    af = rng.random(n_loci) * 0.6
    is_alt = rng.random((n_loci, n_samples, depth)) < af[:, None, None]
    strong = math.log(1 - 1e-4)
    weak = math.log(1e-4)
    feats[..., F["prob_alt"]] = np.where(is_alt, strong, weak)
    feats[..., F["prob_ref"]] = np.where(is_alt, weak, strong)
    feats[..., F["prob_mapping"]] = math.log(1 - 1e-5)
    feats[..., F["prob_mismapping"]] = math.log(1e-5)
    feats[..., F["prob_missed_allele"]] = math.log(0.5)
    feats[..., F["prob_sample_alt"]] = 0.0
    feats[..., F["prob_double_overlap"]] = -np.inf
    feats[..., F["prob_single_overlap"]] = 0.0
    feats[..., F["prob_hit_base"]] = math.log(1.0 / 100)
    feats[..., F["strand"]] = rng.integers(1, 3, (n_loci, n_samples, depth))
    feats[..., F["read_orientation"]] = rng.integers(1, 3, (n_loci, n_samples, depth))
    feats[..., F["homopolymer_indel_len"]] = 127

    bias_alt = np.full((n_loci, n_samples, n_combos, depth), math.log(0.5), np.float32)
    bias_ref = np.full_like(bias_alt, math.log(0.5))
    bias_any = np.full_like(bias_alt, math.log(0.5))
    combo_active = np.zeros((n_loci, n_combos), dtype=bool)
    combo_active[:, 0] = True
    combo_active[:, 1:3] = rng.random((n_loci, 2)) < 0.3
    return feats, mask, bias_alt, bias_ref, bias_any, combo_active


def tumor_normal_engine(resolution=0.01, purity=0.75):
    scenario = tumor_normal_scenario(purity)
    events, grid_points = compile_scenario_events(scenario, "chr1")
    grid = AFGrid.build(resolution, extra_points=grid_points)
    samples = []
    for name in scenario.sample_names:
        s = scenario.samples[name]
        if s.contamination is not None:
            samples.append(
                SampleConfig(
                    name,
                    contaminated_by=scenario.idx(s.contamination.by),
                    contamination_fraction=s.contamination.fraction,
                    resolution=s.resolution,
                )
            )
        else:
            samples.append(SampleConfig(name, resolution=s.resolution))
    engine = PosteriorEngine(
        events,
        grid,
        samples,
        resolution=resolution,
        all_uniform_prior=True,
        n_artifact_combos=len(FULL_COMBOS_DEFAULT) - 1,
    )
    return scenario, engine


def engine_inputs(engine, n_loci=256, depth=64, seed=0):
    from .ops.biases import compact_combos

    feats, mask, ba, br, by, active = synth_batch(
        n_loci=n_loci, depth=depth, n_combos=len(FULL_COMBOS_DEFAULT), seed=seed
    )
    # same combo-axis compaction the caller applies (call.py)
    ba, br, by, active, _ = compact_combos(ba, br, by, active)
    branch_gates = np.ones((n_loci, engine.n_branches), dtype=bool)
    ln_prior_absent = np.full(n_loci, math.log(0.5), dtype=np.float32)
    return feats, mask, ba, br, by, active, branch_gates, ln_prior_absent
