"""Contamination estimation between a sample and a contaminant.

Re-design of ``/root/reference/src/estimation/contamination.rs:118-473``: the
reference reuses the Caller with a custom processor collecting per-variant
VAF distributions, then computes a posterior over a contamination-fraction
grid. Here we run the generic caller on a two-sample scenario and evaluate,
for each confidently-present germline-like variant, a binomial likelihood of
the sample's observed alt fraction given true VAF scaled by (1 - c).
"""

from __future__ import annotations

import math

import numpy as np

from ..calling.call import CallOptions, GenericCaller
from ..calling.observations import ObservationReader
from ..grammar.scenario import Scenario
from ..utils.logprob import np_ln_sum_exp

_SCENARIO = {
    "samples": {
        "sample": {"universe": "[0.0,1.0]"},
        "contaminant": {"universe": "[0.0,0.5[ | 0.5 | 1.0"},
    },
    "events": {
        "present": "sample:]0.0,1.0]",
    },
}


def _ln_binom(k, n, p):
    if p <= 0.0:
        return 0.0 if k == 0 else -math.inf
    if p >= 1.0:
        return 0.0 if k == n else -math.inf
    return (
        math.lgamma(n + 1)
        - math.lgamma(k + 1)
        - math.lgamma(n - k + 1)
        + k * math.log(p)
        + (n - k) * math.log(1 - p)
    )


def estimate_contamination(
    sample_obs_path, contaminant_obs_path, resolution: int = 100
):
    """Returns {"max_posterior_contamination": c, "posterior": [{...}]}."""
    scenario = Scenario(_SCENARIO)
    caller = GenericCaller(scenario, CallOptions())

    from ..calling.ref_obs import open_observations

    sample_iter = iter(open_observations(sample_obs_path))
    cont_iter = iter(open_observations(contaminant_obs_path))

    variant_counts = []  # (k_alt_sample, n_sample, vaf_contaminant)
    for (v_s, p_s), (v_c, p_c) in zip(sample_iter, cont_iter):
        n = len(p_s.read_observations)
        if n < 5:
            continue
        k = sum(1 for o in p_s.read_observations if o.prob_alt > o.prob_ref)
        nc = len(p_c.read_observations)
        kc = sum(1 for o in p_c.read_observations if o.prob_alt > o.prob_ref)
        if nc < 5:
            continue
        # contaminant germline VAF guess (nearest of 0, 0.5, 1)
        vc = min([0.0, 0.5, 1.0], key=lambda v: abs(v - kc / nc))
        if vc == 0.0 and k == 0:
            continue  # uninformative
        variant_counts.append((k, n, vc))

    grid = np.linspace(0.0, 1.0, resolution + 1)
    log_post = np.zeros(len(grid))
    for ci, c in enumerate(grid):
        total = 0.0
        for k, n, vc in variant_counts:
            # sample alt fraction = (1-c)*v_sample + c*v_contaminant;
            # marginalize the sample's own germline VAF over {0, 0.5, 1}
            terms = []
            for vs in (0.0, 0.5, 1.0):
                p = (1 - c) * vs + c * vc
                terms.append(_ln_binom(k, n, p) + math.log(1 / 3))
            total += np_ln_sum_exp(np.array(terms))
        log_post[ci] = total

    log_post -= np_ln_sum_exp(log_post)
    best = float(grid[int(np.argmax(log_post))])
    return {
        "max_posterior_contamination": best,
        "n_variants": len(variant_counts),
        "posterior": [
            {"contamination": float(c), "log_posterior": float(lp)}
            for c, lp in zip(grid, log_post)
        ],
    }
