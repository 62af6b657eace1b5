"""Effective mutation rate estimation (Williams et al. neutral model).

Port of ``/root/reference/src/estimation/effective_mutation_rate.rs:32-84``:
linear regression of the cumulative number of mutations M(f) against
1/f - 1/fmax; the slope is mu/beta (effective mutation rate per effective
cell division).
"""

from __future__ import annotations

import numpy as np


def estimate(afs, min_af: float = 0.12, max_af: float = 0.25):
    """afs: iterable of allele frequencies of somatic mutations.

    Returns dict with slope (mu/beta), intercept, and the fitted curve.
    """
    afs = np.sort(np.asarray([a for a in afs if min_af <= a <= max_af]))
    if len(afs) < 2:
        return {"mu_per_beta": float("nan"), "intercept": float("nan"), "n": len(afs)}
    fmax = afs[-1]
    # cumulative count of mutations with AF >= f, as function of 1/f - 1/fmax
    xs = 1.0 / afs - 1.0 / fmax
    ms = np.arange(len(afs), 0, -1, dtype=np.float64)  # M(f) counts
    slope, intercept = np.polyfit(xs, ms, 1)
    return {
        "mu_per_beta": float(slope),
        "intercept": float(intercept),
        "n": int(len(afs)),
    }
