#!/usr/bin/env python
"""Reference-faithful f64 posterior checker (diagnostic tool).

Ports the reference's EXACT posterior computation — recursive VAF-tree walk
with adaptive/Simpson integration (generic.rs:191-460,
utils/adaptive_integration.rs), the single/contaminated likelihood models
(likelihood.rs:60-250) and the bias-combination prior split
(generic.rs:437-441) — in plain numpy f64, for the built-in tumor-normal
scenario.  Run it on a testcase to get the posterior the Rust reference
would produce from OUR preprocessed pileups; differences to our grid engine
isolate integration-scheme divergence from evidence divergence.

Usage: python scripts/refmodel.py <testcase-name> [workdir]
"""

import math
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LN0 = -np.inf
EPS = np.log1p(1e-13)  # NUMERICAL_EPSILON of probs crate (adds tiny slack)


def lse(vals):
    vals = np.asarray(vals, dtype=np.float64)
    m = np.max(vals) if len(vals) else LN0
    if not np.isfinite(m):
        return m
    return m + np.log(np.sum(np.exp(vals - m)))


def ln1mexp(x):
    if x >= 0.0:
        return LN0
    if x > -math.log(2.0):
        return math.log(-math.expm1(x))
    return math.log1p(-math.exp(x))


# ---------------------------------------------------------------------------
# likelihood models (likelihood.rs)
# ---------------------------------------------------------------------------


def prob_sample_alt_scaled(ln_af, psa):
    """likelihood.rs:43-53."""
    if ln_af == 0.0:
        return 0.0
    scaled = ln_af + psa
    if 0.0 < scaled <= 1e-12:
        return 0.0
    return scaled


def likelihood_mapping(ln_af, obs, bias_alt, bias_ref):
    psa = prob_sample_alt_scaled(ln_af, obs["prob_sample_alt"])
    psr = ln1mexp(psa)
    return np.logaddexp(
        psa + bias_alt + obs["prob_alt"],
        psr + obs["prob_ref"] + bias_ref,
    )


def single_likelihood(ln_af, pileup, bias_alt, bias_ref, bias_any):
    total = 0.0
    for i, obs in enumerate(pileup):
        lm = likelihood_mapping(ln_af, obs, bias_alt[i], bias_ref[i])
        total += np.logaddexp(
            obs["prob_mapping"] + lm,
            obs["prob_mismapping"] + obs["prob_missed_allele"] + bias_any[i],
        )
    return total


def contaminated_likelihood(
    ln_af_p, ln_af_s, purity_ln, impurity_ln, pileup, bias_alt, bias_ref, bias_any
):
    total = 0.0
    for i, obs in enumerate(pileup):
        lp = purity_ln + likelihood_mapping(ln_af_p, obs, bias_alt[i], bias_ref[i])
        ls = impurity_ln + likelihood_mapping(ln_af_s, obs, bias_alt[i], bias_ref[i])
        total += np.logaddexp(
            obs["prob_mapping"] + np.logaddexp(lp, ls),
            obs["prob_mismapping"] + obs["prob_missed_allele"] + bias_any[i],
        )
    return total


# ---------------------------------------------------------------------------
# integration (bio ln_simpsons_integrate_exp / ln_trapezoidal_integrate_grid,
# utils/adaptive_integration.rs)
# ---------------------------------------------------------------------------


def ln_simpson(density, a, b, n):
    h = (b - a) / (n - 1)
    vals = []
    for i in range(n):
        w = 1.0 if i in (0, n - 1) else (4.0 if i % 2 == 1 else 2.0)
        vals.append(math.log(w) + density(a + h * i))
    return math.log(h / 3.0) + lse(vals) if h > 0 else density(a)


def ln_trapezoid_grid(points, values):
    segs = []
    for i in range(len(points) - 1):
        w = points[i + 1] - points[i]
        if w <= 0:
            continue
        segs.append(math.log(0.5) + math.log(w) + np.logaddexp(values[i], values[i + 1]))
    return lse(segs) if segs else LN0


def ln_integrate_adaptive(density, min_point, max_point, max_resolution):
    """utils/adaptive_integration.rs:25-141 — binary search for the max,
    then trapezoid over every visited grid point."""
    probs = {}

    def grid_point(p):
        if p not in probs:
            probs[p] = density(p)
        return p

    left = grid_point(min_point)
    right = grid_point(max_point)
    first_middle = None
    middle = None
    while ((right - left) >= max_resolution and left < right) or middle is None:
        middle = grid_point((left + right) / 2.0)
        middle1 = grid_point((left + middle) / 2.0)
        middle2 = grid_point((middle + right) / 2.0)
        if first_middle is None:
            first_middle = middle
        xs = [left, middle1, middle2, right]
        max_idx = 0
        for i, x in enumerate(xs):
            if probs[x] > probs[xs[max_idx]]:
                max_idx = i
        left = xs[max_idx - 1] if max_idx > 0 else xs[max_idx]
        right = xs[max_idx + 1] if max_idx < 3 else xs[max_idx]
    if middle < first_middle:
        grid_point((first_middle + max_point) / 2.0)
    else:
        grid_point((min_point + first_middle) / 2.0)
    lo = max(middle - max_resolution * 3.0, min_point)
    hi = min(middle + max_resolution * 3.0, max_point)
    for p in np.linspace(lo, middle, 4)[:3]:
        grid_point(float(p))
    for p in np.linspace(middle, hi, 4)[1:]:
        grid_point(float(p))
    pts = sorted(probs.keys())
    return ln_trapezoid_grid(pts, [probs[p] for p in pts])


# ---------------------------------------------------------------------------
# observable bounds (formula.rs:1172-1232)
# ---------------------------------------------------------------------------


def observable_bounds(start, end, left_excl, right_excl, n_obs):
    n = max(n_obs, 1)
    possible = (end - start) * n_obs > 1.0
    if n_obs < 10 or not possible:
        return start, end
    c_max = n_obs * end
    if right_excl and abs(c_max - round(c_max)) < 1e-9:
        c_max -= 1.0
    c_max = math.floor(c_max + 1e-9)
    amax = end if c_max == 0 else c_max / n
    c_min = n_obs * start
    amin = math.ceil(c_min - 1e-9) / n
    if left_excl and abs(c_min - round(c_min)) < 1e-9:
        cand1 = (c_min + 1.0) / n
        amin = cand1 if (cand1 <= 1.0 and cand1 <= amax) else c_min / n
    if amin >= amax:
        amin = start
    return amin, amax


# ---------------------------------------------------------------------------
# the generic posterior for the builtin tumor-normal scenario
# ---------------------------------------------------------------------------

PROB_05 = math.log(0.5)


class TumorNormalModel:
    """Samples: [tumor(contaminated by normal, resolution .01),
    normal(resolution .1)].  Events as in cli.rs:1151-1167."""

    def __init__(self, purity, pileups, bias_factors, combo_names):
        self.purity_ln = math.log(purity)
        self.impurity_ln = ln1mexp(self.purity_ln)
        self.pileups = pileups  # [sample] -> list of obs dicts
        # bias_factors: (alt, ref, any) arrays [sample][combo][read]
        self.alt_f, self.ref_f, self.any_f = bias_factors
        self.combo_names = combo_names
        self.resolutions = [0.01, 0.1]
        self.n_obs = [len(p) for p in pileups]
        self.clear_ref = [
            n > 10
            and all(
                (o["prob_ref"] - o["prob_alt"]) > math.log(3.2) for o in p
            )
            for n, p in zip(self.n_obs, pileups)
        ]
        self._cache = {}

    def joint(self, vaf_t, vaf_n, combo):
        key = (round(vaf_t, 15), round(vaf_n, 15), combo)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        lt = contaminated_likelihood(
            math.log(vaf_t) if vaf_t > 0 else LN0,
            math.log(vaf_n) if vaf_n > 0 else LN0,
            self.purity_ln,
            self.impurity_ln,
            self.pileups[0],
            self.alt_f[0][combo],
            self.ref_f[0][combo],
            self.any_f[0][combo],
        )
        ln = single_likelihood(
            math.log(vaf_n) if vaf_n > 0 else LN0,
            self.pileups[1],
            self.alt_f[1][combo],
            self.ref_f[1][combo],
            self.any_f[1][combo],
        )
        val = lt + ln
        self._cache[key] = val
        return val

    def integrate_sample(self, sample, spectrum, density):
        """spectrum: ("point", v) | ("range", start, end, lexcl, rexcl)."""
        if spectrum[0] == "point":
            v = spectrum[1]
            if self.clear_ref[sample] and v > 0.0:
                return LN0
            return density(v)
        _, start, end, lexcl, rexcl = spectrum
        if self.clear_ref[sample] and start > 0.0:
            return LN0
        res = self.resolutions[sample]
        n_obs = self.n_obs[sample]
        mn, mx = observable_bounds(start, end, lexcl, rexcl, n_obs)
        assert mn <= mx
        if (mx - mn) < res:
            return ln_simpson(density, mn, mx, 3)
        if n_obs < 5:
            return ln_simpson(density, mn, mx, 11)
        return ln_integrate_adaptive(density, mn, mx, res)

    def event_density(self, tumor_spec, normal_spec, combo):
        # vaftree order: tumor node, then normal node (formula order)
        def tumor_density(vaf_t):
            return self.integrate_sample(
                1, normal_spec, lambda vaf_n: self.joint(vaf_t, vaf_n, combo)
            )

        return self.integrate_sample(0, tumor_spec, tumor_density)

    def posterior(self, artifact_combos):
        """artifact_combos: list of combo indices (1..) considered; combo 0
        is no-artifact.  Returns dict event -> ln prob (unnormalized), with
        'artifact' = sum over biased twins."""
        T = ("range", 0.0, 1.0, True, False)  # ]0, 1]
        events = {
            "absent": (("point", 0.0), ("point", 0.0)),
            "somatic_tumor": (T, ("point", 0.0)),
            "somatic_normal": (T, ("range", 0.0, 0.5, True, True)),
            "germline_het": (T, ("point", 0.5)),
            "germline_hom": (T, ("point", 1.0)),
        }
        vals = {}
        for name, (ts, ns) in events.items():
            vals[name] = PROB_05 + self.event_density(ts, ns, 0)
        # artifact twins: every scenario event (not absent) with each combo
        n_combos = len(artifact_combos)
        art = []
        if n_combos:
            bias_prior = PROB_05 + math.log(1.0 / n_combos)
            for name, (ts, ns) in events.items():
                if name == "absent":
                    continue
                for c in artifact_combos:
                    art.append(bias_prior + self.event_density(ts, ns, c))
        vals["artifact"] = lse(art) if art else LN0
        return vals


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from varlociraptor_tpu.utils.jaxcache import enable

    enable()
    from varlociraptor_tpu.testcase import Testcase
    from varlociraptor_tpu.calling.call import (
        FULL_COMBOS,
        GenericCaller,
        _combo_allowed,
        CallOptions,
    )
    from varlociraptor_tpu.calling.ref_obs import open_observations
    from varlociraptor_tpu.ops.biases import build_bias_tensor
    from varlociraptor_tpu.grammar.scenario import tumor_normal_scenario

    name = sys.argv[1]
    tc = Testcase(f"/root/reference/tests/resources/testcases/{name}")
    wd = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        tempfile.mkdtemp(prefix=f"refmodel-{name}-")
    )
    obs = {}
    for s in tc.sample_names:
        p = wd / f"{s}.obs.jsonl"
        obs[s] = p
    if not all(p.exists() for p in obs.values()):
        tc.run(workdir=wd)
    print("workdir:", wd)

    purity = tc.purity()
    scenario = tumor_normal_scenario(purity)
    caller = GenericCaller(scenario, CallOptions())
    iters = [iter(open_observations(str(obs[s]), s)) for s in ["tumor", "normal"]]
    idx = 0
    while True:
        try:
            recs = [next(it) for it in iters]
        except StopIteration:
            break
        v0 = recs[0][0]
        pileups = [r[1] for r in recs]
        item = caller.make_work_item(idx, v0, pileups)
        depth = max(
            (len(p.read_observations) for p in item.pileups), default=1
        )
        allowed = np.array([_combo_allowed(c, item.flags) for c in FULL_COMBOS])
        bt = build_bias_tensor(item.pileups, FULL_COMBOS, max(depth, 1), allowed=allowed)
        active = bt.active & allowed
        artifact_combos = [i for i in range(1, len(FULL_COMBOS)) if active[i]]
        n_considered = int(allowed[1:].sum())

        def obs_dicts(pileup):
            out = []
            for o in pileup.read_observations:
                out.append(
                    {
                        "prob_mapping": o.prob_mapping,
                        "prob_mismapping": o.prob_mismapping,
                        "prob_alt": o.prob_alt,
                        "prob_ref": o.prob_ref,
                        "prob_missed_allele": o.prob_missed_allele,
                        "prob_sample_alt": o.prob_sample_alt,
                    }
                )
            return out

        model = TumorNormalModel(
            purity,
            [obs_dicts(p) for p in item.pileups],
            (bt.alt, bt.ref, bt.any),
            [str(c) for c in FULL_COMBOS],
        )
        vals = model.posterior(artifact_combos)
        # reference denominator: combos CONSIDERED (allowed), not active
        if artifact_combos and n_considered != len(artifact_combos):
            # re-scale the artifact prior to the considered count
            vals["artifact"] += math.log(len(artifact_combos)) - math.log(
                n_considered
            )
        marg = lse(list(vals.values()))
        print(f"--- locus {v0.chrom}:{v0.pos + 1} {v0.ref_allele}>{v0.alt_allele}")
        for k, v in vals.items():
            post = v - marg
            phred = -10.0 / math.log(10.0) * post
            print(f"  PROB_{k.upper():<16} {phred:10.4f}  (ln {post:.6f})")
        idx += 1


if __name__ == "__main__":
    main()
