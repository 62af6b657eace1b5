"""Grid posterior engine: batched Bayesian event evaluation.

Replaces the reference's recursive VAF-tree walk + adaptive integration
(``/root/reference/src/variants/model/modes/generic.rs:191-460``) with masked
logsumexp/trapezoid reductions over a dense allele-frequency grid, batched
over loci.  Per event and branch (= flattened tree path):

  value = bias_prior + prior_event + logsumexp_{joint grid} [
              sum_s (loglik_s[g_s] + weights_s[g_s]) ]

with per-sample integration weights computed on device from the per-locus
depth (observable min/max bound adjustment, formula.rs:1172-1232; clear-ref
shortcut, generic.rs:270-300) and the absent-only prior applied exactly by
splitting out the all-zero joint grid point (prior.rs:718-761).

Samples are contracted as independent *units*: a contamination pair
(primary, contaminant) is one unit whose two grid axes are reduced jointly
through the two-axis likelihood (likelihood.rs:86-115); all other samples are
singleton units.  The branch integral is the product (log-sum) of unit
integrals — the factorization the reference's nested recursion computes
implicitly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..evidence.observation import F
from .event_program import SPECTRUM_SET, EventSpec
from .grid import AFGrid
from .likelihood import (
    NEG_INF,
    _ln1mexp,
    _ln_add_exp,
    sample_loglik_grid,
    sample_loglik_grid_contaminated,
)

LN_32 = math.log(3.2)  # Kass-Raftery "positive" threshold
PROB_05 = math.log(0.5)


def _ln_sub_exp(a, b):
    """log(exp(a) - exp(b)) for a >= b (clamped at -inf)."""
    out = a + _ln1mexp(jnp.minimum(b - a, 0.0))
    return jnp.where(b >= a, NEG_INF, out)


def _lse(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.log(jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True)) + m_safe
    s = jnp.where(jnp.isfinite(m), s, m)
    if isinstance(axis, tuple):
        for ax in sorted([a % x.ndim for a in axis], reverse=True):
            s = jnp.squeeze(s, axis=ax)
        return s
    return jnp.squeeze(s, axis=axis)


def observable_bounds(start, end, left_excl, right_excl, n_obs):
    """Device version of VAFRange::observable_min/max
    (formula.rs:1172-1232). All args broadcast together; n_obs float."""
    n = jnp.maximum(n_obs, 1.0)
    possible = (end - start) * n_obs > 1.0
    small_n = n_obs < 10.0
    raw = small_n | ~possible

    # observable_max
    c_max = n_obs * end
    is_int_max = jnp.abs(c_max - jnp.round(c_max)) < 1e-9
    c_max = jnp.where(right_excl & is_int_max, c_max - 1.0, c_max)
    c_max = jnp.floor(c_max + 1e-9)
    amax = jnp.where(raw | (c_max == 0.0), end, c_max / n)

    # observable_min
    c_min = n_obs * start
    adj_min = jnp.ceil(c_min - 1e-9) / n
    is_int_min = jnp.abs(c_min - jnp.round(c_min)) < 1e-9
    cand1 = (c_min + 1.0) / n
    cand0 = c_min / n
    excl_min = jnp.where((cand1 <= 1.0) & (cand1 <= amax), cand1, cand0)
    amin = jnp.where(left_excl & is_int_min, excl_min, adj_min)
    amin = jnp.where(raw, start, amin)
    amin = jnp.where(amin >= amax, start, amin)
    return amin, amax


def range_weights(grid, start, end, left_excl, right_excl, n_obs):
    """[..., G] log trapezoid weights for a range spectrum restricted to
    [observable_min, observable_max]. Leading dims come from the args."""
    amin, amax = observable_bounds(start, end, left_excl, right_excl, n_obs)
    amin = amin[..., None]
    amax = amax[..., None]
    inside = (grid >= amin - 1e-9) & (grid <= amax + 1e-9)
    left_in = jnp.concatenate(
        [jnp.zeros_like(inside[..., :1]), inside[..., :-1]], axis=-1
    )
    right_in = jnp.concatenate(
        [inside[..., 1:], jnp.zeros_like(inside[..., :1])], axis=-1
    )
    gl = jnp.where(left_in, jnp.concatenate([grid[:1], grid[:-1]]), grid)
    gr = jnp.where(right_in, jnp.concatenate([grid[1:], grid[-1:]]), grid)
    width = jnp.maximum(gr - gl, 0.0) * 0.5
    run_len = jnp.sum(inside, axis=-1, keepdims=True)
    single_width = jnp.maximum(amax - amin, 1e-12)
    width = jnp.where(run_len <= 1, single_width, width)
    return jnp.where(
        inside & (width > 0), jnp.log(jnp.maximum(width, 1e-38)), NEG_INF
    )


class SampleConfig:
    def __init__(self, name, contaminated_by=None, contamination_fraction=0.0):
        self.name = name
        self.contaminated_by = contaminated_by
        self.contamination_fraction = contamination_fraction


class PosteriorEngine:
    """Compiled engine for one scenario (event set + grid + contamination).

    jit-compiled once per (scenario, batch shape).
    """

    def __init__(
        self,
        events: list[EventSpec],
        grid: AFGrid,
        samples: list[SampleConfig],
        resolution: float = 0.01,
        all_uniform_prior: bool = False,
        valid_vaf_mask=None,
    ):
        self.events = events
        self.grid = grid
        self.samples = samples
        self.resolution = resolution
        self.all_uniform_prior = all_uniform_prior
        self.n_samples = len(samples)
        # [S, G] bool: per-sample grid points with nonzero prior mass
        # (prior.rs:298-438 zero structure — ploidy-0 contigs, uniform
        # universes, germline-multiple constraints). Applied as -inf
        # integration weight so impossible VAFs never contribute.
        self.valid_vaf_mask = (
            np.asarray(valid_vaf_mask, dtype=bool)
            if valid_vaf_mask is not None
            else None
        )

        # flatten branches
        self.branches = []
        for ei, ev in enumerate(events):
            for br in ev.branches:
                assert len(br.spectra) == self.n_samples, (
                    f"event {ev.name}: branch has {len(br.spectra)} spectra, "
                    f"expected {self.n_samples}"
                )
                self.branches.append((ei, br))
        self.n_branches = len(self.branches)

        G = grid.size
        NB = self.n_branches
        S = self.n_samples

        self.is_range = np.zeros((NB, S), dtype=bool)
        self.rng_start = np.zeros((NB, S), dtype=np.float32)
        self.rng_end = np.zeros((NB, S), dtype=np.float32)
        self.rng_lexcl = np.zeros((NB, S), dtype=bool)
        self.rng_rexcl = np.zeros((NB, S), dtype=bool)
        self.set_mask = np.zeros((NB, S, G), dtype=bool)
        self.spectrum_excludes_zero = np.zeros((NB, S), dtype=bool)
        self.spectrum_contains_zero = np.zeros((NB, S), dtype=bool)
        for bi, (ei, br) in enumerate(self.branches):
            for si, sp in enumerate(br.spectra):
                if sp.kind == SPECTRUM_SET:
                    self.set_mask[bi, si] = grid.set_mask(sp.values)
                    self.spectrum_excludes_zero[bi, si] = all(v > 0 for v in sp.values)
                    self.spectrum_contains_zero[bi, si] = 0.0 in sp.values
                else:
                    self.is_range[bi, si] = True
                    self.rng_start[bi, si] = sp.start
                    self.rng_end[bi, si] = sp.end
                    self.rng_lexcl[bi, si] = sp.left_exclusive
                    self.rng_rexcl[bi, si] = sp.right_exclusive
                    self.spectrum_excludes_zero[bi, si] = sp.start > 0 or (
                        sp.start == 0 and sp.left_exclusive
                    )
                    self.spectrum_contains_zero[bi, si] = sp.contains(0.0)

        self.branch_has_zero_point = self.spectrum_contains_zero.all(axis=1)
        self.zero_idx = grid.index_of(0.0)

        self.event_branch_idx = [
            [bi for bi, (e, _) in enumerate(self.branches) if e == ei]
            for ei in range(len(events))
        ]
        self.event_is_artifact = [ev.is_artifact for ev in events]
        self.event_all_absent = [ev.all_absent() for ev in events]

        # l2fc constraints: per-branch pairwise [G,G] masks over the grid
        # (utils/log2_fold_change.rs; vaftree NodeKind::Log2FoldChange)
        self.branch_lfc_masks = {}  # bi -> list[(sample_a, sample_b, mask [G,G])]
        gvals = grid.values.astype(np.float64)
        for bi, (ei, br) in enumerate(self.branches):
            if not br.lfcs:
                continue
            by_pair = {}
            for lfc in br.lfcs:
                m = np.zeros((G, G), dtype=bool)
                for ia, va in enumerate(gvals):
                    for ib, vb in enumerate(gvals):
                        m[ia, ib] = lfc.holds(va, vb)
                # canonicalize to (min_sample, max_sample) orientation
                if lfc.sample_a <= lfc.sample_b:
                    key = (lfc.sample_a, lfc.sample_b)
                else:
                    key = (lfc.sample_b, lfc.sample_a)
                    m = m.T
                by_pair[key] = by_pair.get(key, np.ones((G, G), dtype=bool)) & m
            samples_used = [s for pair in by_pair for s in pair]
            if len(set(samples_used)) != 2 * len(by_pair):
                raise NotImplementedError("chained l2fc constraints")
            self.branch_lfc_masks[bi] = [
                (a, b, m) for (a, b), m in by_pair.items()
            ]

        # contraction units: the contamination graph is a forest (each sample
        # has at most one contaminant parent; chains and shared contaminants
        # are allowed). Components are contracted by variable elimination
        # along the tree, so the factor tensors never exceed two grid axes.
        self.parent = [s.contaminated_by for s in samples]
        self.pairs = [
            (si, s.contaminated_by, s.contamination_fraction)
            for si, s in enumerate(samples)
            if s.contaminated_by is not None
        ]
        # mutual contamination (A contaminated by B AND B by A) is a 2-cycle:
        # two pairwise factors over the same two grid axes — fine for the
        # eliminator. Longer cycles would need loopy contraction; reject.
        for si in range(S):
            seen = set()
            p = si
            while p is not None:
                if p in seen:
                    if self.parent[p] is not None and self.parent[self.parent[p]] == p:
                        break  # 2-cycle
                    raise NotImplementedError(
                        "contamination cycles longer than 2 not supported"
                    )
                seen.add(p)
                p = self.parent[p]
        comp_of = list(range(S))

        def find(x):
            while comp_of[x] != x:
                comp_of[x] = comp_of[comp_of[x]]
                x = comp_of[x]
            return x

        for si, by, _ in self.pairs:
            comp_of[find(si)] = find(by)
        groups: dict[int, list] = {}
        for si in range(S):
            groups.setdefault(find(si), []).append(si)
        self.components = [sorted(v) for v in groups.values()]
        self.singletons = [c[0] for c in self.components if len(c) == 1]

        self._run = jax.jit(self._run_impl)
        self._run_full = jax.jit(self._run_impl)

    # ------------------------------------------------------------------
    def _branch_weights(self, n_obs):
        """[L, NB, S, G] log integration weights."""
        grid = jnp.asarray(self.grid.values)
        n = n_obs[:, None, :]  # [L,1,S]
        start = jnp.asarray(self.rng_start)[None]  # [1,NB,S]
        end = jnp.asarray(self.rng_end)[None]
        lex = jnp.asarray(self.rng_lexcl)[None]
        rex = jnp.asarray(self.rng_rexcl)[None]
        shape = jnp.broadcast_shapes(n.shape, start.shape)
        rw = range_weights(
            grid,
            jnp.broadcast_to(start, shape),
            jnp.broadcast_to(end, shape),
            jnp.broadcast_to(lex, shape),
            jnp.broadcast_to(rex, shape),
            jnp.broadcast_to(n, shape),
        )  # [L,NB,S,G]
        setw = jnp.where(jnp.asarray(self.set_mask)[None], 0.0, NEG_INF)
        w = jnp.where(jnp.asarray(self.is_range)[None, :, :, None], rw, setw)
        if self.valid_vaf_mask is not None:
            w = w + jnp.where(
                jnp.asarray(self.valid_vaf_mask)[None, None], 0.0, NEG_INF
            )
        return w

    # ------------------------------------------------------------------
    def _component_factors(self, comp, loglik, pair_logliks, w_s):
        """Log factors of one contamination component: a root sample yields
        a 1-var factor [L,B,NB,G]; a contaminated sample a 2-var factor
        [L,B,NB,G,Gparent]. Branch weights are absorbed on each sample's
        own axis."""
        factors = []
        for si in comp:
            p = self.parent[si]
            if p is None:
                t = loglik[:, si][:, :, None, :] + w_s[:, si][:, None]
                factors.append(((si,), t))
            else:
                t = (
                    pair_logliks[si][:, :, None, :, :]
                    + w_s[:, si][:, None, :, :, None]
                )
                factors.append(((si, p), t))
        return factors

    def _eliminate_component(self, comp, factors, keep):
        """Tree variable elimination over a component's grid axes; returns
        [L,B,NB] (keep=None) or [L,B,NB,G] (keep's own axis retained)."""
        from collections import deque

        adj = {si: set() for si in comp}
        for si in comp:
            p = self.parent[si]
            if p is not None and p in adj:
                adj[si].add(p)
                adj[p].add(si)
        root = keep if keep is not None else comp[0]
        depth = {root: 0}
        dq = deque([root])
        while dq:
            u0 = dq.popleft()
            for v2 in adj[u0]:
                if v2 not in depth:
                    depth[v2] = depth[u0] + 1
                    dq.append(v2)
        order = sorted(comp, key=lambda s: -depth[s])

        fs = list(factors)
        for v in order:
            if keep is not None and v == keep:
                continue
            group = [f for f in fs if v in f[0]]
            rest = [f for f in fs if v not in f[0]]
            uvars = []
            for vars_, _ in group:
                for x in vars_:
                    if x != v and x not in uvars:
                        uvars.append(x)
            assert len(uvars) <= 1, "contamination graph is not a tree"
            u_ = uvars[0] if uvars else None
            acc = None
            for vars_, t in group:
                if vars_ == (v,):
                    tt = t[..., None, :] if u_ is not None else t
                elif vars_ == (v, u_):
                    tt = jnp.swapaxes(t, -1, -2)
                elif vars_ == (u_, v):
                    tt = t
                else:  # pragma: no cover
                    raise AssertionError(f"unexpected factor vars {vars_}")
                acc = tt if acc is None else acc + tt
            msg = _lse(acc, axis=-1)
            fs = rest + [(((u_,) if u_ is not None else ()), msg)]

        out = None
        for vars_, t in fs:
            tt = t if (vars_ or keep is None) else t[..., None]
            out = tt if out is None else out + tt
        return out

    def _unit_terms(self, loglik, pair_logliks, w):
        """Per-unit branch integrals and per-sample grid-resolved 'own'
        densities.

        Returns:
          U: dict[unit_key] -> [L,B,NB] unit integral
          own: dict[sample] -> ([L,B,NB,G] own density, unit_key)
          Uzero: dict[unit_key] -> [L,B,NB] unit value at all-zero point
        """
        w_s = jnp.swapaxes(w, 1, 2)  # [L,S,NB,G]
        U = {}
        own = {}
        Uzero = {}
        zi = self.zero_idx
        for comp in self.components:
            key = ("c",) + tuple(comp)
            factors = self._component_factors(comp, loglik, pair_logliks, w_s)
            U[key] = self._eliminate_component(comp, factors, None)
            zval = None
            for vars_, t in factors:
                tz = t[..., zi] if len(vars_) == 1 else t[..., zi, zi]
                zval = tz if zval is None else zval + tz
            Uzero[key] = zval
            for si in comp:
                own[si] = (
                    self._eliminate_component(comp, factors, si),
                    key,
                )
        return U, own, Uzero

    def _run_impl(
        self,
        feats,
        mask,
        bias_alt,
        bias_ref,
        bias_any,
        combo_active,
        branch_gates,
        ln_prior_absent,
        ln_prior_joint=None,
    ):
        grid = jnp.asarray(self.grid.values)
        L, S, D, _ = feats.shape
        B = bias_alt.shape[2]
        NB = self.n_branches

        n_obs = jnp.sum(mask, axis=-1).astype(jnp.float32)  # [L,S]

        loglik = sample_loglik_grid(
            feats, mask, bias_alt, bias_ref, bias_any, grid
        )  # [L,S,B,G]

        pair_logliks = {}
        for si, by, frac in self.pairs:
            purity = 1.0 - frac
            pair_logliks[si] = sample_loglik_grid_contaminated(
                feats[:, si],
                mask[:, si],
                bias_alt[:, si],
                bias_ref[:, si],
                bias_any[:, si],
                grid,
                math.log(purity),
                math.log(frac) if frac > 0 else NEG_INF,
            )

        # clear-ref shortcut (generic.rs:270-300)
        p_ref = feats[..., F["prob_ref"]]
        p_alt = feats[..., F["prob_alt"]]
        positive_ref = (p_ref - p_alt) > LN_32
        clear_ref = (n_obs > 10) & jnp.all(positive_ref | ~mask, axis=-1)  # [L,S]

        w = self._branch_weights(n_obs)  # [L,NB,S,G]
        excl0 = jnp.asarray(self.spectrum_excludes_zero)[None]  # [1,NB,S]
        kill = clear_ref[:, None, :] & excl0
        w = jnp.where(kill[..., None], NEG_INF, w)

        U, own, Uzero = self._unit_terms(loglik, pair_logliks, w)

        T = jnp.zeros((L, B, NB))
        Z = jnp.zeros((L, B, NB))
        for key, val in U.items():
            T = T + val
            Z = Z + Uzero[key]

        # branches with l2fc constraints: re-contract the constrained sample
        # pairs jointly under the pairwise grid mask
        if self.branch_lfc_masks:
            w_s = jnp.swapaxes(w, 1, 2)  # [L,S,NB,G]
            zi = self.zero_idx
            comp_of_sample = {}
            for comp in self.components:
                for s in comp:
                    comp_of_sample[s] = tuple(comp)
            for bi, lfc_list in self.branch_lfc_masks.items():
                coupled = {s for (a, b, _) in lfc_list for s in (a, b)}
                coupled_comps = {comp_of_sample[s] for s in coupled}
                t_bi = jnp.zeros((L, B))
                z_bi = jnp.zeros((L, B))
                for key, val in U.items():
                    if tuple(key[1:]) in coupled_comps:
                        continue
                    t_bi = t_bi + val[:, :, bi]
                    z_bi = z_bi + Uzero[key][:, :, bi]
                for a, b, mask_np in lfc_list:
                    lfc_mask = jnp.where(jnp.asarray(mask_np), 0.0, NEG_INF)
                    if a in self.singletons and b in self.singletons:
                        da = loglik[:, a] + w_s[:, a, bi][:, None, :]  # [L,B,G]
                        db = loglik[:, b] + w_s[:, b, bi][:, None, :]
                        joint_ab = (
                            da[:, :, :, None]
                            + db[:, :, None, :]
                            + lfc_mask[None, None]
                        )
                        t_bi = t_bi + _lse(joint_ab, axis=(-2, -1))
                        z00 = da[:, :, zi] + db[:, :, zi] + lfc_mask[zi, zi]
                        z_bi = z_bi + z00
                        continue
                    # both contaminated by the same parent (star component,
                    # e.g. tumor_pre/tumor_post both contaminated by normal):
                    # contract lse over (ga, gb, gp) with a scan over the
                    # parent grid so memory stays at [L,B,G,G]
                    p = self.parent[a]
                    if (
                        p is None
                        or self.parent[b] != p
                        or self.parent[p] is not None
                        or comp_of_sample[a] != comp_of_sample[b]
                    ):
                        raise NotImplementedError(
                            "l2fc supported between plain samples or "
                            "co-contaminated siblings"
                        )
                    comp = comp_of_sample[a]
                    fa = pair_logliks[a] + w_s[:, a, bi][:, None, :, None]
                    fb = pair_logliks[b] + w_s[:, b, bi][:, None, :, None]
                    rp = loglik[:, p] + w_s[:, p, bi][:, None, :]  # [L,B,Gp]
                    rp_zero = rp[..., zi]
                    for c in comp:
                        if c in (a, b, p):
                            continue
                        fc = pair_logliks[c] + w_s[:, c, bi][:, None, :, None]
                        rp = rp + _lse(fc, axis=-2)
                        rp_zero = rp_zero + fc[..., zi, zi]

                    def _gp_step(carry, xs):
                        fa_g, fb_g, rp_g = xs  # [L,B,G], [L,B,G], [L,B]
                        slab = (
                            fa_g[:, :, :, None]
                            + fb_g[:, :, None, :]
                            + lfc_mask[None, None]
                        )
                        val = _lse(slab, axis=(-2, -1)) + rp_g
                        return jnp.logaddexp(carry, val), None

                    init = jnp.full((L, B), NEG_INF)
                    xs = (
                        jnp.moveaxis(fa, -1, 0),
                        jnp.moveaxis(fb, -1, 0),
                        jnp.moveaxis(rp, -1, 0),
                    )
                    total, _ = jax.lax.scan(_gp_step, init, xs)
                    t_bi = t_bi + total
                    z00 = (
                        fa[..., zi, zi]
                        + fb[..., zi, zi]
                        + lfc_mask[zi, zi]
                        + rp_zero
                    )
                    z_bi = z_bi + z00
                T = T.at[:, :, bi].set(t_bi)
                Z = Z.at[:, :, bi].set(z_bi)

        # full-prior mode (--full-prior): evaluate the prior pointwise on the
        # joint grid instead of the absent-only split. Supported for S <= 2.
        if ln_prior_joint is not None:
            w_s = jnp.swapaxes(w, 1, 2)  # [L,S,NB,G]
            if S == 1:
                d0 = loglik[:, 0, :, None, :] + w_s[:, 0, None, :, :]  # [L,B,NB,G]
                T = _lse(d0 + ln_prior_joint[:, None, None, :], axis=-1)
            elif S == 2 and self.pairs:
                si, by, _ = self.pairs[0]
                pl = pair_logliks[si]  # [L,B,G,Gc]
                wp = w_s[:, si, None, :, :, None]
                wc = w_s[:, by, None, :, None, :]
                lc = loglik[:, by][:, :, None, None, :]
                P = (
                    ln_prior_joint[:, None, None, :, :]
                    if si < by
                    else jnp.swapaxes(ln_prior_joint, -1, -2)[:, None, None, :, :]
                )
                joint = pl[:, :, None, :, :] + wp + wc + lc + P
                T = _lse(joint, axis=(-2, -1))
            elif S == 2:
                d0 = loglik[:, 0, :, None, :] + w_s[:, 0, None, :, :]
                d1 = loglik[:, 1, :, None, :] + w_s[:, 1, None, :, :]
                joint = (
                    d0[..., :, None]
                    + d1[..., None, :]
                    + ln_prior_joint[:, None, None, :, :]
                )
                T = _lse(joint, axis=(-2, -1))
            else:
                raise NotImplementedError(
                    "full prior supported for <= 2 samples (use absent-only)"
                )
            T = jnp.where(branch_gates[:, None, :], T, NEG_INF)
            branch_val = jnp.where(combo_active[:, :, None], T, NEG_INF)
            return self._assemble(
                branch_val, loglik, pair_logliks, w, branch_gates, combo_active
            )

        z0 = jnp.asarray(self.branch_has_zero_point)
        T = jnp.where(branch_gates[:, None, :], T, NEG_INF)
        Z = jnp.where(branch_gates[:, None, :] & z0[None, None], Z, NEG_INF)

        # absent-only prior split (prior.rs:718-761)
        if self.all_uniform_prior:
            branch_val = T
        else:
            pa = ln_prior_absent[:, None, None]
            ln_not_absent = _ln1mexp(pa)
            nonzero_part = jnp.where(z0[None, None], _ln_sub_exp(T, Z), T)
            zero_part = jnp.where(z0[None, None], Z, NEG_INF)
            branch_val = _ln_add_exp(ln_not_absent + nonzero_part, pa + zero_part)

        branch_val = jnp.where(combo_active[:, :, None], branch_val, NEG_INF)
        return self._assemble(
            branch_val, loglik, pair_logliks, w, branch_gates, combo_active
        )

    def _assemble(
        self, branch_val, loglik, pair_logliks, w, branch_gates, combo_active
    ):
        L, S, B, G = loglik.shape
        NB = self.n_branches
        n_events = len(self.events)
        n_artifact_combos = max(1, B - 1)
        event_vals = []
        for ei in range(n_events):
            idxs = tuple(self.event_branch_idx[ei])
            if not idxs:
                # event compiled to False (e.g. impossible on this contig)
                event_vals.append(jnp.full((L,), NEG_INF))
                continue
            bv = branch_val[:, :, idxs]  # [L,B,nb_e]
            ev_b = _lse(bv, axis=-1)  # [L,B]
            if self.event_is_artifact[ei]:
                bias_prior = PROB_05 - math.log(n_artifact_combos)
                val = bias_prior + _lse(ev_b[:, 1:], axis=-1)
            else:
                val = PROB_05 + ev_b[:, 0]
            event_vals.append(val)
        joint = jnp.stack(event_vals, axis=-1)  # [L,E]
        marginal = _lse(joint, axis=-1)
        posteriors = joint - marginal[:, None]

        # per-combo artifact mass (for MAP artifact-combination reporting)
        artifact_idxs = tuple(
            bi
            for ei in range(n_events)
            if self.event_is_artifact[ei]
            for bi in self.event_branch_idx[ei]
        )
        if artifact_idxs:
            combo_joint = _lse(branch_val[:, :, artifact_idxs], axis=-1)  # [L,B]
        else:
            combo_joint = jnp.full((L, B), NEG_INF)

        # per-event per-sample marginal densities over grid (MAP / AFD):
        # the reference's MAP scan compares unweighted joint densities at grid
        # points (calling.rs:844-937), so the sample's own axis uses the
        # spectrum indicator mask, not the trapezoid dx weights
        wmask = jnp.where(w > NEG_INF / 2, 0.0, NEG_INF)
        U_m, own_m, _ = self._unit_terms(loglik, pair_logliks, wmask)
        U, own = U_m, own_m
        densities = []
        for ei in range(n_events):
            idxs = tuple(self.event_branch_idx[ei])
            if not idxs:
                densities.append(jnp.full((L, S, G), NEG_INF))
                continue
            if self.event_is_artifact[ei]:
                active = combo_active & (
                    jnp.arange(B)[None, :] > 0
                )
            else:
                active = jnp.arange(B)[None, :] == 0
                active = jnp.broadcast_to(active, combo_active.shape)
            per_sample = []
            for si in range(S):
                d_own, key = own[si]
                rest = jnp.zeros((L, B, NB))
                for k2, val in U.items():
                    if k2 != key:
                        rest = rest + val
                d = d_own + rest[..., None]  # [L,B,NB,G]
                d = jnp.where(branch_gates[:, None, :, None], d, NEG_INF)
                d = _lse(d[:, :, idxs, :], axis=2)  # [L,B,G]
                d = jnp.where(active[:, :, None], d, NEG_INF)
                per_sample.append(_lse(d, axis=1))  # [L,G]
            densities.append(jnp.stack(per_sample, axis=1))
        densities = jnp.stack(densities, axis=1)  # [L,E,S,G]

        return {
            "joint": joint,
            "marginal": marginal,
            "posteriors": posteriors,
            "densities": densities,
            "combo_joint": combo_joint,
        }

    # ------------------------------------------------------------------
    def run(
        self,
        feats,
        mask,
        bias_alt,
        bias_ref,
        bias_any,
        combo_active,
        branch_gates,
        ln_prior_absent,
        ln_prior_joint=None,
    ):
        """Evaluate posteriors for a locus batch.

        feats [L,S,D,Fe] f32; mask [L,S,D] bool; bias_* [L,S,B,D] f32;
        combo_active [L,B] bool; branch_gates [L,NB] bool;
        ln_prior_absent [L] f32; ln_prior_joint [L, G,...] optional full
        prior on the joint grid (--full-prior; S <= 2).
        Returns dict: joint [L,E], posteriors [L,E], marginal [L],
        densities [L,E,S,G], n_obs [L,S] (numpy arrays).
        """
        args = [
            jnp.asarray(feats, dtype=jnp.float32),
            jnp.asarray(mask),
            jnp.asarray(bias_alt, dtype=jnp.float32),
            jnp.asarray(bias_ref, dtype=jnp.float32),
            jnp.asarray(bias_any, dtype=jnp.float32),
            jnp.asarray(combo_active),
            jnp.asarray(branch_gates),
            jnp.asarray(ln_prior_absent, dtype=jnp.float32),
        ]
        if ln_prior_joint is not None:
            out = self._run_full(
                *args, jnp.asarray(ln_prior_joint, dtype=jnp.float32)
            )
        else:
            out = self._run(*args)
        out = {k: np.asarray(v) for k, v in out.items()}
        out["n_obs"] = np.asarray(mask).sum(axis=-1)
        return out
