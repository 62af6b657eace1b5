"""Batched per-read likelihood kernel (JAX).

The elementwise formula of the reference's ``likelihood_mapping``
(``/root/reference/src/variants/model/likelihood.rs:196-220``) and the
single/contaminated sample models (``likelihood.rs:63-250``), vectorized over
(locus, bias-combo, AF-grid-point, read).  The reference's LRU caches vanish:
the dense grid *is* the memoization (SURVEY.md §7.1.4).

Shapes (per call):
  feats       [L, S, D, Fe]  observation features (observation.FEATURES)
  mask        [L, S, D]      read validity
  bias_alt/ref/any [L, S, B, D]
  grid        [G]            allele frequencies in [0, 1]

Outputs:
  loglik      [L, S, B, G]       per-sample likelihood sums (uncontaminated)
  loglik_pair [L, S, B, G, G2]   for contaminated samples (primary af x
                                 contaminant af), computed on demand
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..evidence.observation import F
from ..utils.logprob import NUMERICAL_EPSILON

NEG_INF = -jnp.inf


def _ln1mexp(x):
    """log(1-exp(x)) for x<=0, stable, with exact -inf at x==0."""
    x = jnp.minimum(x, 0.0)
    near = x > -math.log(2.0)
    safe_expm1 = -jnp.expm1(jnp.where(near, x, -1.0))
    a = jnp.log(jnp.maximum(safe_expm1, 1e-38))
    b = jnp.log1p(-jnp.exp(jnp.where(near, -1.0, x)))
    out = jnp.where(near, a, b)
    return jnp.where(x >= 0.0, NEG_INF, out)


def _ln_add_exp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    out = m_safe + jnp.log1p(jnp.exp(-jnp.abs(a - b)))
    return jnp.where(jnp.isfinite(m), out, m)


def prob_sample_alt_scaled(ln_af, prob_sample_alt):
    """af * prob_sample_alt with overshoot capping; af==1 bypasses sampling
    bias (likelihood.rs:43-53)."""
    scaled = ln_af + prob_sample_alt
    scaled = jnp.where((scaled > 0.0) & (scaled <= NUMERICAL_EPSILON), 0.0, scaled)
    return jnp.where(ln_af == 0.0, 0.0, scaled)


def likelihood_mapping(ln_af, feats, bias_alt, bias_ref):
    """P(obs | af, mapped) (likelihood.rs:196-220).

    ln_af broadcasts against feats[..., D, :] leading axes.
    """
    p_alt = feats[..., F["prob_alt"]]
    p_ref = feats[..., F["prob_ref"]]
    p_sample_alt = prob_sample_alt_scaled(ln_af, feats[..., F["prob_sample_alt"]])
    p_sample_ref = _ln1mexp(p_sample_alt)
    return _ln_add_exp(
        p_sample_alt + bias_alt + p_alt,
        p_sample_ref + p_ref + bias_ref,
    )


def per_read_likelihood(ln_af, feats, bias_alt, bias_ref, bias_any):
    """Total per-read likelihood incl. mismapping term
    (likelihood.rs:171-193)."""
    lm = likelihood_mapping(ln_af, feats, bias_alt, bias_ref)
    p_map = feats[..., F["prob_mapping"]]
    p_mismap = feats[..., F["prob_mismapping"]]
    p_missed = feats[..., F["prob_missed_allele"]]
    return _ln_add_exp(p_map + lm, p_mismap + p_missed + bias_any)


@partial(jax.jit, static_argnames=())
def sample_loglik_grid(feats, mask, bias_alt, bias_ref, bias_any, grid):
    """[L, S, B, G] log-likelihood sums over reads for every AF grid point."""
    ln_af = jnp.log(jnp.maximum(grid, 1e-38))
    ln_af = jnp.where(grid == 0.0, NEG_INF, ln_af)  # exact log(0)
    # broadcast: feats [L,S,1,1,D,Fe]; bias [L,S,B,1,D]; ln_af [G,1]
    f = feats[:, :, None, None, :, :]
    ba = bias_alt[:, :, :, None, :]
    br = bias_ref[:, :, :, None, :]
    by = bias_any[:, :, :, None, :]
    af = ln_af[None, None, None, :, None]
    ll = per_read_likelihood(af, f, ba, br, by)  # [L,S,B,G,D]
    ll = jnp.where(mask[:, :, None, None, :], ll, 0.0)
    return jnp.sum(ll, axis=-1)


@partial(jax.jit, static_argnames=())
def sample_loglik_grid_contaminated(
    feats, mask, bias_alt, bias_ref, bias_any, grid, ln_purity, ln_impurity
):
    """[L, B, G, G2] contaminated-sample likelihood sums
    (likelihood.rs:86-115): primary af on axis G, contaminant af on G2.

    feats/mask/bias here are for ONE sample: feats [L, D, Fe], mask [L, D],
    bias_* [L, B, D].
    """
    ln_af = jnp.log(jnp.maximum(grid, 1e-38))
    ln_af = jnp.where(grid == 0.0, NEG_INF, ln_af)
    f = feats[:, None, None, None, :, :]  # [L,1,1,1,D,Fe]
    ba = bias_alt[:, :, None, None, :]  # [L,B,1,1,D]
    br = bias_ref[:, :, None, None, :]
    by = bias_any[:, :, None, None, :]
    af_p = ln_af[None, None, :, None, None]  # primary on G axis
    af_s = ln_af[None, None, None, :, None]  # secondary on G2 axis
    lm_p = likelihood_mapping(af_p, f, ba, br)  # [L,B,G,1,D] -> broadcast
    lm_s = likelihood_mapping(af_s, f, ba, br)
    lm = _ln_add_exp(ln_purity + lm_p, ln_impurity + lm_s)  # [L,B,G,G2,D]
    p_map = f[..., F["prob_mapping"]]
    p_mismap = f[..., F["prob_mismapping"]]
    p_missed = f[..., F["prob_missed_allele"]]
    ll = _ln_add_exp(p_map + lm, p_mismap + p_missed + by)
    ll = jnp.where(mask[:, None, None, None, :], ll, 0.0)
    return jnp.sum(ll, axis=-1)
