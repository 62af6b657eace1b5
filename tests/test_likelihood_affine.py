"""The affine-coefficient grid kernels must match the direct log-space
evaluation (likelihood.rs:63-250 semantics) up to f32 rounding."""

import math

import jax.numpy as jnp
import numpy as np

from varlociraptor_tpu.evidence.observation import F, N_FEATURES
from varlociraptor_tpu.ops.likelihood import (
    NEG_INF,
    _ln_add_exp,
    per_read_likelihood,
    sample_loglik_grid,
    sample_loglik_grid_contaminated,
)


def _rand_inputs(rng, L=3, S=2, B=2, D=7):
    feats = np.zeros((L, S, D, N_FEATURES), dtype=np.float32)
    p_alt = np.log(np.clip(rng.random((L, S, D)), 1e-12, 1.0)) * rng.integers(1, 20, (L, S, D))
    p_ref = np.log(np.clip(rng.random((L, S, D)), 1e-12, 1.0)) * rng.integers(1, 20, (L, S, D))
    feats[..., F["prob_alt"]] = p_alt
    feats[..., F["prob_ref"]] = p_ref
    feats[..., F["prob_mapping"]] = math.log(1 - 1e-5)
    feats[..., F["prob_mismapping"]] = math.log(1e-5)
    feats[..., F["prob_missed_allele"]] = np.logaddexp(p_alt, p_ref) + math.log(0.5)
    feats[..., F["prob_sample_alt"]] = np.log(
        np.clip(rng.random((L, S, D)) * 0.5 + 0.5, 1e-6, 1.0)
    )
    mask = rng.random((L, S, D)) < 0.8
    bias = rng.normal(size=(3, L, S, B, D)).astype(np.float32) * 0.5 - 1.0
    return feats, mask, bias[0], bias[1], bias[2]


def _loglik_logspace(feats, mask, ba, br, by, grid):
    ln_af = np.where(grid == 0.0, NEG_INF, np.log(np.maximum(grid, 1e-38)))
    f = jnp.asarray(feats)[:, :, None, None, :, :]
    af = jnp.asarray(ln_af)[None, None, None, :, None]
    ll = per_read_likelihood(
        af, f, jnp.asarray(ba)[:, :, :, None, :], jnp.asarray(br)[:, :, :, None, :],
        jnp.asarray(by)[:, :, :, None, :],
    )
    ll = jnp.where(jnp.asarray(mask)[:, :, None, None, :], ll, 0.0)
    return np.asarray(jnp.sum(ll, axis=-1))


def test_affine_matches_logspace_single():
    rng = np.random.default_rng(7)
    feats, mask, ba, br, by = _rand_inputs(rng)
    grid = np.linspace(0.0, 1.0, 11).astype(np.float32)
    got = np.asarray(
        sample_loglik_grid(
            jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(ba),
            jnp.asarray(br), jnp.asarray(by), jnp.asarray(grid),
        )
    )
    want = _loglik_logspace(feats, mask, ba, br, by, grid)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_affine_matches_logspace_contaminated():
    rng = np.random.default_rng(11)
    feats, mask, ba, br, by = _rand_inputs(rng, S=1)
    grid = np.linspace(0.0, 1.0, 11).astype(np.float32)
    purity, impurity = 0.75, 0.25
    got = np.asarray(
        sample_loglik_grid_contaminated(
            jnp.asarray(feats[:, 0]), jnp.asarray(mask[:, 0]),
            jnp.asarray(ba[:, 0]), jnp.asarray(br[:, 0]), jnp.asarray(by[:, 0]),
            jnp.asarray(grid), math.log(purity), math.log(impurity),
        )
    )
    # direct mixture in log space
    ln_af = np.where(grid == 0.0, NEG_INF, np.log(np.maximum(grid, 1e-38)))
    from varlociraptor_tpu.ops.likelihood import likelihood_mapping

    f = jnp.asarray(feats[:, 0])[:, None, None, None, :, :]
    ba_ = jnp.asarray(ba[:, 0])[:, :, None, None, :]
    br_ = jnp.asarray(br[:, 0])[:, :, None, None, :]
    by_ = jnp.asarray(by[:, 0])[:, :, None, None, :]
    af_p = jnp.asarray(ln_af)[None, None, :, None, None]
    af_s = jnp.asarray(ln_af)[None, None, None, :, None]
    lm = _ln_add_exp(
        math.log(purity) + likelihood_mapping(af_p, f, ba_, br_),
        math.log(impurity) + likelihood_mapping(af_s, f, ba_, br_),
    )
    p_map = f[..., F["prob_mapping"]]
    p_mismap = f[..., F["prob_mismapping"]]
    p_missed = f[..., F["prob_missed_allele"]]
    ll = _ln_add_exp(p_map + lm, p_mismap + p_missed + by_)
    ll = jnp.where(jnp.asarray(mask[:, 0])[:, None, None, None, :], ll, 0.0)
    want = np.asarray(jnp.sum(ll, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_affine_zero_and_one_af_exact():
    """af=0 must be exactly the ref path; af=1 exactly the alt path with the
    sampling-bias bypass (likelihood.rs:43-53)."""
    feats = np.zeros((1, 1, 1, N_FEATURES), dtype=np.float32)
    feats[..., F["prob_alt"]] = math.log(0.9)
    feats[..., F["prob_ref"]] = math.log(0.1)
    feats[..., F["prob_mapping"]] = 0.0
    feats[..., F["prob_mismapping"]] = NEG_INF
    feats[..., F["prob_missed_allele"]] = math.log(0.5)
    feats[..., F["prob_sample_alt"]] = math.log(0.7)  # bypassed at af=1
    mask = np.ones((1, 1, 1), dtype=bool)
    zeros = np.zeros((1, 1, 1, 1), dtype=np.float32)
    grid = jnp.asarray(np.array([0.0, 0.5, 1.0], dtype=np.float32))
    ll = np.asarray(
        sample_loglik_grid(
            jnp.asarray(feats), jnp.asarray(mask), zeros, zeros, zeros, grid
        )
    )[0, 0, 0]
    assert abs(ll[0] - math.log(0.1)) < 1e-6
    w = 0.5 * 0.7
    assert abs(ll[1] - math.log(w * 0.9 + (1 - w) * 0.1)) < 1e-6
    assert abs(ll[2] - math.log(0.9)) < 1e-6
