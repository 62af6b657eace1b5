"""Parity of the hand-written Pallas class-likelihood kernel vs the XLA
path (interpret mode on the CPU test backend)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from varlociraptor_tpu.evidence.observation import F, FEATURES
from varlociraptor_tpu.ops import pallas_kernels as pk
from varlociraptor_tpu.ops.likelihood import _ll_cells, _read_terms


def _rand_inputs(seed, L=16, B=3, D=24, U=37):
    rng = np.random.default_rng(seed)
    Fe = len(FEATURES)
    feats = np.full((L, D, Fe), -1.0, np.float32)
    for k in (
        "prob_alt",
        "prob_ref",
        "prob_mapping",
        "prob_mismapping",
        "prob_missed_allele",
        "prob_sample_alt",
    ):
        feats[..., F[k]] = np.log(rng.uniform(0.01, 1.0, (L, D))).astype(
            np.float32
        )
    mask = rng.uniform(size=(L, D)) < 0.8
    ba = np.log(rng.uniform(0.1, 1, (L, B, D))).astype(np.float32)
    br = np.log(rng.uniform(0.1, 1, (L, B, D))).astype(np.float32)
    by = np.log(rng.uniform(0.1, 1, (L, B, D))).astype(np.float32)
    nu = rng.uniform(0, 1, U).astype(np.float32)
    nu[3] = 1.0
    kap = np.zeros(U, np.float32)
    kap[3] = 1.0
    return feats, mask, ba, br, by, nu, kap


@pytest.mark.parametrize("seed", [0, 7])
def test_ll_classes_pallas_matches_xla(seed):
    feats, mask, ba, br, by, nu, kap = _rand_inputs(seed)
    L, B, D = ba.shape
    a, r, m, c, psa = _read_terms(
        jnp.asarray(feats), jnp.asarray(ba), jnp.asarray(br), jnp.asarray(by)
    )
    psa_ = psa[:, :, None, :]
    w = psa_ * jnp.asarray(nu)[:, None] + jnp.asarray(kap)[:, None] * (
        1.0 - psa_
    )
    ref = np.asarray(
        _ll_cells(
            a[:, :, None, :],
            r[:, :, None, :],
            m[:, :, None, :],
            c[:, :, None, :],
            w,
            jnp.asarray(mask)[:, None, None, :],
        )
    )

    mk = jnp.asarray(mask)[:, None, :]
    c_sum = jnp.sum(jnp.where(mk, c, 0.0), axis=-1)
    a_f = jnp.where(mk, a, 1.0).reshape(L * B, D)
    r_f = jnp.where(mk, r, 1.0).reshape(L * B, D)
    m_f = jnp.where(mk, m, 0.0).reshape(L * B, D)
    psa_f = jnp.broadcast_to(psa, (L, B, D)).reshape(L * B, D)
    with pltpu.force_tpu_interpret_mode():
        out = pk.ll_classes_pallas(
            a_f, r_f, m_f, psa_f, jnp.asarray(nu), jnp.asarray(kap)
        )
    got = np.asarray(out).reshape(L, B, -1) + np.asarray(c_sum)[:, :, None]

    fin = np.isfinite(ref)
    assert np.array_equal(np.isfinite(got), fin)
    assert np.max(np.abs(got[fin] - ref[fin])) < 5e-5
