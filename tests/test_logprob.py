import math

import numpy as np
import pytest

from varlociraptor_tpu.utils import logprob as lp


def test_ln_add_exp_basic():
    a, b = math.log(0.3), math.log(0.2)
    assert lp.np_ln_add_exp(a, b) == pytest.approx(math.log(0.5))
    assert lp.np_ln_add_exp(lp.LOG_ZERO, b) == pytest.approx(b)
    assert lp.np_ln_add_exp(lp.LOG_ZERO, lp.LOG_ZERO) == lp.LOG_ZERO


def test_ln_sum_exp():
    xs = np.log([0.1, 0.2, 0.3])
    assert lp.np_ln_sum_exp(xs) == pytest.approx(math.log(0.6))
    assert lp.np_ln_sum_exp(np.full(4, lp.LOG_ZERO)) == lp.LOG_ZERO
    mat = np.log([[0.1, 0.2], [0.3, 0.4]])
    out = lp.np_ln_sum_exp(mat, axis=1)
    assert out == pytest.approx(np.log([0.3, 0.7]))


def test_ln_one_minus_exp():
    assert lp.np_ln_one_minus_exp(math.log(0.25)) == pytest.approx(math.log(0.75))
    assert lp.np_ln_one_minus_exp(0.0) == lp.LOG_ZERO
    assert lp.np_ln_one_minus_exp(lp.LOG_ZERO) == pytest.approx(0.0)
    # stability for tiny probabilities
    assert lp.np_ln_one_minus_exp(-1e-12) == pytest.approx(math.log(1e-12), rel=1e-3)


def test_cap_numerical_overshoot():
    assert lp.np_cap_numerical_overshoot(5e-4) == 0.0
    assert lp.np_cap_numerical_overshoot(-0.5) == -0.5


def test_phred_roundtrip():
    p = math.log(0.05)
    assert lp.np_log_from_phred(lp.np_phred_from_log(p)) == pytest.approx(p)
    assert lp.np_phred_from_log(math.log(0.1)) == pytest.approx(10.0)


def test_trapezoid_integration():
    # integral of f(x)=1 over [0,1] == 1
    grid = np.linspace(0, 1, 101)
    ld = np.zeros_like(grid)
    assert lp.np_ln_trapezoidal_integrate_grid(ld, grid) == pytest.approx(0.0)
    # integral of exp(x) over [0,1] == e - 1
    assert lp.np_ln_trapezoidal_integrate_grid(grid, grid) == pytest.approx(
        math.log(math.e - 1), abs=1e-4
    )


def test_simpson_integration():
    val = lp.np_ln_simpsons_integrate(lambda x: x, 0.0, 1.0, 11)
    assert val == pytest.approx(math.log(math.e - 1), abs=1e-5)


def test_kass_raftery():
    assert lp.kass_raftery(0.5) == lp.KR_NONE
    assert lp.kass_raftery(2.0) == lp.KR_BARELY
    assert lp.kass_raftery(5.0) == lp.KR_POSITIVE
    assert lp.kass_raftery(50.0) == lp.KR_STRONG
    assert lp.kass_raftery(1000.0) == lp.KR_VERY_STRONG


def test_jax_matches_numpy():
    import jax.numpy as jnp

    xs = np.array([-0.5, -2.0, -50.0, 0.0])
    # jax runs f32 by default; compare at f32-level tolerance
    np.testing.assert_allclose(
        np.asarray(lp.jnp_ln_one_minus_exp(jnp.array(xs[:-1]))),
        lp.np_ln_one_minus_exp(xs[:-1]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(lp.jnp_ln_sum_exp(jnp.array(xs))),
        lp.np_ln_sum_exp(xs),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(lp.jnp_ln_add_exp(jnp.array(xs), jnp.array(xs[::-1].copy()))),
        lp.np_ln_add_exp(xs, xs[::-1]),
        rtol=1e-4,
    )


def test_minilogprob_codec():
    vals = np.array([-0.5, -1000.0, -np.inf, -1e-8])
    use16, v16, v32 = lp.encode_minilogprob(vals)
    decoded = np.where(use16, v16.astype(np.float32), v32)
    assert np.isneginf(decoded[2])
    np.testing.assert_allclose(decoded[0], -0.5, rtol=1e-2)
