"""Unit tests for math building blocks without dedicated coverage:
generalized robust loss (generalized_loss_test.cpp), low-rank covariance
(covariance_matrix_test.cpp)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from momentum_tpu.math.covariance import LowRankCovarianceMatrix
from momentum_tpu.math.generalized_loss import ALPHA_WELSCH, GeneralizedLoss

ALPHAS = [2.0, 1.0, 0.0, -2.0, ALPHA_WELSCH, 0.7, -5.0]


@pytest.mark.parametrize("alpha", ALPHAS)
@pytest.mark.parametrize("c", [0.5, 1.0, 2.0])
def test_loss_value_properties(alpha, c):
    """f(0) = 0, monotonically increasing, and deriv > 0 on s ≥ 0
    (generalized_loss_test.cpp invariants)."""
    loss = GeneralizedLoss(alpha=alpha, c=c)
    s = jnp.asarray(np.linspace(0.0, 9.0, 64), jnp.float32)
    v = np.asarray(loss.value(s))
    assert v[0] == pytest.approx(0.0, abs=1e-6)
    # monotone non-decreasing everywhere; strictly increasing away from the
    # f32 saturation plateau of the bounded losses (Welsch → 1)
    assert np.all(np.diff(v) >= 0.0)
    assert np.all(np.diff(v[:8]) > 0.0)
    d = np.asarray(loss.deriv(s))
    assert np.all(d >= 0.0) and d[0] > 0.0


@pytest.mark.parametrize("alpha", ALPHAS)
def test_loss_deriv_matches_fd(alpha):
    loss = GeneralizedLoss(alpha=alpha, c=1.3)
    s = np.linspace(0.1, 5.0, 20)
    eps = 1e-3
    fd = (np.asarray(loss.value(jnp.asarray(s + eps, jnp.float32)),
                     np.float64)
          - np.asarray(loss.value(jnp.asarray(s - eps, jnp.float32)),
                       np.float64)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(loss.deriv(jnp.asarray(s))), fd,
                               rtol=5e-2, atol=1e-4)


def test_loss_closed_forms():
    """Special alphas hit their closed forms (generalized_loss.h:14-58)."""
    s = np.asarray([0.0, 0.5, 2.0, 10.0])
    c = 1.5
    sj = jnp.asarray(s, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(GeneralizedLoss(alpha=2.0, c=c).value(sj)), s / c**2,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(GeneralizedLoss(alpha=1.0, c=c).value(sj)),
        np.sqrt(s / c**2 + 1.0) - 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(GeneralizedLoss(alpha=0.0, c=c).value(sj)),
        np.log(0.5 * s / c**2 + 1.0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(GeneralizedLoss(alpha=ALPHA_WELSCH, c=c).value(sj)),
        1.0 - np.exp(-0.5 * s / c**2), rtol=1e-5)


def test_loss_general_alpha_interpolates():
    """General-alpha branch agrees with the Barron formula."""
    a, c = 0.7, 1.1
    loss = GeneralizedLoss(alpha=a, c=c)
    s = np.asarray([0.3, 1.0, 4.0])
    expected = (abs(a - 2.0) / a) * ((s / c**2 / abs(a - 2.0) + 1.0)
                                     ** (a / 2.0) - 1.0)
    np.testing.assert_allclose(
        np.asarray(loss.value(jnp.asarray(s, jnp.float32))), expected,
        rtol=1e-5)


def _dense(cov):
    a = np.asarray(cov.a)
    return float(cov.sigma)**2 * np.eye(a.shape[1]) + a.T @ a


def test_covariance_times_and_inverse():
    rng = np.random.RandomState(0)
    a = rng.randn(3, 12).astype(np.float32)
    cov = LowRankCovarianceMatrix.create(0.8, a)
    dense = _dense(cov)
    x = rng.randn(12).astype(np.float32)
    np.testing.assert_allclose(np.asarray(cov.times_vec(jnp.asarray(x))),
                               dense @ x, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cov.inverse_times_vec(jnp.asarray(x))),
        np.linalg.solve(dense, x), rtol=1e-3, atol=1e-5)


def test_covariance_log_determinant():
    rng = np.random.RandomState(1)
    a = rng.randn(2, 9).astype(np.float32)
    cov = LowRankCovarianceMatrix.create(1.3, a)
    _, expected = np.linalg.slogdet(_dense(cov))
    assert float(cov.log_determinant()) == pytest.approx(expected, rel=1e-4)
    assert float(cov.inverse_log_determinant()) == pytest.approx(
        -expected, rel=1e-4)


def test_covariance_batched_rhs():
    rng = np.random.RandomState(2)
    a = rng.randn(2, 6).astype(np.float32)
    cov = LowRankCovarianceMatrix.create(0.5, a)
    dense = _dense(cov)
    xs = rng.randn(6, 4).astype(np.float32)  # 4 rhs columns
    np.testing.assert_allclose(
        np.asarray(cov.inverse_times_vec(jnp.asarray(xs))),
        np.linalg.solve(dense, xs), rtol=1e-3, atol=1e-5)
