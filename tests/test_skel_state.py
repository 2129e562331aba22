"""skel_state algebra tests: composition semantics must match the reference's
TransformT (momentum/math/transform.h:119-129, 193-195)."""

import numpy as np
import jax.numpy as jnp

from momentum_tpu.math import skel_state as ss, quaternion as quat


def random_states(rng, n):
    t = rng.normal(size=(n, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = rng.uniform(0.3, 2.5, size=(n, 1))
    return jnp.asarray(np.concatenate([t, q, s], axis=-1), jnp.float32)


def test_multiply_matches_matrix(rng):
    a = random_states(rng, 32)
    b = random_states(rng, 32)
    ab = ss.multiply(a, b)
    m_ab = np.asarray(ss.to_matrix(ab))
    m = np.asarray(ss.to_matrix(a)) @ np.asarray(ss.to_matrix(b))
    np.testing.assert_allclose(m_ab, m, atol=1e-4)


def test_transform_points_matches_matrix(rng):
    a = random_states(rng, 32)
    p = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    tp = np.asarray(ss.transform_points(a, p))
    m = np.asarray(ss.to_matrix(a))
    hp = np.einsum("nij,nj->ni", m[:, :3, :3], np.asarray(p)) + m[:, :3, 3]
    np.testing.assert_allclose(tp, hp, atol=1e-4)


def test_inverse(rng):
    a = random_states(rng, 32)
    ident = np.asarray(ss.multiply(a, ss.inverse(a)))
    expect = np.tile([0, 0, 0, 0, 0, 0, 1, 1.0], (32, 1))
    np.testing.assert_allclose(ident, expect, atol=1e-4)


def test_matrix_roundtrip(rng):
    a = random_states(rng, 64)
    m = ss.to_matrix(a)
    a2 = ss.from_matrix(m)
    m2 = np.asarray(ss.to_matrix(a2))
    np.testing.assert_allclose(m2, np.asarray(m), atol=1e-3)


def test_associativity(rng):
    a, b, c = random_states(rng, 16), random_states(rng, 16), random_states(rng, 16)
    lhs = np.asarray(ss.multiply(ss.multiply(a, b), c))
    rhs = np.asarray(ss.multiply(a, ss.multiply(b, c)))
    np.testing.assert_allclose(lhs[:, :3], rhs[:, :3], atol=1e-3)
    np.testing.assert_allclose(np.abs(np.sum(lhs[:, 3:7] * rhs[:, 3:7], axis=-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(lhs[:, 7], rhs[:, 7], rtol=1e-5)


def test_blend_identity_weights(rng):
    a = random_states(rng, 8)
    stacked = jnp.stack([a, a], axis=-2)  # (8, 2, 8)
    blended = np.asarray(ss.blend(stacked))
    qdot = np.abs(np.sum(blended[:, 3:7] * np.asarray(a)[:, 3:7], axis=-1))
    np.testing.assert_allclose(blended[:, :3], np.asarray(a)[:, :3], atol=1e-5)
    np.testing.assert_allclose(qdot, 1.0, atol=1e-5)


def test_generalized_loss_values_and_derivs():
    from momentum_tpu.math.generalized_loss import GeneralizedLoss, ALPHA_WELSCH

    s = jnp.asarray(np.linspace(0.0, 9.0, 50), jnp.float32)
    for alpha, c in [(2.0, 1.0), (1.0, 0.7), (0.0, 1.3), (ALPHA_WELSCH, 0.9), (-2.0, 1.1), (0.5, 2.0)]:
        loss = GeneralizedLoss(alpha, c)
        v = np.asarray(loss.value(s))
        assert v[0] == 0.0 or abs(v[0]) < 1e-6  # f(0) = 0 in every branch
        assert np.all(np.diff(v) >= -1e-6)  # monotone nondecreasing
        # deriv vs finite difference
        h = 1e-3
        fd = (np.asarray(loss.value(s + h)) - np.asarray(loss.value(s - h))) / (2 * h)
        np.testing.assert_allclose(np.asarray(loss.deriv(s))[1:], fd[1:], rtol=2e-2, atol=1e-4)
