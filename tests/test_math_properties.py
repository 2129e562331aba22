"""Algebraic property tests for the core math layers: group laws for
quaternions and skel_states, transform consistency, Euler round trips at
randomized poses. These pin the invariants every solver and IO path leans
on (the reference validates the same algebra through
test_skel_state.py / test_quaternion.py in pymomentum)."""

import numpy as np
import pytest

import jax.numpy as jnp

from momentum_tpu.math import quaternion as quat
from momentum_tpu.math import skel_state as ss

RNG = np.random.default_rng(42)


def rand_quat(n=8):
    q = RNG.normal(size=(n, 4)).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def rand_state(n=8):
    t = RNG.normal(size=(n, 3)).astype(np.float32)
    q = np.asarray(rand_quat(n))
    s = np.exp(RNG.uniform(-0.5, 0.5, (n, 1))).astype(np.float32)
    return jnp.asarray(np.concatenate([t, q, s], axis=-1))


class TestQuaternionGroup:
    def test_associativity(self):
        a, b, c = rand_quat(), rand_quat(), rand_quat()
        lhs = quat.multiply(quat.multiply(a, b), c)
        rhs = quat.multiply(a, quat.multiply(b, c))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-5)

    def test_identity_and_inverse(self):
        a = rand_quat()
        e = jnp.broadcast_to(quat.identity(), a.shape)
        np.testing.assert_allclose(np.asarray(quat.multiply(a, e)),
                                   np.asarray(a), atol=1e-6)
        prod = np.asarray(quat.multiply(a, quat.inverse(a)))
        np.testing.assert_allclose(np.abs(prod[:, 3]), 1.0, atol=1e-5)
        np.testing.assert_allclose(prod[:, :3], 0.0, atol=1e-5)

    def test_rotation_matrix_homomorphism(self):
        a, b = rand_quat(), rand_quat()
        lhs = np.asarray(quat.to_rotation_matrix(quat.multiply(a, b)))
        rhs = np.einsum("nij,njk->nik",
                        np.asarray(quat.to_rotation_matrix(a)),
                        np.asarray(quat.to_rotation_matrix(b)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_rotate_vector_matches_matrix(self):
        a = rand_quat()
        v = jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32))
        lhs = np.asarray(quat.rotate_vector(a, v))
        rhs = np.einsum("nij,nj->ni",
                        np.asarray(quat.to_rotation_matrix(a)), np.asarray(v))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_axis_angle_round_trip(self):
        axis = RNG.normal(size=(8, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        angle = RNG.uniform(-2.5, 2.5, (8, 1))
        aa = jnp.asarray((axis * angle).astype(np.float32))
        back = np.asarray(quat.to_axis_angle(quat.from_axis_angle(aa)))
        np.testing.assert_allclose(back, np.asarray(aa), atol=1e-4)

    def test_slerp_endpoints_and_midpoint_norm(self):
        a, b = rand_quat(), rand_quat()
        np.testing.assert_allclose(np.abs(np.sum(
            np.asarray(quat.slerp(a, b, 0.0)) * np.asarray(a), axis=-1)),
            1.0, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.sum(
            np.asarray(quat.slerp(a, b, 1.0)) * np.asarray(b), axis=-1)),
            1.0, atol=1e-5)
        mid = np.asarray(quat.slerp(a, b, 0.5))
        np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0,
                                   atol=1e-5)

    def test_from_two_vectors_maps_exactly(self):
        u = RNG.normal(size=(8, 3)).astype(np.float32)
        v = RNG.normal(size=(8, 3)).astype(np.float32)
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        q = quat.from_two_vectors(jnp.asarray(u), jnp.asarray(v))
        rotated = np.asarray(quat.rotate_vector(q, jnp.asarray(u)))
        np.testing.assert_allclose(rotated, v, atol=1e-5)


class TestSkelStateGroup:
    def test_associativity(self):
        a, b, c = rand_state(), rand_state(), rand_state()
        lhs = ss.multiply(ss.multiply(a, b), c)
        rhs = ss.multiply(a, ss.multiply(b, c))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=2e-4)

    def test_identity_and_inverse(self):
        a = rand_state()
        e = jnp.broadcast_to(ss.identity(), a.shape)
        np.testing.assert_allclose(np.asarray(ss.multiply(a, e)),
                                   np.asarray(a), atol=1e-5)
        prod = np.asarray(ss.multiply(a, ss.inverse(a)))
        np.testing.assert_allclose(prod[:, :3], 0.0, atol=1e-4)
        np.testing.assert_allclose(np.abs(prod[:, 6]), 1.0, atol=1e-5)
        np.testing.assert_allclose(prod[:, 7], 1.0, atol=1e-5)

    def test_action_homomorphism(self):
        """(a·b)(p) == a(b(p)) — the defining property the FK prefix
        products rely on."""
        a, b = rand_state(), rand_state()
        p = jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32))
        lhs = np.asarray(ss.transform_points(ss.multiply(a, b), p))
        rhs = np.asarray(ss.transform_points(a, ss.transform_points(b, p)))
        np.testing.assert_allclose(lhs, rhs, atol=2e-4)

    def test_matrix_round_trip(self):
        a = rand_state()
        back = np.array(ss.from_matrix(ss.to_matrix(a)))  # writable copy
        ref = np.asarray(a)
        # quaternion sign is a gauge freedom
        sign = np.sign(np.sum(back[:, 3:7] * ref[:, 3:7], axis=-1,
                              keepdims=True))
        back[:, 3:7] *= sign
        np.testing.assert_allclose(back, ref, atol=1e-4)

    def test_matrix_action_agrees(self):
        a = rand_state()
        p = RNG.normal(size=(8, 3)).astype(np.float32)
        hom = np.concatenate([p, np.ones((8, 1), np.float32)], axis=-1)
        lhs = np.einsum("nij,nj->ni", np.asarray(ss.to_matrix(a)), hom)[:, :3]
        rhs = np.asarray(ss.transform_points(a, jnp.asarray(p)))
        np.testing.assert_allclose(lhs, rhs, atol=2e-4)

    def test_component_constructors_compose(self):
        t = jnp.asarray(RNG.normal(size=3).astype(np.float32))
        q = rand_quat(1)[0]
        s = jnp.asarray([1.7], jnp.float32)
        combined = ss.multiply(
            ss.from_translation(t),
            ss.multiply(ss.from_quaternion(q), ss.from_scale(s)))
        tt, qq, sc = ss.split(combined)
        np.testing.assert_allclose(np.asarray(tt), np.asarray(t), atol=1e-6)
        np.testing.assert_allclose(
            np.abs(float(jnp.sum(qq * q))), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sc).reshape(()), 1.7, atol=1e-5)


class TestEulerRoundTrips:
    @pytest.mark.parametrize("axes", [(0, 1, 2), (2, 1, 0), (1, 0, 2),
                                      (2, 0, 1)])
    @pytest.mark.parametrize("convention", ["intrinsic", "extrinsic"])
    def test_matrix_euler_matrix(self, axes, convention):
        from momentum_tpu.math.euler import (
            euler_to_matrix, rotation_matrix_to_euler)

        angles = RNG.uniform(-1.2, 1.2, (6, 3)).astype(np.float32)
        m = euler_to_matrix(jnp.asarray(angles), axes, convention)
        back = rotation_matrix_to_euler(m, axes, convention)
        m2 = euler_to_matrix(back, axes, convention)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-4)
