"""Per-error-function derivative + semantics tests (reference pattern:
test/character_solver/*_error_function_test.cpp via TEST_GRADIENT_AND_JACOBIAN,
error_function_helpers.cpp:26-74)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import momentum_tpu.errors as E
from momentum_tpu.solver import SkeletonSolverFunction
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture(scope="module")
def char():
    return create_test_character(4)


def _rng():
    return np.random.default_rng(12345)


def _fd_gradient(f, x, eps=1e-3):
    g = np.zeros(x.shape[-1])
    x = np.asarray(x, np.float64)
    for i in range(x.shape[-1]):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (float(f(jnp.asarray(xp, jnp.float32)))
                - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
    return g


def _make_efs(char):
    rng = _rng()
    nj = char.num_joints
    p3 = lambda n: rng.uniform(-0.6, 0.6, (n, 3))
    parents = lambda n: rng.integers(0, nj, n)
    qrand = lambda n: np.stack([
        np.asarray(jnp.asarray([0.0, 0.0, 0.0, 1.0])) if False else _rand_quat(rng)
        for _ in range(n)
    ])
    from momentum_tpu.math import quaternion as quat

    efs = {
        "aim_dir": E.AimDirErrorFunction.create(parents(3), p3(3), _unit(rng, 3), p3(3) * 2),
        "aim_dist": E.AimDistErrorFunction.create(parents(3), p3(3), _unit(rng, 3), p3(3) * 2),
        "fixed_axis_diff": E.FixedAxisDiffErrorFunction.create(parents(3), _unit(rng, 3), _unit(rng, 3)),
        "fixed_axis_cos": E.FixedAxisCosErrorFunction.create(parents(3), _unit(rng, 3), _unit(rng, 3)),
        "fixed_axis_angle": E.FixedAxisAngleErrorFunction.create(parents(3), _unit(rng, 3), _unit(rng, 3)),
        "plane": E.PlaneErrorFunction.create(parents(3), p3(3), _unit(rng, 3), rng.uniform(-1, 1, 3)),
        "half_plane": E.PlaneErrorFunction.create(
            parents(3), p3(3), _unit(rng, 3), rng.uniform(-1, 1, 3), half_plane=True),
        "normal": E.NormalErrorFunction.create(parents(3), p3(3), _unit(rng, 3), p3(3)),
        "distance": E.DistanceErrorFunction.create(
            parents(3), p3(3), p3(3) * 3, rng.uniform(0.5, 2.0, 3)),
        "projection": E.ProjectionErrorFunction.create(
            parents(3), p3(3), _projections(3), rng.uniform(-0.5, 0.5, (3, 2)),
            near_clip=0.01),
        "j2j_position": E.JointToJointPositionErrorFunction.create(
            [nj - 1, nj - 2], [0, 0], p3(2), p3(2), p3(2)),
        "j2j_distance": E.JointToJointDistanceErrorFunction.create(
            [nj - 1, nj - 2], [0, 1], p3(2), p3(2), rng.uniform(0.5, 2.0, 2)),
        "j2j_orientation": E.JointToJointOrientationErrorFunction.create(
            [nj - 1], [0], [_rand_quat(rng)]),
        "orientation": E.OrientationErrorFunction.create(
            parents(2), np.stack([_rand_quat(rng) for _ in range(2)])),
    }
    return efs


def _unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _rand_quat(rng):
    v = rng.normal(size=4)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _projections(n):
    rng = _rng()
    # camera at z = -5 looking +z, focal 2
    p = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        p[i, 0, 0] = 2.0
        p[i, 1, 1] = 2.0
        p[i, 2, 2] = 1.0
        p[i, 2, 3] = 5.0
        p[i, 0, 3] = rng.uniform(-0.2, 0.2)
    return p


EF_NAMES = [
    "aim_dir", "aim_dist", "fixed_axis_diff", "fixed_axis_cos", "fixed_axis_angle",
    "plane", "half_plane", "normal", "distance", "projection",
    "j2j_position", "j2j_distance", "j2j_orientation", "orientation",
]


@pytest.mark.parametrize("name", EF_NAMES)
def test_gradient_matches_fd(char, name):
    ef = _make_efs(char)[name]
    fn = SkeletonSolverFunction(char, (ef,))
    rng = _rng()
    x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    g = np.asarray(fn.gradient(x))
    g_fd = _fd_gradient(fn.error, x)
    scale = max(1.0, np.abs(g_fd).max())
    np.testing.assert_allclose(g / scale, g_fd / scale, atol=5e-3)


@pytest.mark.parametrize("name", EF_NAMES)
def test_residual_consistent_with_error(char, name):
    ef = _make_efs(char)[name]
    fn = SkeletonSolverFunction(char, (ef,))
    rng = _rng()
    x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    r = fn.residual(x)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(fn.error(x)), rtol=1e-4, atol=1e-8)


class TestPosePrior:
    def _prior(self, char):
        rng = _rng()
        d = char.num_model_parameters
        k = 3
        mu = rng.uniform(-0.2, 0.2, (k, d))
        w_list = [rng.normal(size=(d, 2)) * 0.3 for _ in range(k)]
        sigma2 = rng.uniform(0.05, 0.2, k)
        pi = np.ones(k) / k
        prior = E.Mppca.from_components(pi, mu, w_list, sigma2,
                                        names=tuple(char.parameter_transform.names))
        return E.PosePriorErrorFunction.create(
            prior, char.parameter_transform.names, weight=2.0)

    def test_gradient_matches_fd(self, char):
        ef = self._prior(char)
        fn = SkeletonSolverFunction(char, (ef,))
        rng = _rng()
        x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        g = np.asarray(fn.gradient(x))
        g_fd = _fd_gradient(fn.error, x)
        scale = max(1.0, np.abs(g_fd).max())
        np.testing.assert_allclose(g / scale, g_fd / scale, atol=5e-3)

    def test_error_at_mean_is_lower(self, char):
        ef = self._prior(char)
        fn = SkeletonSolverFunction(char, (ef,))
        x_mean = jnp.asarray(np.asarray(ef.prior.mu[0]), jnp.float32)
        x_far = x_mean + 1.0
        assert float(fn.error(x_far)) > float(fn.error(x_mean))

    def test_residual_gn_consistent(self, char):
        # rows reproduce the Mahalanobis part: Σ rows² == weight·kW·½ dᵀCinv d
        ef = self._prior(char)
        fn = SkeletonSolverFunction(char, (ef,))
        rng = _rng()
        x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        r = fn.residual(x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(fn.error(x)),
                                   rtol=1e-4, atol=1e-9)


class TestStateError:
    def test_gradient_and_consistency(self, char):
        rng = _rng()
        theta_t = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        target = char.skeleton_states(theta_t)
        ef = E.StateErrorFunction.create(target, weight=1.5)
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        g = np.asarray(fn.gradient(x))
        g_fd = _fd_gradient(fn.error, x)
        scale = max(1.0, np.abs(g_fd).max())
        np.testing.assert_allclose(g / scale, g_fd / scale, atol=5e-3)
        r = fn.residual(x)
        np.testing.assert_allclose(float(jnp.sum(r * r)), float(fn.error(x)), rtol=1e-4)

    def test_zero_at_target(self, char):
        rng = _rng()
        theta_t = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        target = char.skeleton_states(theta_t)
        ef = E.StateErrorFunction.create(target)
        fn = SkeletonSolverFunction(char, (ef,))
        assert float(fn.error(theta_t)) < 1e-9

    def test_logmap_variant(self, char):
        rng = _rng()
        theta_t = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        target = char.skeleton_states(theta_t)
        ef = E.StateErrorFunction.create(target, rotation_error_type="logmap")
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.asarray(rng.uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
        g = np.asarray(fn.gradient(x))
        g_fd = _fd_gradient(fn.error, x)
        scale = max(1.0, np.abs(g_fd).max())
        np.testing.assert_allclose(g / scale, g_fd / scale, atol=5e-3)
