"""Generic Euler-sequence conversion + reduced-DOF rotation fitting.

Reference: math/utility.h:185-246 rotationMatrixToEuler (arbitrary axis
triples, intrinsic/extrinsic) and rotationMatrixToOneAxisEuler /
rotationMatrixToTwoAxisEuler (best-fit, rotation_fitting_test.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from momentum_tpu.math.euler import (
    _axis_matrix,
    euler_to_matrix,
    euler_xyz_to_matrix,
    euler_zyx_to_matrix,
    rotation_matrix_to_euler,
    rotation_matrix_to_one_axis_euler,
    rotation_matrix_to_two_axis_euler,
)
from momentum_tpu.math import quaternion as quat

ALL_SEQUENCES = [(i, j, k) for i in range(3) for j in range(3)
                 for k in range(3) if i != j and j != k]


@pytest.mark.parametrize("axes", ALL_SEQUENCES)
@pytest.mark.parametrize("convention", ["intrinsic", "extrinsic"])
def test_round_trip_all_sequences(axes, convention):
    rng = np.random.RandomState(hash(axes) % 2**31)
    angles = rng.uniform(-np.pi, np.pi, (64, 3))
    # include exact and near gimbal locks for the middle angle
    locks = [np.pi / 2, -np.pi / 2] if axes[0] != axes[2] else [0.0, np.pi]
    angles[:8, 1] = np.repeat(locks, 4)
    angles[8:16, 1] = np.repeat(locks, 4) + rng.uniform(-1e-4, 1e-4, 8)

    m = euler_to_matrix(jnp.asarray(angles, jnp.float32), axes, convention)
    extracted = rotation_matrix_to_euler(m, axes, convention)
    m2 = euler_to_matrix(extracted, axes, convention)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_matches_specialized_xyz_zyx():
    rng = np.random.RandomState(7)
    angles = jnp.asarray(rng.uniform(-1.2, 1.2, (32, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(euler_to_matrix(angles, (0, 1, 2), "intrinsic")),
        np.asarray(euler_xyz_to_matrix(angles)), atol=1e-6)
    # joint convention Rz(a2)·Ry(a1)·Rx(a0) == extrinsic (0,1,2) == intrinsic ZYX
    np.testing.assert_allclose(
        np.asarray(euler_to_matrix(angles, (0, 1, 2), "extrinsic")),
        np.asarray(euler_zyx_to_matrix(angles)), atol=1e-6)


def test_extrinsic_is_reversed_intrinsic():
    rng = np.random.RandomState(9)
    angles = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 3)), jnp.float32)
    a = euler_to_matrix(angles, (0, 1, 2), "extrinsic")
    b = euler_to_matrix(angles[..., ::-1], (2, 1, 0), "intrinsic")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_invalid_arguments():
    m = jnp.eye(3)
    with pytest.raises(ValueError):
        rotation_matrix_to_euler(m, (0, 0, 1))
    with pytest.raises(ValueError):
        euler_to_matrix(jnp.zeros(3), (0, 1, 2), "sideways")
    with pytest.raises(ValueError):
        rotation_matrix_to_two_axis_euler(m, 1, 1)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_one_axis_exact(axis):
    """Exact single-axis rotations are recovered precisely
    (rotation_fitting_test.cpp OneAxisRotationFitting)."""
    angles = jnp.asarray([0.0, np.pi / 6, np.pi / 4, np.pi / 3, np.pi / 2,
                          -np.pi / 4, -np.pi / 2], jnp.float32)
    m = _axis_matrix(angles, axis)
    fit = rotation_matrix_to_one_axis_euler(m, axis)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(angles), atol=1e-6)


def test_one_axis_best_fit_optimality():
    """For a general rotation the result is the least-squares optimum: no
    angle on a dense grid does better."""
    rng = np.random.RandomState(3)
    q = rng.randn(6, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    m = quat.to_rotation_matrix(jnp.asarray(q, jnp.float32))
    for axis in range(3):
        fit = rotation_matrix_to_one_axis_euler(m, axis)
        r_fit = np.asarray(
            ((_axis_matrix(fit, axis) - m) ** 2).sum(axis=(1, 2)))
        grid = jnp.asarray(np.linspace(-np.pi, np.pi, 2881), jnp.float32)
        rg = _axis_matrix(grid, axis)  # (G, 3, 3)
        r_grid = np.asarray(
            ((rg[None] - np.asarray(m)[:, None]) ** 2).sum(axis=(2, 3))
        ).min(axis=1)
        assert np.all(r_fit <= r_grid + 1e-4)


@pytest.mark.parametrize("axes", [(0, 1), (1, 2), (2, 0), (1, 0), (2, 1)])
def test_two_axis_exact(axes):
    """Exact two-axis rotations (axis0 first, then axis1: R1·R0) are
    recovered (rotation_fitting_test.cpp TwoAxisRotationFitting)."""
    a0, a1 = axes
    rng = np.random.RandomState(5)
    t = rng.uniform(-1.2, 1.2, (16, 2)).astype(np.float32)
    m = _axis_matrix(jnp.asarray(t[:, 1]), a1) @ _axis_matrix(
        jnp.asarray(t[:, 0]), a0)
    fit = rotation_matrix_to_two_axis_euler(m, a0, a1)
    m2 = _axis_matrix(fit[:, 1], a1) @ _axis_matrix(fit[:, 0], a0)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_two_axis_best_fit_beats_grid():
    rng = np.random.RandomState(11)
    q = rng.randn(4, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    m = quat.to_rotation_matrix(jnp.asarray(q, jnp.float32))
    fit = rotation_matrix_to_two_axis_euler(m, 0, 2)
    m_fit = _axis_matrix(fit[:, 1], 2) @ _axis_matrix(fit[:, 0], 0)
    r_fit = np.asarray(((m_fit - m) ** 2).sum(axis=(1, 2)))

    g = np.linspace(-np.pi, np.pi, 361)
    g0, g1 = np.meshgrid(g, g, indexing="ij")
    rg = np.asarray(_axis_matrix(jnp.asarray(g1.ravel(), jnp.float32), 2)
                    @ _axis_matrix(jnp.asarray(g0.ravel(), jnp.float32), 0))
    for i in range(m.shape[0]):
        r_grid = ((rg - np.asarray(m[i])) ** 2).sum(axis=(1, 2)).min()
        assert r_fit[i] <= r_grid + 1e-3
