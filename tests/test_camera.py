"""Camera model + camera projection error tests (reference:
momentum/test/camera/ — project/unproject round trips per model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.camera import (
    Camera,
    OpenCVFisheyeIntrinsics,
    OpenCVIntrinsics,
    PinholeIntrinsics,
)
from momentum_tpu.errors.camera_projection import CameraProjectionErrorFunction
from momentum_tpu.math import quaternion as quat, skel_state as ss
from momentum_tpu.solver import SkeletonSolverFunction
from momentum_tpu.testing.fixtures import create_test_character


def _rng():
    return np.random.default_rng(12345)


def _points(rng, n=50):
    p = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    p[:, 2] = rng.uniform(2.0, 8.0, n)
    return jnp.asarray(p)


MODELS = {
    "pinhole": PinholeIntrinsics.create(500.0, 510.0, 320.0, 240.0),
    "opencv": OpenCVIntrinsics.create(
        500.0, 510.0, 320.0, 240.0,
        k=(0.1, -0.05, 0.001, 0.02, -0.01, 0.0), p=(0.002, -0.001)),
    "fisheye": OpenCVFisheyeIntrinsics.create(
        300.0, 300.0, 320.0, 240.0, k=(0.05, -0.01, 0.002, 0.0)),
}


@pytest.mark.parametrize("name", list(MODELS))
def test_project_unproject_round_trip(name):
    intr = MODELS[name]
    pts = _points(_rng())
    uvz, valid = intr.project(pts)
    assert bool(jnp.all(valid))
    back = intr.unproject(uvz, iterations=12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), rtol=1e-4, atol=1e-3)


def test_pinhole_matches_matrix():
    intr = MODELS["pinhole"]
    pts = _points(_rng())
    uvz, _ = intr.project(pts)
    u = 500.0 * pts[:, 0] / pts[:, 2] + 320.0
    np.testing.assert_allclose(np.asarray(uvz[:, 0]), np.asarray(u), rtol=1e-5)


def test_camera_extrinsics_round_trip():
    rng = _rng()
    q = quat.from_axis_angle(jnp.asarray(rng.uniform(-0.5, 0.5, 3), jnp.float32))
    xf = ss.join(jnp.asarray([0.2, -0.1, 0.4]), q, jnp.ones(1))
    cam = Camera.create(MODELS["opencv"], xf)
    # points in front of the camera in EYE space, mapped back to world
    pts_eye = _points(rng, 20)
    pts_world = ss.transform_points(ss.inverse(xf), pts_eye)
    uvz, valid = cam.project(pts_world)
    assert bool(jnp.all(valid))
    back = cam.unproject(uvz, iterations=12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts_world), atol=2e-3)


def test_camera_projection_error_function():
    char = create_test_character(4)
    rng = _rng()
    # camera looking at the character from z = -6 (character near origin)
    xf = ss.join(jnp.asarray([0.0, -1.5, 6.0]), quat.identity(), jnp.ones(1))
    cam = Camera.create(MODELS["pinhole"], xf)

    theta_gt = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    states = char.skeleton_states(theta_gt)
    world = char.locators.world_positions(states)
    uvz, valid = cam.project(world)
    assert bool(jnp.all(valid))

    ef = CameraProjectionErrorFunction.create(
        cam, np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(uvz[:, :2]))
    fn = SkeletonSolverFunction(char, (ef,))
    # zero at ground truth
    assert float(fn.error(theta_gt)) < 1e-4
    # gradient vs FD
    x = jnp.asarray(rng.uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
    g = np.asarray(fn.gradient(x))
    eps = 1e-3
    xs = np.asarray(x, np.float64)
    for i in rng.choice(char.num_model_parameters, 4, replace=False):
        xp, xm = xs.copy(), xs.copy()
        xp[i] += eps
        xm[i] -= eps
        fd = (float(fn.error(jnp.asarray(xp, jnp.float32)))
              - float(fn.error(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
        assert abs(g[i] - fd) < 5e-2 * max(1.0, abs(fd))


def test_gradients_flow_to_intrinsics():
    char = create_test_character(4)
    rng = _rng()
    xf = ss.join(jnp.asarray([0.0, -1.5, 6.0]), quat.identity(), jnp.ones(1))
    cam = Camera.create(PinholeIntrinsics.create(500.0, 500.0, 320.0, 240.0), xf)
    theta = jnp.asarray(rng.uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
    targets = rng.uniform(0, 640, (char.locators.num_locators, 2)).astype(np.float32)

    def loss(fx):
        import dataclasses
        intr = dataclasses.replace(cam.intrinsics, fx=fx)
        cam2 = dataclasses.replace(cam, intrinsics=intr)
        ef = CameraProjectionErrorFunction.create(
            cam2, np.asarray(char.locators.parent),
            np.asarray(char.locators.offset), targets)
        return SkeletonSolverFunction(char, (ef,)).error(theta)

    g = float(jax.grad(loss)(jnp.asarray(500.0)))
    fd = (float(loss(jnp.asarray(500.5))) - float(loss(jnp.asarray(499.5)))) / 1.0
    assert abs(g - fd) < 2e-2 * max(1.0, abs(fd))
