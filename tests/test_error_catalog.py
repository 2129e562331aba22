"""Catalog-enumeration derivative tests: EVERY error-function class exported
from momentum_tpu.errors gets an FD gradient check + residual/error
consistency check at a pose where its residual is ACTIVE (nonzero), so a new
error function cannot ship untested. Mirrors the reference's
TEST_GRADIENT_AND_JACOBIAN sweep (test/character_solver/
error_function_helpers.h:55-78, per-function tolerances *.cpp:26-74), plus a
per-record-type sweep for ParameterLimits (limit_error_function_test.cpp)."""

import dataclasses as dc
import inspect

import jax.numpy as jnp
import numpy as np
import pytest

import momentum_tpu.errors as E
from momentum_tpu.camera import Camera, PinholeIntrinsics
from momentum_tpu.character import CollisionGeometry
from momentum_tpu.character.limits import make_limits
from momentum_tpu.errors.base import ErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction
from momentum_tpu.testing.fixtures import create_test_character


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


def _unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _quat(rng):
    v = rng.normal(size=4)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _camera():
    # camera 6 units down +z of the world origin looking back at the rig
    eye_from_world = jnp.asarray([0.0, 0.0, 6.0, 0.0, 0.0, 0.0, 1.0, 1.0])
    return Camera.create(PinholeIntrinsics.create(500.0, 500.0, 320.0, 240.0),
                         eye_from_world)


def _projections(n):
    p = np.zeros((n, 3, 4), np.float32)
    p[:, 0, 0] = p[:, 1, 1] = 2.0
    p[:, 2, 2] = 1.0
    p[:, 2, 3] = 5.0
    return p


def _sdf():
    from momentum_tpu.axel.sdf import SignedDistanceField

    rng = _rng()
    grid = rng.normal(0, 1, (8, 8, 8)).astype(np.float32)
    return SignedDistanceField(
        origin=jnp.asarray([-3.0, -3.0, -3.0]),
        spacing=jnp.asarray([1.0, 1.0, 1.0]),
        values=jnp.asarray(grid))


def _collision_char():
    """Two long fat capsules on joints 1 and 3 so random folded poses
    overlap (the fixture's thin chain rarely collides)."""
    char = create_test_character(4)
    cap_tf = np.zeros((2, 8), np.float32)
    cap_tf[:, 5] = np.sin(np.pi / 4)
    cap_tf[:, 6] = np.cos(np.pi / 4)
    cap_tf[:, 7] = 1.0
    collision = CollisionGeometry(
        parent=jnp.asarray([1, 3], jnp.int32),
        transform=jnp.asarray(cap_tf),
        radius=jnp.full((2, 2), 0.3, jnp.float32),
        length=jnp.full((2,), 0.8, jnp.float32))
    return dc.replace(char, collision=collision)


def _active_pose(fn, scale=1.2, tries=200):
    rng = _rng()
    p = fn.character.num_model_parameters
    for _ in range(tries):
        x = jnp.asarray(rng.normal(0, scale, p), jnp.float32)
        if float(fn.error(x)) > 1e-10:
            return x
    raise AssertionError("no active pose found")


# name -> factory(char, rng) returning (error_function, char_override or None,
# pose_scale). Keys must cover every exported ErrorFunction subclass.
def _catalog():
    rng = _rng()
    char = create_test_character(4)
    nj = char.num_joints
    nv = char.mesh.num_vertices
    p3 = lambda n: rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    parents = lambda n: rng.integers(0, nj, n)
    vid = np.arange(0, nv, 5, dtype=np.int32)

    from momentum_tpu.errors import Mppca

    d = char.num_model_parameters
    mu = rng.uniform(-0.2, 0.2, (2, d))
    prior = Mppca.from_components(
        np.ones(2) / 2, mu, [rng.normal(size=(d, 2)) * 0.3 for _ in range(2)],
        rng.uniform(0.05, 0.2, 2), names=tuple(char.parameter_transform.names))

    target_state = char.skeleton_states(
        jnp.asarray(rng.uniform(-0.3, 0.3, d), jnp.float32))

    proj = np.zeros((len(vid), 3, 4), np.float32)
    proj[:, 0, 0] = proj[:, 1, 1] = 500.0
    proj[:, 2, 2] = 1.0
    proj[:, 2, 3] = 6.0

    tri = np.asarray(char.mesh.faces)[:4]

    entries = {
        "PositionErrorFunction": (E.PositionErrorFunction.create(
            parents(4), p3(4), p3(4) * 2), None, 0.3),
        "OrientationErrorFunction": (E.OrientationErrorFunction.create(
            parents(2), np.stack([_quat(rng), _quat(rng)])), None, 0.3),
        "ModelParametersErrorFunction": (E.ModelParametersErrorFunction.create(
            rng.uniform(-0.2, 0.2, d).astype(np.float32)), None, 0.3),
        "LimitErrorFunction": (E.LimitErrorFunction.create(), None, 0.5),
        "AimDirErrorFunction": (E.AimDirErrorFunction.create(
            parents(3), p3(3), _unit(rng, 3), p3(3) * 2), None, 0.3),
        "AimDistErrorFunction": (E.AimDistErrorFunction.create(
            parents(3), p3(3), _unit(rng, 3), p3(3) * 2), None, 0.3),
        "DistanceErrorFunction": (E.DistanceErrorFunction.create(
            parents(3), p3(3), p3(3) * 3, rng.uniform(0.5, 2.0, 3)), None, 0.3),
        "FixedAxisAngleErrorFunction": (E.FixedAxisAngleErrorFunction.create(
            parents(3), _unit(rng, 3), _unit(rng, 3)), None, 0.3),
        "FixedAxisCosErrorFunction": (E.FixedAxisCosErrorFunction.create(
            parents(3), _unit(rng, 3), _unit(rng, 3)), None, 0.3),
        "FixedAxisDiffErrorFunction": (E.FixedAxisDiffErrorFunction.create(
            parents(3), _unit(rng, 3), _unit(rng, 3)), None, 0.3),
        "NormalErrorFunction": (E.NormalErrorFunction.create(
            parents(3), p3(3), _unit(rng, 3), p3(3)), None, 0.3),
        "PlaneErrorFunction": (E.PlaneErrorFunction.create(
            parents(3), p3(3), _unit(rng, 3), rng.uniform(-1, 1, 3)), None, 0.3),
        "ProjectionErrorFunction": (E.ProjectionErrorFunction.create(
            parents(3), p3(3), _projections(3),
            rng.uniform(-0.5, 0.5, (3, 2)), near_clip=0.01), None, 0.3),
        "JointToJointPositionErrorFunction": (
            E.JointToJointPositionErrorFunction.create(
                [nj - 1, nj - 2], [0, 0], p3(2), p3(2), p3(2)), None, 0.3),
        "JointToJointDistanceErrorFunction": (
            E.JointToJointDistanceErrorFunction.create(
                [nj - 1, nj - 2], [0, 1], p3(2), p3(2),
                rng.uniform(0.5, 2.0, 2)), None, 0.3),
        "JointToJointOrientationErrorFunction": (
            E.JointToJointOrientationErrorFunction.create(
                [nj - 1], [0], [_quat(rng)]), None, 0.3),
        "PosePriorErrorFunction": (E.PosePriorErrorFunction.create(
            prior, char.parameter_transform.names), None, 0.3),
        "StateErrorFunction": (E.StateErrorFunction.create(
            target_state), None, 0.3),
        "VertexPositionErrorFunction": (E.VertexPositionErrorFunction.create(
            vid, rng.normal(0, 0.5, (len(vid), 3)).astype(np.float32)),
            None, 0.3),
        "VertexPlaneErrorFunction": (E.VertexPlaneErrorFunction.create(
            vid, rng.normal(0, 0.5, (len(vid), 3)).astype(np.float32),
            _unit(rng, len(vid))), None, 0.3),
        "VertexNormalErrorFunction": (E.VertexNormalErrorFunction.create(
            vid, rng.normal(0, 0.5, (len(vid), 3)).astype(np.float32),
            _unit(rng, len(vid))), None, 0.3),
        "VertexProjectionErrorFunction": (
            E.VertexProjectionErrorFunction.create(
                vid, proj, rng.normal(0, 50, (len(vid), 2)).astype(np.float32)),
            None, 0.3),
        "VertexVertexDistanceErrorFunction": (
            E.VertexVertexDistanceErrorFunction.create(
                vid[:4], vid[1:5], rng.uniform(0.2, 1.0, 4)), None, 0.3),
        "PointTriangleVertexErrorFunction": (
            E.PointTriangleVertexErrorFunction.create(
                np.asarray([nv - 1, nv - 2, nv - 3, nv - 4], np.int32), tri,
                np.full((4, 3), 1.0 / 3.0, np.float32)), None, 0.3),
        "CameraVertexProjectionErrorFunction": (
            E.CameraVertexProjectionErrorFunction.create(
                _camera(), vid,
                rng.normal(0, 50, (len(vid), 2)).astype(np.float32) + 300.0),
            None, 0.3),
        "CameraProjectionErrorFunction": (
            E.CameraProjectionErrorFunction.create(
                _camera(), parents(3), p3(3),
                rng.normal(0, 50, (3, 2)).astype(np.float32) + 300.0),
            None, 0.3),
        "CollisionErrorFunction": (
            E.CollisionErrorFunction.create(_collision_char()),
            _collision_char(), 1.2),
        "PlaneCollisionErrorFunction": (
            E.PlaneCollisionErrorFunction.create(char), None, 1.2),
        "VertexSdfErrorFunction": (E.VertexSdfErrorFunction.create(
            _sdf(), vid, target_distance=rng.normal(0, 0.3, len(vid))),
            None, 0.3),
        "SdfCollisionErrorFunction": (E.SdfCollisionErrorFunction.create(
            _sdf(), vid), None, 0.3),
        "SkinnedLocatorErrorFunction": (E.SkinnedLocatorErrorFunction.create(
            np.stack([parents(2), parents(2), parents(2)]),
            np.asarray([[0.7, 0.3]] * 3, np.float32), p3(3), p3(3) * 2),
            None, 0.3),
        "SkinnedLocatorTriangleErrorFunction": (
            E.SkinnedLocatorTriangleErrorFunction.create(
                np.stack([parents(2), parents(2)]),
                np.asarray([[0.6, 0.4]] * 2, np.float32), p3(2),
                tri[:2], np.full((2, 3), 1.0 / 3.0, np.float32)), None, 0.3),
        "HeightErrorFunction": (E.HeightErrorFunction.create(
            target_height=2.5), None, 0.3),
        "CenterOfMassErrorFunction": (E.CenterOfMassErrorFunction.create(
            np.arange(nj), rng.uniform(0.5, 2.0, nj).astype(np.float32),
            p3(1)[0]), None, 0.3),
        "FloorErrorFunction": (E.FloorErrorFunction.create(
            vid, target_height=0.5), None, 0.3),
        "UnionErrorFunction": (E.UnionErrorFunction(
            children=(E.PositionErrorFunction.create(parents(2), p3(2), p3(2) * 2),
                      E.ModelParametersErrorFunction.create(
                          rng.uniform(-0.2, 0.2, d).astype(np.float32))),
            weight=jnp.asarray(1.5)), None, 0.3),
    }
    return entries


def _exported_error_classes():
    out = {}
    for name, obj in vars(E).items():
        if (inspect.isclass(obj) and issubclass(obj, ErrorFunction)
                and not inspect.isabstract(obj)
                and obj.__name__ not in ("ErrorFunction", "VectorErrorFunction")):
            out[obj.__name__] = obj
    return out


def test_catalog_is_complete():
    """A new exported error function MUST gain a catalog entry."""
    exported = set(_exported_error_classes())
    covered = set(_catalog())
    missing = exported - covered
    assert not missing, f"error classes with no catalog test entry: {missing}"


CATALOG_NAMES = sorted(_catalog())


@pytest.mark.parametrize("name", CATALOG_NAMES)
def test_catalog_gradient_and_consistency(name):
    ef, char_override, pose_scale = _catalog()[name]
    char = char_override or create_test_character(4)
    fn = SkeletonSolverFunction(char, (ef,))
    x = _active_pose(fn, scale=pose_scale)
    # residual rows reproduce the energy
    r = fn.residual(x)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(fn.error(x)),
                               rtol=2e-4, atol=1e-8, err_msg=name)
    # FD gradient
    g = np.asarray(fn.gradient(x))
    g_fd = _fd_gradient(fn.error, x)
    scale = max(1.0, np.abs(g_fd).max())
    np.testing.assert_allclose(g / scale, g_fd / scale, atol=8e-3,
                               err_msg=name)


# --- per-record-type limit sweep (limit_error_function_test.cpp pattern) ---

def _limit_char(**kw):
    char = create_test_character(4)
    return dc.replace(char, limits=make_limits(**kw))


LIMIT_CASES = {
    "minmax": dict(minmax=[(3, -0.05, 0.05, 1.0), (7, -0.02, 0.1, 2.0)]),
    "minmax_joint": dict(minmax_joint=[(1, 3, -0.05, 0.05, 1.5, 0.0),
                                       (2, 3, -0.1, 0.02, 1.0, 0.0)]),
    "linear": dict(linear=[(7, 8, 0.5, 0.1, -10.0, 10.0, 1.0),
                           (3, 4, -1.0, 0.0, -10.0, 10.0, 2.0)]),
    "linear_ranged": dict(linear=[(7, 8, 0.5, 0.1, -0.05, 0.05, 1.0)]),
    "linear_joint": dict(linear_joint=[(1 * 7 + 3, 2 * 7 + 3, 0.7, 0.05,
                                        -10.0, 10.0, 1.0)]),
    "halfplane": dict(halfplane=[(3, 7, 0.8, 0.6, 0.05, 1.0)]),
    "ellipsoid": dict(ellipsoid=[(3, 0, (0.1, 0.8, 0.0),
                                  np.diag([0.5, 0.7, 0.6, 1.0]), 1.0)]),
}


@pytest.mark.parametrize("case", sorted(LIMIT_CASES))
def test_limit_record_type_gradient(case):
    char = _limit_char(**LIMIT_CASES[case])
    fn = SkeletonSolverFunction(char, (E.LimitErrorFunction.create(),))
    x = _active_pose(fn, scale=0.6)
    r = fn.residual(x)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(fn.error(x)),
                               rtol=2e-4, atol=1e-9, err_msg=case)
    g = np.asarray(fn.gradient(x))
    g_fd = _fd_gradient(fn.error, x)
    scale = max(1.0, np.abs(g_fd).max())
    np.testing.assert_allclose(g / scale, g_fd / scale, atol=8e-3,
                               err_msg=case)
