"""Tests for mesh/vertex, collision, and body-level error functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import momentum_tpu.errors as E
from momentum_tpu.math.geometry import closest_points_on_segments, point_triangle_closest_point
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


def _check_gradient(fn, x, atol=6e-3):
    g = np.asarray(fn.gradient(x))
    g_fd = _fd_gradient(fn.error, x)
    scale = max(1.0, np.abs(g_fd).max())
    np.testing.assert_allclose(g / scale, g_fd / scale, atol=atol)


def _check_gn_consistency(fn, x):
    r = fn.residual(x)
    np.testing.assert_allclose(float(jnp.sum(r * r)), float(fn.error(x)), rtol=1e-4, atol=1e-9)


class TestGeometryPrimitives:
    def test_segment_segment_simple(self):
        o1 = jnp.asarray([0.0, 0, 0]); d1 = jnp.asarray([1.0, 0, 0])
        o2 = jnp.asarray([0.5, 1.0, 0]); d2 = jnp.asarray([0.0, 0, 1.0])
        s, t, dist = closest_points_on_segments(o1, d1, o2, d2)
        assert abs(float(s) - 0.5) < 1e-6
        assert abs(float(t)) < 1e-6
        assert abs(float(dist) - 1.0) < 1e-5

    def test_segment_segment_brute_force(self):
        rng = _rng()
        for _ in range(50):
            o1, d1, o2, d2 = (jnp.asarray(rng.uniform(-1, 1, 3), jnp.float32) for _ in range(4))
            _, _, dist = closest_points_on_segments(o1, d1, o2, d2)
            ts = np.linspace(0, 1, 60)
            pts1 = np.asarray(o1)[None] + ts[:, None] * np.asarray(d1)[None]
            pts2 = np.asarray(o2)[None] + ts[:, None] * np.asarray(d2)[None]
            brute = np.min(np.linalg.norm(pts1[:, None] - pts2[None], axis=-1))
            assert float(dist) <= brute + 1e-3

    def test_point_triangle(self):
        rng = _rng()
        for _ in range(30):
            a, b, c, p = (jnp.asarray(rng.uniform(-1, 1, 3), jnp.float32) for _ in range(4))
            pt, bary = point_triangle_closest_point(p, a, b, c)
            # brute force over barycentric grid
            best = 1e9
            for u in np.linspace(0, 1, 40):
                for v in np.linspace(0, 1 - u, max(2, int(40 * (1 - u)))):
                    q = u * np.asarray(a) + v * np.asarray(b) + (1 - u - v) * np.asarray(c)
                    best = min(best, np.linalg.norm(q - np.asarray(p)))
            d = float(jnp.linalg.norm(pt - p))
            assert d <= best + 2e-2
            np.testing.assert_allclose(float(jnp.sum(bary)), 1.0, atol=1e-5)


class TestVertexErrors:
    def _x(self, char):
        return jnp.asarray(_rng().uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)

    def test_vertex_position(self, char):
        rng = _rng()
        nv = char.mesh.num_vertices
        idx = rng.integers(0, nv, 5)
        ef = E.VertexPositionErrorFunction.create(idx, rng.uniform(-1, 1, (5, 3)))
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_vertex_plane(self, char):
        rng = _rng()
        idx = rng.integers(0, char.mesh.num_vertices, 4)
        n = rng.normal(size=(4, 3)); n /= np.linalg.norm(n, axis=-1, keepdims=True)
        ef = E.VertexPlaneErrorFunction.create(idx, rng.uniform(-1, 1, (4, 3)), n)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_vertex_normal(self, char):
        rng = _rng()
        idx = rng.integers(0, char.mesh.num_vertices, 4)
        n = rng.normal(size=(4, 3)); n /= np.linalg.norm(n, axis=-1, keepdims=True)
        ef = E.VertexNormalErrorFunction.create(idx, rng.uniform(-1, 1, (4, 3)), n)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_vertex_projection(self, char):
        rng = _rng()
        idx = rng.integers(0, char.mesh.num_vertices, 3)
        proj = np.zeros((3, 3, 4), np.float32)
        proj[:, 0, 0] = 2.0
        proj[:, 1, 1] = 2.0
        proj[:, 2, 2] = 1.0
        proj[:, 2, 3] = 5.0
        ef = E.VertexProjectionErrorFunction.create(
            idx, proj, rng.uniform(-0.5, 0.5, (3, 2)), near_clip=0.01)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)


class TestCollision:
    def test_no_collision_at_rest(self, char):
        ef = E.CollisionErrorFunction.create(char)
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.zeros(char.num_model_parameters)
        assert float(fn.error(x)) == 0.0

    def test_penalty_when_folded(self, char):
        # fold joint1 by ~pi brings segments together → capsules overlap
        ef = E.CollisionErrorFunction.create(char)
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.zeros(char.num_model_parameters).at[7].set(np.pi * 0.98)
        assert float(fn.error(x)) > 0.0
        _check_gn_consistency(fn, x)

    def test_gradient(self, char):
        ef = E.CollisionErrorFunction.create(char)
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.zeros(char.num_model_parameters).at[7].set(np.pi * 0.9)
        if float(fn.error(x)) > 0:
            _check_gradient(fn, x, atol=1e-2)


class TestBody:
    def _x(self, char):
        return jnp.asarray(_rng().uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)

    def test_floor(self, char):
        ef = E.FloorErrorFunction.create(np.arange(char.mesh.num_vertices), k=5,
                                         target_height=-0.2, weight=2.0)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_center_of_mass(self, char):
        rng = _rng()
        ef = E.CenterOfMassErrorFunction.create(
            np.arange(char.num_joints), rng.uniform(0.5, 2.0, char.num_joints),
            target=[0.3, 1.0, -0.2], weight=1.5)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_center_of_mass_planar(self, char):
        rng = _rng()
        ef = E.CenterOfMassErrorFunction.create(
            np.arange(char.num_joints), rng.uniform(0.5, 2.0, char.num_joints),
            target=[0.3, 0.0, -0.2], project_to_plane=True)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)

    def test_height(self, char):
        ef = E.HeightErrorFunction.create(target_height=2.5)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)


class TestPlaneCollision:
    def test_penalty_below_floor(self, char):
        # plane at y = 1.0 -> lower capsules penetrate
        ef = E.PlaneCollisionErrorFunction.create(char, plane_offset=1.0)
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.zeros(char.num_model_parameters)
        assert float(fn.error(x)) > 0.0
        # far below the capsules -> no penalty
        ef2 = E.PlaneCollisionErrorFunction.create(char, plane_offset=-10.0)
        fn2 = SkeletonSolverFunction(char, (ef2,))
        assert float(fn2.error(x)) == 0.0

    def test_gradient_fd(self, char):
        ef = E.PlaneCollisionErrorFunction.create(char, plane_offset=0.5)
        fn = SkeletonSolverFunction(char, (ef,))
        rng = _rng()
        x = jnp.asarray(rng.uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
        if float(fn.error(x)) > 0:
            _check_gradient(fn, x, atol=1e-2)


class TestMoreVertexErrors:
    def _x(self, char):
        return jnp.asarray(_rng().uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)

    def test_point_triangle_position(self, char):
        rng = _rng()
        nv = char.mesh.num_vertices
        faces = np.asarray(char.mesh.faces)
        tri = faces[rng.integers(0, faces.shape[0], 3)]
        src = rng.integers(0, nv, 3)
        bary = rng.dirichlet(np.ones(3), 3).astype(np.float32)
        ef = E.PointTriangleVertexErrorFunction.create(src, tri, bary)
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_point_triangle_plane(self, char):
        rng = _rng()
        faces = np.asarray(char.mesh.faces)
        tri = faces[rng.integers(0, faces.shape[0], 2)]
        src = rng.integers(0, char.mesh.num_vertices, 2)
        bary = rng.dirichlet(np.ones(3), 2).astype(np.float32)
        ef = E.PointTriangleVertexErrorFunction.create(
            src, tri, bary, constraint_type="plane")
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_vertex_vertex_distance(self, char):
        rng = _rng()
        nv = char.mesh.num_vertices
        ef = E.VertexVertexDistanceErrorFunction.create(
            rng.integers(0, nv, 4), rng.integers(0, nv, 4),
            rng.uniform(0.2, 1.0, 4))
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x)
        _check_gn_consistency(fn, x)

    def test_camera_vertex_projection(self, char):
        from momentum_tpu.camera import Camera, PinholeIntrinsics
        from momentum_tpu.math import skel_state as ss
        rng = _rng()
        cam = Camera.create(
            PinholeIntrinsics.create(100.0, 100.0, 64.0, 64.0),
            ss.join(jnp.asarray([0.0, -1.5, 8.0]), jnp.asarray([0.0, 0, 0, 1.0]),
                    jnp.ones(1)))
        idx = rng.integers(0, char.mesh.num_vertices, 4)
        ef = E.CameraVertexProjectionErrorFunction.create(
            cam, idx, rng.uniform(0, 128, (4, 2)))
        fn = SkeletonSolverFunction(char, (ef,))
        x = self._x(char)
        _check_gradient(fn, x, atol=2e-2)
        _check_gn_consistency(fn, x)
