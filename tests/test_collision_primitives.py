"""Ellipsoid/box collision primitives + oriented support plane.

Reference behaviors: collision_geometry.h:80-150 (CollisionEllipsoidT /
CollisionBoxT), plane_collision_query.cpp:181-228 (per-type plane overlap),
math/support_polygon.{h,cpp} (SupportPlane, convex hull)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.character.character import (
    CollisionGeometry,
    PRIMITIVE_BOX,
    PRIMITIVE_ELLIPSOID,
    PRIMITIVE_TAPERED_CAPSULE,
)
from momentum_tpu.errors.collision import (
    PlaneCollisionErrorFunction,
    primitive_states,
    support_radius_along,
)
from momentum_tpu.math.support_polygon import (
    SupportPlane,
    convex_hull_2d,
    cross2d,
    support_polygon_from_world_points,
)
from momentum_tpu.testing.fixtures import create_test_character


def _mixed_collision_character():
    char = create_test_character(4)
    col = char.collision
    n = col.num_primitives
    ptype = np.zeros(n, np.int32)
    ell = np.zeros((n, 3), np.float32)
    box = np.zeros((n, 3), np.float32)
    ptype[0] = PRIMITIVE_ELLIPSOID
    ell[0] = [0.5, 1.0, 2.0]
    if n > 1:
        ptype[1] = PRIMITIVE_BOX
        box[1] = [0.25, 0.5, 1.0]
    col = dataclasses.replace(
        col, ptype=jnp.asarray(ptype), ellipsoid_radii=jnp.asarray(ell),
        box_half_extents=jnp.asarray(box))
    return dataclasses.replace(char, collision=col)


def test_support_radius_sphere_limit():
    # an ellipsoid with equal radii supports like a sphere in any direction
    q = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    ell = jnp.asarray([[0.7, 0.7, 0.7]])
    box = jnp.zeros((1, 3))
    for n in ([1.0, 0, 0], [0, 1.0, 0], [0.6, 0.8, 0.0]):
        r = support_radius_along(jnp.asarray([1]), q, ell, box,
                                 jnp.asarray(n, jnp.float32))
        np.testing.assert_allclose(np.asarray(r), [0.7], atol=1e-6)


def test_support_radius_box_corner():
    # axis-aligned box along +y: support radius = half extent in y;
    # along a diagonal it is the projected corner distance
    q = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    box = jnp.asarray([[1.0, 2.0, 3.0]])
    ell = jnp.zeros((1, 3))
    r = support_radius_along(jnp.asarray([2]), q, ell, box,
                             jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(r), [2.0], atol=1e-6)
    d = jnp.asarray([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    r = support_radius_along(jnp.asarray([2]), q, ell, box, d)
    np.testing.assert_allclose(np.asarray(r), [(1 + 2 + 3) / np.sqrt(3)],
                               atol=1e-5)


def test_plane_collision_mixed_primitives():
    char = _mixed_collision_character()
    ef = PlaneCollisionErrorFunction.create(char, plane_normal=(0, 1, 0),
                                            plane_offset=0.0)
    theta = jnp.zeros(char.num_model_parameters)
    ctx = char.context(theta) if hasattr(char, "context") else None
    from momentum_tpu.solver.skeleton_solver_function import (
        SkeletonSolverFunction,
    )
    fn = SkeletonSolverFunction(char, (ef,))
    ctx = fn.context(theta)
    o, d, r, q, ell, box = primitive_states(char.collision, ctx.skel_states)
    f, w = ef.raw(char, ctx)
    overlap = np.asarray(f)[..., 0]
    # ellipsoid primitive 0: center height vs support radius along +y
    ptype = np.asarray(char.collision.primitive_types())
    c0 = float(o[0, 1])
    rs = float(support_radius_along(
        jnp.asarray([1]), q[:1], ell[:1], box[:1],
        jnp.asarray([0.0, 1.0, 0.0]))[0])
    expected0 = max(rs - c0, 0.0)
    np.testing.assert_allclose(overlap[0], expected0, atol=1e-5)
    assert np.all(overlap >= 0)


def test_plane_collision_box_penetration_depth():
    # a unit box centered at height 0.5 above plane y=0: corner support
    # radius along y is 0.5 → exactly touching (overlap 0); raise plane to
    # 0.25 → overlap 0.25
    char = create_test_character(3)
    col = char.collision
    n = col.num_primitives
    ptype = np.full(n, PRIMITIVE_BOX, np.int32)
    box = np.tile(np.asarray([[0.5, 0.5, 0.5]], np.float32), (n, 1))
    col = dataclasses.replace(
        col, ptype=jnp.asarray(ptype),
        ellipsoid_radii=jnp.zeros((n, 3), jnp.float32),
        box_half_extents=jnp.asarray(box))
    char = dataclasses.replace(char, collision=col)
    from momentum_tpu.solver.skeleton_solver_function import (
        SkeletonSolverFunction,
    )
    ef = PlaneCollisionErrorFunction.create(char, plane_normal=(0, 1, 0))
    fn = SkeletonSolverFunction(char, (ef,))
    ctx = fn.context(jnp.zeros(char.num_model_parameters))
    o, *_ = primitive_states(char.collision, ctx.skel_states)
    f, _ = ef.raw(char, ctx)
    heights = np.asarray(o)[:, 1]
    np.testing.assert_allclose(np.asarray(f)[:, 0],
                               np.maximum(0.5 - heights, 0.0), atol=1e-5)


def test_capsule_only_geometry_unchanged():
    # ptype=None keeps the legacy capsule behavior byte-for-byte
    char = create_test_character(3)
    from momentum_tpu.solver.skeleton_solver_function import (
        SkeletonSolverFunction,
    )
    ef = PlaneCollisionErrorFunction.create(char)
    fn = SkeletonSolverFunction(char, (ef,))
    ctx = fn.context(jnp.zeros(char.num_model_parameters))
    f, _ = ef.raw(char, ctx)
    assert np.all(np.isfinite(np.asarray(f)))
    assert char.collision.ptype is None


# ---- support plane / polygon ----


def test_support_plane_default_matches_world_xz():
    plane = SupportPlane.create()
    p = jnp.asarray([3.0, 2.0, -5.0])
    np.testing.assert_allclose(float(plane.signed_distance(p)), 2.0, atol=1e-6)
    uv = np.asarray(plane.coordinates(p))
    np.testing.assert_allclose(uv, [3.0, -5.0], atol=1e-6)
    back = np.asarray(plane.point_from_coordinates(jnp.asarray(uv)))
    np.testing.assert_allclose(back, [3.0, 0.0, -5.0], atol=1e-6)


def test_support_plane_oblique_roundtrip():
    plane = SupportPlane.create(normal=(1.0, 1.0, 0.0), offset=np.sqrt(2.0))
    # origin lies on the plane
    o = np.asarray(plane.origin())
    np.testing.assert_allclose(float(plane.signed_distance(jnp.asarray(o))),
                               0.0, atol=1e-6)
    # projection is idempotent and kills the signed distance
    p = jnp.asarray([5.0, -1.0, 2.0])
    proj = plane.project_point(p)
    np.testing.assert_allclose(float(plane.signed_distance(proj)), 0.0,
                               atol=1e-5)
    uv = plane.coordinates(p)
    np.testing.assert_allclose(np.asarray(plane.point_from_coordinates(uv)),
                               np.asarray(proj), atol=1e-5)


def test_support_plane_collinear_u_hint_fallback():
    plane = SupportPlane.create(normal=(0, 1.0, 0), u_hint=(0, 2.0, 0))
    u = np.asarray(plane.u_axis)
    assert abs(u @ np.asarray([0, 1, 0])) < 1e-6
    np.testing.assert_allclose(np.linalg.norm(u), 1.0, atol=1e-6)


def test_cross2d_orientation():
    assert float(cross2d([0.0, 0.0], [1.0, 0.0], [0.0, 1.0])) > 0
    assert float(cross2d([0.0, 0.0], [0.0, 1.0], [1.0, 0.0])) < 0


def test_convex_hull_square_with_interior():
    pts = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1],
                      [0.5, 0.5], [0.5, 0.0], [0, 0]], np.float32)
    hull = convex_hull_2d(pts)
    assert hull.shape == (4, 2)  # interior, boundary-collinear, dup removed
    # counter-clockwise
    area = 0.0
    for i in range(len(hull)):
        a, b = hull[i], hull[(i + 1) % len(hull)]
        area += a[0] * b[1] - b[0] * a[1]
    assert area > 0


def test_convex_hull_degenerate():
    assert convex_hull_2d(np.zeros((0, 2))).shape == (0, 2)
    assert convex_hull_2d([[1.0, 2.0]]).shape == (1, 2)
    two = convex_hull_2d([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    assert two.shape == (2, 2)  # collinear → endpoints


def test_support_polygon_from_world_points():
    pts = np.asarray([[0, 0.01, 0], [2, 0.0, 0], [2, 0.02, 2], [0, 0, 2],
                      [1, 0.01, 1]], np.float32)
    hull = support_polygon_from_world_points(pts)
    assert hull.shape == (4, 2)
    np.testing.assert_allclose(sorted(hull[:, 0]), [0, 0, 2, 2], atol=1e-5)
