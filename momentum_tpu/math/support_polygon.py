"""Oriented support plane + 2-D support polygon.

Reference: momentum/math/support_polygon.{h,cpp} — SupportPlaneT (oriented
plane with in-plane (u, v) projection basis, default Y-up preserving world-XZ
coordinates, support_polygon.h:26-63), cross2d, computeConvexHull2d (Andrew
monotone chain with duplicate/collinear removal, support_polygon.cpp), and
computeSupportPolygonFromWorldPoints.

The plane math (signed distance, projection, coordinates) is jnp and
jittable/batchable; the convex hull is a host-side analysis utility (its
output size is data-dependent, which has no place inside a trace — callers
that need a fixed-size in-graph hull should use
momentum_tpu.math.mesh_ops.support_polygon's padded form).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SupportPlane",
    "cross2d",
    "convex_hull_2d",
    "support_polygon_from_world_points",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SupportPlane:
    """Oriented plane n·x = offset with in-plane basis (u_axis, v_axis).

    The default (Y-up, u=+X, v=+Z) intentionally matches the reference's
    left-handed world-XZ support coordinates (support_polygon.h:19-24).
    """

    normal: jnp.ndarray  # (3,) unit
    offset: jnp.ndarray  # ()
    u_axis: jnp.ndarray  # (3,) unit, in-plane
    v_axis: jnp.ndarray  # (3,) unit, in-plane

    @classmethod
    def create(cls, normal=(0.0, 1.0, 0.0), offset=0.0, u_hint=(1.0, 0.0, 0.0)):
        n = np.asarray(normal, np.float64)
        nn = np.linalg.norm(n)
        if nn < 1e-12:
            raise ValueError("support plane normal must be non-zero")
        off = float(offset) / nn
        n = n / nn
        u = np.asarray(u_hint, np.float64)
        u = u - n * (n @ u)  # reject onto the plane
        if np.linalg.norm(u) < 1e-8:
            # u_hint collinear with normal: stable perpendicular fallback
            # (support_polygon.cpp fallbackSupportPlaneAxis)
            k = int(np.argmin(np.abs(n)))
            e = np.zeros(3)
            e[k] = 1.0
            u = e - n * (n @ e)
        u = u / np.linalg.norm(u)
        # v chosen so the DEFAULT basis reproduces (+X, +Z) under Y-up:
        # v = u × n (left-handed for the default, as documented upstream)
        v = np.cross(u, n)
        v = v / np.linalg.norm(v)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return cls(normal=f32(n), offset=f32(off), u_axis=f32(u), v_axis=f32(v))

    def origin(self) -> jnp.ndarray:
        return self.normal * self.offset

    def signed_distance(self, point: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...i,i->...", point, self.normal) - self.offset

    def project_point(self, point: jnp.ndarray) -> jnp.ndarray:
        return point - self.signed_distance(point)[..., None] * self.normal

    def coordinates(self, point: jnp.ndarray) -> jnp.ndarray:
        p = self.project_point(point) - self.origin()
        return jnp.stack(
            [jnp.einsum("...i,i->...", p, self.u_axis),
             jnp.einsum("...i,i->...", p, self.v_axis)], axis=-1)

    def point_from_coordinates(self, uv: jnp.ndarray) -> jnp.ndarray:
        return (self.origin() + uv[..., :1] * self.u_axis
                + uv[..., 1:2] * self.v_axis)


def cross2d(origin, a, b):
    """Signed 2-D cross product of (a−origin) × (b−origin); positive when
    origin→a→b turns counter-clockwise (support_polygon.h cross2d)."""
    o = jnp.asarray(origin)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def convex_hull_2d(points) -> np.ndarray:
    """Convex hull of 2-D points, counter-clockwise, duplicates and collinear
    boundary points removed (computeConvexHull2d). Host-side; degenerate
    inputs return 0/1/2 points."""
    pts = np.asarray(points, np.float64).reshape(-1, 2)
    pts = pts[np.all(np.isfinite(pts), axis=1)]
    if len(pts) == 0:
        return np.zeros((0, 2), np.float32)
    pts = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    if len(pts) <= 2:
        return pts.astype(np.float32)

    def cross(a, b):
        # np.cross on 2-D vectors is deprecated in numpy 2.x
        return a[0] * b[1] - a[1] * b[0]

    def half(seq):
        hull = []
        for p in seq:
            while len(hull) >= 2 and cross(
                    hull[-1] - hull[-2], p - hull[-2]) <= 1e-12:
                hull.pop()
            hull.append(p)
        return hull

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1], np.float64)
    if len(hull) < 3:  # all collinear
        return np.stack([pts[0], pts[-1]]).astype(np.float32)
    return hull.astype(np.float32)


def support_polygon_from_world_points(points, plane: SupportPlane | None = None):
    """Project world points onto the support plane and hull them
    (computeSupportPolygonFromWorldPoints). Returns (H, 2) float32 in
    support-plane coordinates, counter-clockwise."""
    if plane is None:
        plane = SupportPlane.create()
    uv = np.asarray(plane.coordinates(jnp.asarray(points, jnp.float32)))
    return convex_hull_2d(uv)
