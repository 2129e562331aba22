"""Mesh analysis ops: self-intersection test and 2-D support polygon.

Reference: momentum/math/intersection.h (triangle-triangle mesh
self-intersection; adjacent faces sharing a vertex are excluded) and
momentum/math/support_polygon.h (2-D convex hull of ground-contact points,
used for balance constraints). Brute-force batched on TPU: all face pairs
evaluated densely with masks (the reference offers the same brute-force
path, intersection.h:47).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["intersect_mesh_brute_force", "support_polygon"]


def _tri_tri_intersect(p1, q1, r1, p2, q2, r2, eps=1e-9):
    """Batched Möller triangle-triangle intersection predicate.

    Each argument (..., 3). Returns bool (...,). Uses the interval overlap
    method: both triangles must straddle each other's plane and the
    projection intervals on the intersection line must overlap.
    """

    def plane(p, q, r):
        n = jnp.cross(q - p, r - p)
        d = -jnp.sum(n * p, axis=-1)
        return n, d

    def dists(n, d, a, b, c):
        return (jnp.sum(n * a, axis=-1) + d,
                jnp.sum(n * b, axis=-1) + d,
                jnp.sum(n * c, axis=-1) + d)

    n1, d1 = plane(p1, q1, r1)
    da, db, dc = dists(n1, d1, p2, q2, r2)
    same_side_2 = ((da > eps) & (db > eps) & (dc > eps)) | \
                  ((da < -eps) & (db < -eps) & (dc < -eps))
    n2, d2 = plane(p2, q2, r2)
    ea, eb, ec = dists(n2, d2, p1, q1, r1)
    same_side_1 = ((ea > eps) & (eb > eps) & (ec > eps)) | \
                  ((ea < -eps) & (eb < -eps) & (ec < -eps))

    # intersection line direction
    direction = jnp.cross(n1, n2)
    axis = jnp.argmax(jnp.abs(direction), axis=-1)

    def interval(pa, pb, pc, dA, dB, dC, axis):
        # project onto the dominant axis of the line; compute the parameter
        # interval where the triangle crosses the other plane
        proj = jnp.stack([
            jnp.take_along_axis(pa, axis[..., None], axis=-1)[..., 0],
            jnp.take_along_axis(pb, axis[..., None], axis=-1)[..., 0],
            jnp.take_along_axis(pc, axis[..., None], axis=-1)[..., 0],
        ], axis=-1)
        dvals = jnp.stack([dA, dB, dC], axis=-1)
        # for each edge pair crossing the plane, param = pi + (pj-pi)*di/(di-dj)
        params = []
        for i, j in ((0, 1), (1, 2), (2, 0)):
            di, dj = dvals[..., i], dvals[..., j]
            crosses = di * dj < 0
            t = di / jnp.where(jnp.abs(di - dj) > eps, di - dj, 1.0)
            p = proj[..., i] + (proj[..., j] - proj[..., i]) * t
            params.append(jnp.where(crosses, p, jnp.nan))
        ps = jnp.stack(params, axis=-1)
        lo = jnp.nanmin(ps, axis=-1)
        hi = jnp.nanmax(ps, axis=-1)
        return lo, hi

    lo1, hi1 = interval(p1, q1, r1, ea, eb, ec, axis)
    lo2, hi2 = interval(p2, q2, r2, da, db, dc, axis)
    overlap = (hi1 >= lo2) & (hi2 >= lo1)
    overlap = overlap & ~jnp.isnan(lo1) & ~jnp.isnan(lo2)
    return overlap & ~same_side_1 & ~same_side_2


def intersect_mesh_brute_force(vertices, faces, chunk: int = 256):
    """All intersecting face pairs (i < j), excluding pairs sharing a vertex
    (intersectMeshBruteForce, intersection.h:47). Host-facing: returns an
    (N, 2) numpy array."""
    vertices = jnp.asarray(vertices)
    faces_np = np.asarray(faces)
    f = faces_np.shape[0]
    tri = jnp.take(vertices, jnp.asarray(faces_np), axis=0)  # (F, 3, 3)

    pairs = np.asarray([(i, j) for i in range(f) for j in range(i + 1, f)
                        if not set(faces_np[i]) & set(faces_np[j])], np.int32)
    if len(pairs) == 0:
        return np.zeros((0, 2), np.int32)
    a = tri[pairs[:, 0]]
    b = tri[pairs[:, 1]]
    hit = _tri_tri_intersect(a[:, 0], a[:, 1], a[:, 2], b[:, 0], b[:, 1], b[:, 2])
    return pairs[np.asarray(hit)]


def support_polygon(points, up_axis: int = 1, height_tolerance: float = 0.05):
    """2-D convex hull of the lowest contact points (support_polygon.h).

    points (N, 3) → (hull_xy (H, 2) numpy in CCW order). Points within
    `height_tolerance` of the minimum along the up axis participate.
    """
    pts = np.asarray(points)
    h = pts[:, up_axis]
    contact = pts[h <= h.min() + height_tolerance]
    plane_axes = [i for i in range(3) if i != up_axis]
    xy = contact[:, plane_axes]
    if len(xy) < 3:
        return xy
    # Andrew's monotone chain
    order = np.lexsort((xy[:, 1], xy[:, 0]))
    xy = xy[order]

    def half(points_iter):
        out = []
        for p in points_iter:
            while len(out) >= 2 and ((out[-1] - out[-2])[0] * (p - out[-2])[1]
                                     - (out[-1] - out[-2])[1] * (p - out[-2])[0]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(xy)
    upper = half(xy[::-1])
    return np.asarray(lower[:-1] + upper[:-1])
