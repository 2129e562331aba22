"""Spatial queries — the TPU equivalent of the axel acceleration library
(axel/axel/: TriBvh closest-point/raycast, SimdKdTree KNN).

On TPU, brute-force batched evaluation beats tree traversal for the mesh
sizes momentum works with (<100k triangles — SURVEY.md §7.10): a (Q, F)
distance matrix is pure fused VPU/MXU work with no divergent control flow,
while a BVH walk is serial gathers. All functions are jittable and
differentiable.

Cites: axel/axel/TriBvh.h:24-104 (closestSurfacePoint, rayHit),
axel/axel/SimdKdTree.h (KNN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from momentum_tpu.math.geometry import point_triangle_closest_point

__all__ = ["closest_point_on_mesh", "ray_mesh_intersect", "knn"]


def closest_point_on_mesh(points, vertices, faces, chunk: int = 1024):
    """For each query point: (closest surface point, face index, barycentric,
    squared distance). Brute force over all faces (TriBvh.closestSurfacePoint
    equivalent).

    points (Q, 3); vertices (V, 3); faces (F, 3) int.
    """
    a = jnp.take(vertices, faces[:, 0], axis=0)
    b = jnp.take(vertices, faces[:, 1], axis=0)
    c = jnp.take(vertices, faces[:, 2], axis=0)

    def one(p):
        cp, bary = point_triangle_closest_point(p[None], a, b, c)
        d2 = jnp.sum((cp - p) ** 2, axis=-1)
        i = jnp.argmin(d2)
        return cp[i], i, bary[i], d2[i]

    return jax.lax.map(one, points, batch_size=chunk)


def ray_mesh_intersect(origins, directions, vertices, faces, max_t=jnp.inf):
    """Möller-Trumbore ray/triangle over all faces; returns (t, face index,
    hit mask) per ray (TriBvh.rayHit equivalent)."""
    a = jnp.take(vertices, faces[:, 0], axis=0)
    b = jnp.take(vertices, faces[:, 1], axis=0)
    c = jnp.take(vertices, faces[:, 2], axis=0)
    e1 = b - a
    e2 = c - a

    def one(o, d):
        pvec = jnp.cross(d[None], e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = o[None] - a
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d[None] * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        hit = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
            & (t > 1e-8) & (t < max_t)
        t = jnp.where(hit, t, jnp.inf)
        i = jnp.argmin(t)
        return t[i], i, jnp.isfinite(t[i])

    return jax.vmap(one)(origins, directions)


def knn(points, queries, k: int):
    """k nearest neighbors by brute force + top_k (SimdKdTree equivalent).
    Returns (indices (Q, k), squared distances (Q, k))."""
    d2 = jnp.sum((queries[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx, -neg
