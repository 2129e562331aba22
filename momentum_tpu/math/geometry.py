"""Closest-point geometry primitives (branch-free JAX).

The reference keeps these in momentum/math/utility.cpp
(closestPointsOnSegments) and axel/axel/math/ (point-triangle, edge-edge,
ray-triangle). Here they are vectorized masked math so batched all-pairs
queries run on the VPU — on TPU brute-force batched distances beat the
reference's BVH broadphase at character scale (SURVEY.md §7.10).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "closest_points_on_segments",
    "closest_point_on_segment",
    "point_triangle_closest_point",
]

_EPS = 1e-12


def closest_points_on_segments(o1, d1, o2, d2):
    """Closest points between segments p(s)=o1+s·d1, q(t)=o2+t·d2, s,t∈[0,1].

    Returns (s, t, distance). Ericson RTCD §5.1.9 with jnp.where branches
    (reference: math/utility.cpp closestPointsOnSegments).
    """
    r = o1 - o2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b

    a_deg = a <= _EPS
    e_deg = e <= _EPS

    # general case first guess for s (clamped); parallel (denom≈0) → s = 0
    s = jnp.where(
        denom > _EPS, jnp.clip((b * f - c * e) / jnp.where(denom > _EPS, denom, 1.0), 0.0, 1.0), 0.0
    )
    # t from s
    t = jnp.where(e_deg, 0.0, (b * s + f) / jnp.where(e_deg, 1.0, e))
    t_cl = jnp.clip(t, 0.0, 1.0)
    # recompute s for clamped t
    s = jnp.where(a_deg, 0.0, jnp.clip((b * t_cl - c) / jnp.where(a_deg, 1.0, a), 0.0, 1.0))
    # both degenerate → points
    s = jnp.where(a_deg & e_deg, 0.0, s)
    t_cl = jnp.where(a_deg, jnp.clip(f / jnp.where(e_deg, 1.0, e), 0.0, 1.0), t_cl)
    t_cl = jnp.where(e_deg, 0.0, t_cl)

    p = o1 + s[..., None] * d1
    q = o2 + t_cl[..., None] * d2
    dist = jnp.linalg.norm(p - q + _EPS, axis=-1)
    return s, t_cl, dist


def closest_point_on_segment(origin, direction, point):
    """Clamped parameter of the closest point on origin+t·direction to `point`
    (collision_geometry_state.h:160-171)."""
    d2 = jnp.sum(direction * direction, axis=-1)
    t = jnp.sum((point - origin) * direction, axis=-1) / jnp.maximum(d2, _EPS)
    return jnp.where(d2 <= _EPS, 0.0, jnp.clip(t, 0.0, 1.0))


def point_triangle_closest_point(p, a, b, c):
    """Closest point on triangle (a,b,c) to p. Returns (point, barycentric).

    Branch-free version of Ericson RTCD §5.1.5 (reference:
    axel/axel/math/PointTriangleProjection.h).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # region tests (evaluated densely, selected with where in priority order)
    denom_face = va + vb + vc
    v_face = vb / jnp.where(jnp.abs(denom_face) > _EPS, denom_face, 1.0)
    w_face = vc / jnp.where(jnp.abs(denom_face) > _EPS, denom_face, 1.0)

    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) > _EPS, d1 - d3, 1.0)
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) > _EPS, d2 - d6, 1.0)
    w_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > _EPS, (d4 - d3) + (d5 - d6), 1.0)

    u = 1.0 - v_face - w_face
    bary = jnp.stack([u, v_face, w_face], axis=-1)

    # vertex regions
    bary = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], jnp.stack([jnp.ones_like(u), jnp.zeros_like(u), jnp.zeros_like(u)], axis=-1), bary)
    bary = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], jnp.stack([jnp.zeros_like(u), jnp.ones_like(u), jnp.zeros_like(u)], axis=-1), bary)
    bary = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], jnp.stack([jnp.zeros_like(u), jnp.zeros_like(u), jnp.ones_like(u)], axis=-1), bary)
    # edge regions
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    bary = jnp.where(in_ab[..., None], jnp.stack([1.0 - v_ab, v_ab, jnp.zeros_like(u)], axis=-1), bary)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    bary = jnp.where(in_ac[..., None], jnp.stack([1.0 - w_ac, jnp.zeros_like(u), w_ac], axis=-1), bary)
    in_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    bary = jnp.where(in_bc[..., None], jnp.stack([jnp.zeros_like(u), 1.0 - w_bc, w_bc], axis=-1), bary)
    # re-apply vertex priority (vertex conditions win over edge in Ericson's order)
    bary = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], jnp.stack([jnp.ones_like(u), jnp.zeros_like(u), jnp.zeros_like(u)], axis=-1), bary)
    bary = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], jnp.stack([jnp.zeros_like(u), jnp.ones_like(u), jnp.zeros_like(u)], axis=-1), bary)
    bary = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], jnp.stack([jnp.zeros_like(u), jnp.zeros_like(u), jnp.ones_like(u)], axis=-1), bary)

    point = bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c
    return point, bary
