"""Continuous collision detection (batched, branch-free JAX).

Reference: axel/axel/math/ContinuousCollisionDetection.cpp — edge-edge and
vertex-triangle CCD by (1) solving for the times in [0, dt] at which the four
moving points become coplanar (a cubic in t, CoplanarityCheck.cpp
timesCoplanar), then (2) checking proximity at each candidate time
(EdgeEdgeDistance.cpp / PointTriangleProjection.cpp).

TPU-first shape: the reference iterates pairs on the CPU with scalar cubic
solves and early-outs; here every step is an elementwise batched op over a
leading pair axis — all candidate roots are evaluated unconditionally and
reduced with a masked `any`, so N pairs run as one VPU-wide program with no
data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from momentum_tpu.math.geometry import (
    closest_points_on_segments,
    point_triangle_closest_point,
)

__all__ = [
    "solve_cubic",
    "times_coplanar",
    "ccd_edge_edge",
    "ccd_vertex_triangle",
    "distance_edge_edge",
]

_EPS = 1e-12


def solve_cubic(c3, c2, c1, c0):
    """Real roots of c3·t³ + c2·t² + c1·t + c0 = 0, batched.

    Returns (roots (..., 3), valid (..., 3) bool). Degenerate leading
    coefficients fall through to the quadratic/linear solve branch-free
    (the reference's solveP3/solveP2 cascade, CoplanarityCheck.cpp:11-73).
    Invalid slots carry 0.0 with valid=False.
    """
    c3_deg = jnp.abs(c3) <= 1e-30
    c2_deg = jnp.abs(c2) <= 1e-30
    c1_deg = jnp.abs(c1) <= 1e-30

    # --- cubic branch (normalized: t³ + a t² + b t + c) ---
    safe3 = jnp.where(c3_deg, 1.0, c3)
    a = c2 / safe3
    b = c1 / safe3
    c = c0 / safe3
    a2 = a * a
    q = (a2 - 3.0 * b) / 9.0
    r = (a * (2.0 * a2 - 9.0 * b) + 27.0 * c) / 54.0
    r2 = r * r
    q3 = q * q * q
    three_real = r2 < q3
    # trig case: three real roots
    tt = jnp.arccos(jnp.clip(r / jnp.sqrt(jnp.where(three_real, q3, 1.0)),
                             -1.0, 1.0))
    qs = -2.0 * jnp.sqrt(jnp.maximum(q, 0.0))
    a3 = a / 3.0
    r0 = qs * jnp.cos(tt / 3.0) - a3
    r1 = qs * jnp.cos((tt + 2.0 * jnp.pi) / 3.0) - a3
    r2_ = qs * jnp.cos((tt - 2.0 * jnp.pi) / 3.0) - a3
    # Cardano case: one real root
    arg = jnp.maximum(r2 - q3, 0.0)
    aa = -jnp.sign(r) * jnp.cbrt(jnp.abs(r) + jnp.sqrt(arg))
    bb = jnp.where(jnp.abs(aa) > _EPS, q / jnp.where(jnp.abs(aa) > _EPS, aa, 1.0), 0.0)
    single = (aa + bb) - a3
    cub_roots = jnp.stack([
        jnp.where(three_real, r0, single),
        jnp.where(three_real, r1, single),
        jnp.where(three_real, r2_, single),
    ], axis=-1)
    cub_valid = jnp.stack([
        jnp.ones_like(three_real),
        three_real,
        three_real,
    ], axis=-1)

    # --- quadratic branch: c2 t² + c1 t + c0 ---
    safe2 = jnp.where(c2_deg, 1.0, c2)
    disc = c1 * c1 - 4.0 * c2 * c0
    has = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q0 = (-c1 + sq) / (2.0 * safe2)
    q1 = (-c1 - sq) / (2.0 * safe2)
    quad_roots = jnp.stack([q0, q1, jnp.zeros_like(q0)], axis=-1)
    quad_valid = jnp.stack([has, has & (disc > 1e-9),
                            jnp.zeros_like(has)], axis=-1)

    # --- linear branch: c1 t + c0 ---
    lin_root = -c0 / jnp.where(c1_deg, 1.0, c1)
    lin_roots = jnp.stack([lin_root] + [jnp.zeros_like(lin_root)] * 2, axis=-1)
    lin_valid = jnp.stack([~c1_deg] + [jnp.zeros_like(c1_deg)] * 2, axis=-1)

    roots = jnp.where(c3_deg[..., None],
                      jnp.where(c2_deg[..., None], lin_roots, quad_roots),
                      cub_roots)
    valid = jnp.where(c3_deg[..., None],
                      jnp.where(c2_deg[..., None], lin_valid, quad_valid),
                      cub_valid)
    return roots, valid


def times_coplanar(x1, x2, x3, x4, v1, v2, v3, v4):
    """Times at which the four moving points are coplanar: roots of
    (x21 + t·v21)×(x31 + t·v31)·(x41 + t·v41) = 0
    (CoplanarityCheck.cpp timesCoplanar). Returns (roots (..., 3), valid)."""
    x21, x31, x41 = x2 - x1, x3 - x1, x4 - x1
    v21, v31, v41 = v2 - v1, v3 - v1, v4 - v1

    def det(u, v, w):
        return jnp.sum(jnp.cross(u, v) * w, axis=-1)

    c3 = det(v21, v31, v41)
    c2 = det(x21, v31, v41) + det(v21, x31, v41) + det(v21, v31, x41)
    c1 = det(x21, x31, v41) + det(x21, v31, x41) + det(v21, x31, x41)
    c0 = det(x21, x31, x41)
    return solve_cubic(c3, c2, c1, c0)


def distance_edge_edge(p1, q1, p2, q2):
    """Closest-point distance between segments [p1,q1] and [p2,q2]
    (EdgeEdgeDistance.cpp distanceEdgeEdge). Returns (s, t, distance,
    nondegenerate): nondegenerate is False when both segments collapse to
    points (the reference's `return false` case)."""
    s, t, dist = closest_points_on_segments(p1, q1 - p1, p2, q2 - p2)
    a = jnp.sum((q1 - p1) ** 2, axis=-1)
    e = jnp.sum((q2 - p2) ** 2, axis=-1)
    nondeg = ~((a <= 1e-5) & (e <= 1e-5))
    return s, t, dist, nondeg


def _candidate_times(x1, x2, x3, x4, v1, v2, v3, v4, dt):
    roots, valid = times_coplanar(x1, x2, x3, x4, v1, v2, v3, v4)
    # include dt itself against numerical imprecision
    # (ContinuousCollisionDetection.cpp:30-31)
    dt_col = jnp.broadcast_to(jnp.asarray(dt, roots.dtype), roots.shape[:-1])
    times = jnp.concatenate([roots, dt_col[..., None]], axis=-1)
    ok = jnp.concatenate([valid, jnp.ones_like(dt_col[..., None], bool)],
                         axis=-1)
    ok = ok & (times > 0.0) & (times <= dt)
    return times, ok


def ccd_edge_edge(x1, x2, x3, x4, v1, v2, v3, v4, distance_threshold, dt):
    """True where moving edges (x1,x2)+t·(v1,v2) and (x3,x4)+t·(v3,v4) pass
    within `distance_threshold` during (0, dt]
    (ContinuousCollisionDetection.cpp ccdEdgeEdge). Fully batched: points
    are (..., 3); the result is (...,) bool."""
    times, ok = _candidate_times(x1, x2, x3, x4, v1, v2, v3, v4, dt)
    tt = times[..., None]  # (..., 4, 1)
    a1 = x1[..., None, :] + tt * v1[..., None, :]
    a2 = x2[..., None, :] + tt * v2[..., None, :]
    b1 = x3[..., None, :] + tt * v3[..., None, :]
    b2 = x4[..., None, :] + tt * v4[..., None, :]
    _, _, dist, nondeg = distance_edge_edge(a1, a2, b1, b2)
    hit = ok & nondeg & (dist < distance_threshold)
    return jnp.any(hit, axis=-1)


def ccd_vertex_triangle(x1, x2, x3, x4, v1, v2, v3, v4,
                        distance_threshold, dt):
    """True where moving vertex x4+t·v4 passes within `distance_threshold`
    of moving triangle (x1,x2,x3) during (0, dt], with the closest point
    required to lie INSIDE the triangle (the reference checks
    projectOnTriangle's inside flag, ContinuousCollisionDetection.cpp:80-88)."""
    times, ok = _candidate_times(x1, x2, x3, x4, v1, v2, v3, v4, dt)
    tt = times[..., None]
    a = x1[..., None, :] + tt * v1[..., None, :]
    b = x2[..., None, :] + tt * v2[..., None, :]
    c = x3[..., None, :] + tt * v3[..., None, :]
    p = x4[..., None, :] + tt * v4[..., None, :]
    q, bary = point_triangle_closest_point(p, a, b, c)
    inside = jnp.all(bary > 0.0, axis=-1) & jnp.all(bary < 1.0, axis=-1)
    dist_sq = jnp.sum((p - q) ** 2, axis=-1)
    hit = ok & inside & (dist_sq < distance_threshold * distance_threshold)
    return jnp.any(hit, axis=-1)
