"""CCD + hole-filling tests (reference: axel/axel/math/test/
ContinuousCollisionDetectionTest.cpp, MeshHoleFillingTest.cpp patterns:
constructed trajectories with known collision times; punctured meshes with
known loop sizes)."""

import jax.numpy as jnp
import numpy as np

from momentum_tpu.axel import (
    ccd_edge_edge,
    ccd_vertex_triangle,
    detect_mesh_holes,
    distance_edge_edge,
    fill_mesh_holes,
    times_coplanar,
)
from momentum_tpu.axel.ccd import solve_cubic


def test_solve_cubic_three_real():
    # (t-1)(t-2)(t-3) = t³ -6t² +11t -6
    roots, valid = solve_cubic(jnp.asarray(1.0), jnp.asarray(-6.0),
                               jnp.asarray(11.0), jnp.asarray(-6.0))
    r = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(r, [1.0, 2.0, 3.0], atol=1e-5)


def test_solve_cubic_single_real():
    # (t-2)(t²+1) = t³ -2t² + t - 2 has one real root
    roots, valid = solve_cubic(jnp.asarray(1.0), jnp.asarray(-2.0),
                               jnp.asarray(1.0), jnp.asarray(-2.0))
    r = np.asarray(roots)[np.asarray(valid)]
    assert np.any(np.abs(r - 2.0) < 1e-5)


def test_solve_cubic_degenerate_quadratic_linear():
    # 0·t³ + t² - 1: roots ±1
    roots, valid = solve_cubic(jnp.asarray(0.0), jnp.asarray(1.0),
                               jnp.asarray(0.0), jnp.asarray(-1.0))
    r = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(r, [-1.0, 1.0], atol=1e-6)
    # linear 2t - 1
    roots, valid = solve_cubic(jnp.asarray(0.0), jnp.asarray(0.0),
                               jnp.asarray(2.0), jnp.asarray(-1.0))
    r = np.asarray(roots)[np.asarray(valid)]
    np.testing.assert_allclose(r, [0.5], atol=1e-6)


def test_times_coplanar_known_crossing():
    # vertex moving down onto a static triangle's plane: coplanar at t=1
    x1 = jnp.asarray([0.0, 0.0, 0.0])
    x2 = jnp.asarray([1.0, 0.0, 0.0])
    x3 = jnp.asarray([0.0, 0.0, 1.0])
    x4 = jnp.asarray([0.2, 1.0, 0.2])
    v = jnp.zeros(3)
    v4 = jnp.asarray([0.0, -1.0, 0.0])
    roots, valid = times_coplanar(x1, x2, x3, x4, v, v, v, v4)
    r = np.asarray(roots)[np.asarray(valid)]
    assert np.any(np.abs(r - 1.0) < 1e-5)


def test_ccd_vertex_triangle_hit_and_miss():
    x1 = jnp.asarray([[0.0, 0.0, 0.0]] * 2)
    x2 = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
    x3 = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    # first vertex passes through the triangle interior; second misses it
    x4 = jnp.asarray([[0.2, 1.0, 0.2], [5.0, 1.0, 5.0]])
    v0 = jnp.zeros((2, 3))
    v4 = jnp.asarray([[0.0, -1.0, 0.0]] * 2)
    hit = ccd_vertex_triangle(x1, x2, x3, x4, v0, v0, v0, v4,
                              distance_threshold=1e-3, dt=2.0)
    assert bool(hit[0]) and not bool(hit[1])
    # not within dt: no hit
    hit = ccd_vertex_triangle(x1, x2, x3, x4, v0, v0, v0, v4,
                              distance_threshold=1e-3, dt=0.5)
    assert not bool(hit[0])


def test_ccd_edge_edge_crossing():
    # edge along x at y=1 moving down over a static edge along z
    x1 = jnp.asarray([-1.0, 1.0, 0.0])
    x2 = jnp.asarray([1.0, 1.0, 0.0])
    x3 = jnp.asarray([0.0, 0.0, -1.0])
    x4 = jnp.asarray([0.0, 0.0, 1.0])
    v = jnp.asarray([0.0, -1.0, 0.0])
    v0 = jnp.zeros(3)
    hit = ccd_edge_edge(x1, x2, x3, x4, v, v, v0, v0,
                        distance_threshold=1e-2, dt=2.0)
    assert bool(hit)
    # parallel edges sliding sideways never cross
    hit = ccd_edge_edge(x1, x2, x1 + jnp.asarray([0.0, 0.0, 2.0]),
                        x2 + jnp.asarray([0.0, 0.0, 2.0]),
                        jnp.asarray([1.0, 0.0, 0.0]),
                        jnp.asarray([1.0, 0.0, 0.0]), v0, v0,
                        distance_threshold=1e-2, dt=2.0)
    assert not bool(hit)


def test_distance_edge_edge_matches_bruteforce():
    rng = np.random.default_rng(12345)
    p1, q1, p2, q2 = (jnp.asarray(rng.normal(0, 1, (64, 3)), jnp.float32)
                      for _ in range(4))
    s, t, dist, nondeg = distance_edge_edge(p1, q1, p2, q2)
    assert bool(jnp.all(nondeg))
    # brute-force sampling lower-bounds the true minimum
    ss = np.linspace(0, 1, 41)
    a = np.asarray(p1)[:, None, :] + ss[None, :, None] * np.asarray(q1 - p1)[:, None, :]
    b = np.asarray(p2)[:, None, :] + ss[None, :, None] * np.asarray(q2 - p2)[:, None, :]
    d = np.linalg.norm(a[:, :, None, :] - b[:, None, :, :], axis=-1)
    brute = d.min((1, 2))
    assert (np.asarray(dist) <= brute + 1e-4).all()
    # 41-sample brute force is only accurate to ~(Δs)² near the minimum
    np.testing.assert_allclose(np.asarray(dist), brute, atol=2e-2)


def _punctured_grid(n=5, drop=(7,)):
    """Flat n×n grid with some faces removed → an outer boundary + holes."""
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], -1).astype(float)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + 1, a + n, a + n + 1])
    faces = np.asarray(faces, np.int64)
    keep = np.ones(len(faces), bool)
    keep[list(drop)] = False
    return verts, faces[keep]


def test_detect_mesh_holes():
    verts, faces = _punctured_grid(5, drop=(10, 11))  # one interior quad hole
    holes = detect_mesh_holes(verts, faces)
    # outer boundary + the quad hole
    sizes = sorted(len(h.vertices) for h in holes)
    assert sizes[0] == 4  # the dropped quad
    assert sizes[-1] == 16  # the grid perimeter


def test_fill_mesh_holes_closes_quad():
    verts, faces = _punctured_grid(5, drop=(10, 11))
    v2, f2, n = fill_mesh_holes(verts, faces, method="centroid",
                                max_hole_size=8)
    assert n == 1  # perimeter exceeds max_hole_size, quad filled
    assert len(v2) == len(verts) + 1  # centroid vertex added
    holes = detect_mesh_holes(v2, f2)
    assert sorted(len(h.vertices) for h in holes) == [16]


def test_fill_mesh_holes_ear_clipping_no_new_vertices():
    verts, faces = _punctured_grid(5, drop=(10, 11))
    v2, f2, n = fill_mesh_holes(verts, faces, method="ear_clipping",
                                max_hole_size=8)
    assert n == 1 and len(v2) == len(verts)
    assert sorted(len(h.vertices) for h in detect_mesh_holes(v2, f2)) == [16]


def test_fill_mesh_holes_spherical_cap_closed_and_smooth():
    verts, faces = _punctured_grid(7, drop=(14, 15, 16, 17))
    v2, f2, n = fill_mesh_holes(verts, faces, method="spherical_cap",
                                max_hole_size=12, smoothing_iterations=2)
    assert n >= 1
    assert len(v2) > len(verts)  # rings + pole added
    sizes = sorted(len(h.vertices) for h in detect_mesh_holes(v2, f2))
    assert sizes == [24]  # only the outer perimeter remains
