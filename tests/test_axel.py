"""axel-equivalent spatial library tests (reference: axel/axel/test/ — BVH vs
brute force, SDF sampling, KNN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.axel import (
    SignedDistanceField,
    closest_point_on_mesh,
    knn,
    mesh_to_sdf,
    ray_mesh_intersect,
)
from momentum_tpu.errors.sdf import SdfCollisionErrorFunction, VertexSdfErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction
from momentum_tpu.testing.fixtures import create_test_character


def _rng():
    return np.random.default_rng(12345)


def _unit_cube():
    v = np.asarray([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ], np.float32)
    f = np.asarray([
        [0, 2, 1], [0, 3, 2],  # bottom (z=0), outward -z
        [4, 5, 6], [4, 6, 7],  # top
        [0, 1, 5], [0, 5, 4],  # y=0
        [2, 3, 7], [2, 7, 6],  # y=1
        [1, 2, 6], [1, 6, 5],  # x=1
        [3, 0, 4], [3, 4, 7],  # x=0
    ], np.int32)
    return jnp.asarray(v), jnp.asarray(f)


class TestQueries:
    def test_closest_point_matches_brute(self):
        rng = _rng()
        v, f = _unit_cube()
        q = jnp.asarray(rng.uniform(-0.5, 1.5, (20, 3)), jnp.float32)
        cp, fi, bary, d2 = closest_point_on_mesh(q, v, f)
        # distance from an outside point to the cube surface is known
        for i in range(20):
            p = np.asarray(q[i])
            clamped = np.clip(p, 0.0, 1.0)
            if np.any(p != clamped):  # outside: distance to the box
                expected = np.linalg.norm(p - clamped)
                np.testing.assert_allclose(np.sqrt(float(d2[i])), expected, atol=1e-4)

    def test_ray_intersect(self):
        v, f = _unit_cube()
        o = jnp.asarray([[0.5, 0.5, -1.0], [0.5, 0.5, 2.0], [2.0, 2.0, -1.0]], jnp.float32)
        d = jnp.asarray([[0, 0, 1.0], [0, 0, -1.0], [0, 0, 1.0]], jnp.float32)
        t, fi, hit = ray_mesh_intersect(o, d, v, f)
        assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-5
        assert bool(hit[1]) and abs(float(t[1]) - 1.0) < 1e-5
        assert not bool(hit[2])

    def test_knn(self):
        rng = _rng()
        pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        idx, d2 = knn(pts, q, 4)
        brute = np.sum((np.asarray(q)[:, None] - np.asarray(pts)[None]) ** 2, axis=-1)
        for i in range(5):
            np.testing.assert_array_equal(
                np.sort(np.asarray(idx[i])), np.sort(np.argsort(brute[i])[:4]))


class TestSdf:
    def test_mesh_to_sdf_signs_and_values(self):
        v, f = _unit_cube()
        sdf = mesh_to_sdf(v, f, resolution=(24, 24, 24), padding=0.3)
        inside = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
        # outside points must stay inside the padded grid (border-clamped)
        outside = jnp.asarray([[1.2, 0.5, 0.5], [0.5, 0.5, -0.25]], jnp.float32)
        di = float(sdf.sample(inside)[0])
        do = np.asarray(sdf.sample(outside))
        assert di < 0 and abs(di + 0.5) < 0.08
        assert do[0] > 0 and abs(do[0] - 0.2) < 0.08
        assert do[1] > 0 and abs(do[1] - 0.25) < 0.08

    def test_gradient_points_outward(self):
        v, f = _unit_cube()
        sdf = mesh_to_sdf(v, f, resolution=(24, 24, 24), padding=0.3)
        g = np.asarray(sdf.gradient(jnp.asarray([[1.3, 0.5, 0.5]], jnp.float32)))[0]
        assert g[0] > 0.5  # increasing distance along +x


class TestSdfErrors:
    def test_vertex_sdf_gradient(self):
        char = create_test_character(4)
        v, f = _unit_cube()
        sdf = mesh_to_sdf(v, f, resolution=(16, 16, 16), padding=0.5)
        rng = _rng()
        idx = rng.integers(0, char.mesh.num_vertices, 5)
        ef = VertexSdfErrorFunction.create(sdf, idx, weight=2.0)
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.asarray(rng.uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
        g = np.asarray(fn.gradient(x))
        eps = 1e-2  # grid interpolation is piecewise-trilinear; coarse FD
        xs = np.asarray(x, np.float64)
        for i in rng.choice(char.num_model_parameters, 3, replace=False):
            xp, xm = xs.copy(), xs.copy()
            xp[i] += eps
            xm[i] -= eps
            fd = (float(fn.error(jnp.asarray(xp, jnp.float32)))
                  - float(fn.error(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
            assert abs(g[i] - fd) < 0.1 * max(0.05, abs(fd))

    def test_sdf_collision_zero_outside(self):
        char = create_test_character(4)
        v, f = _unit_cube()
        # cube far away from the character -> all distances positive -> no penalty
        v = v + jnp.asarray([50.0, 0.0, 0.0])
        sdf = mesh_to_sdf(v, f, resolution=(16, 16, 16), padding=0.5)
        ef = SdfCollisionErrorFunction.create(sdf, np.arange(char.mesh.num_vertices))
        fn = SkeletonSolverFunction(char, (ef,))
        x = jnp.zeros(char.num_model_parameters)
        assert float(fn.error(x)) >= 0.0
        # far outside the grid the clamped sample is the (positive) border value
        assert float(fn.error(x)) == 0.0


class TestSurfaceExtraction:
    def test_sdf_to_mesh_cube(self):
        from momentum_tpu.axel.sdf import sdf_to_mesh
        v, f = _unit_cube()
        sdf = mesh_to_sdf(v, f, resolution=(20, 20, 20), padding=0.3)
        verts, faces = sdf_to_mesh(sdf)
        assert verts.shape[0] > 50 and faces.shape[0] > 100
        vn = np.asarray(verts)
        assert vn.min() > -0.15 and vn.max() < 1.15
        # extracted surface points are near the cube surface (|sdf| small)
        d = np.abs(np.asarray(sdf.sample(verts)))
        assert np.median(d) < 0.05


def test_triangle_grid_matches_brute_force():
    """Uniform-grid accelerator (TriBvh equivalent) vs brute force —
    the reference's BVH-vs-brute-force test pattern."""
    import numpy as np
    from momentum_tpu.axel import (
        build_triangle_grid, closest_point_on_mesh, closest_point_on_mesh_grid,
    )
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(6)
    v, f = char.mesh.vertices, char.mesh.faces
    grid = build_triangle_grid(v, f, resolution=8)
    rng = np.random.default_rng(3)
    near = np.asarray(v)[rng.integers(0, v.shape[0], 40)] \
        + rng.normal(0, 0.05, (40, 3)).astype(np.float32)
    far = rng.uniform(-20, 20, (8, 3)).astype(np.float32)
    q = jnp.asarray(np.concatenate([near, far]))
    gp, gf, gd = closest_point_on_mesh_grid(grid, q, v, f)
    bp, bf, _, bd = closest_point_on_mesh(q, v, f)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(bd), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(bp), atol=1e-3)
    # fast mode still exact for certified (near-surface) queries
    gp2, _, gd2 = closest_point_on_mesh_grid(grid, jnp.asarray(near), v, f,
                                             exact=False)
    cert = np.asarray(gd2) <= float(grid.cell_size) ** 2
    np.testing.assert_allclose(np.asarray(gd2)[cert],
                               np.asarray(bd)[:40][cert], atol=1e-4)


def test_grid_raycast_matches_brute_force():
    """Grid DDA ray casting vs brute-force Möller-Trumbore on rays aimed at
    triangle-interior points (vertex-exact rays are degenerate in f32 and
    flip arbitrarily in BOTH implementations)."""
    import numpy as np
    from momentum_tpu.axel import (
        build_triangle_grid, ray_mesh_intersect, ray_mesh_intersect_grid,
    )
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(6)
    v, f = char.mesh.vertices, char.mesh.faces
    grid = build_triangle_grid(v, f, resolution=8)
    rng = np.random.default_rng(0)
    n = 60
    fv = np.asarray(v)[np.asarray(f)]
    fi = rng.integers(0, fv.shape[0], n)
    bary = rng.dirichlet([2.0, 2.0, 2.0], n)
    targets = np.einsum("nc,ncd->nd", bary, fv[fi]).astype(np.float32)
    origins = jnp.asarray(
        rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        + np.asarray([0, 2.5, 4.0], np.float32))
    dirs = jnp.asarray(targets) - origins
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # plus some guaranteed misses (pointing away)
    origins = jnp.concatenate([origins, origins[:8]])
    dirs = jnp.concatenate([dirs, -dirs[:8]])
    tg, fg, hg = ray_mesh_intersect_grid(grid, origins, dirs, v, f)
    tb, fb, hb = ray_mesh_intersect(origins, dirs, v, f)
    np.testing.assert_array_equal(np.asarray(hg), np.asarray(hb))
    both = np.asarray(hg) & np.asarray(hb)
    np.testing.assert_allclose(np.asarray(tg)[both], np.asarray(tb)[both],
                               atol=1e-4)


class TestSdfSignMethods:
    def test_winding_number_inside_outside(self):
        v, f = _unit_cube()
        pts = jnp.asarray([[0.5, 0.5, 0.5], [0.2, 0.8, 0.3],
                           [1.5, 0.5, 0.5], [-0.2, 0.0, 0.0]], jnp.float32)
        from momentum_tpu.axel import winding_number
        w = np.asarray(winding_number(pts, v, f))
        np.testing.assert_allclose(w[:2], 1.0, atol=1e-3)
        np.testing.assert_allclose(w[2:], 0.0, atol=1e-3)

    def test_winding_sign_matches_normal_sign_on_closed_mesh(self):
        v, f = _unit_cube()
        s_n = mesh_to_sdf(v, f, resolution=(16, 16, 16), padding=0.3)
        s_w = mesh_to_sdf(v, f, resolution=(16, 16, 16), padding=0.3,
                          sign_method="winding")
        a = np.asarray(s_n.values)
        b = np.asarray(s_w.values)
        # identical distances, identical signs away from the surface
        np.testing.assert_allclose(np.abs(a), np.abs(b), atol=1e-6)
        far = np.abs(a) > 0.05
        np.testing.assert_array_equal(np.sign(a[far]), np.sign(b[far]))

    def test_morphological_cleanup_removes_speckle(self):
        from momentum_tpu.axel import morphological_cleanup
        inside = np.zeros((9, 9, 9), bool)
        inside[2:7, 2:7, 2:7] = True     # solid block
        inside[8, 8, 8] = True           # speckle noise
        inside[4, 4, 4] = inside[4, 4, 4]  # keep solid
        pin = inside.copy()
        pin[4, 4, 8] = False
        cleaned = np.asarray(morphological_cleanup(
            jnp.asarray(inside), open_iters=1))
        assert not cleaned[8, 8, 8]          # speckle gone
        assert cleaned[4, 4, 4]              # body survives
        # close fills an interior pinhole
        hole = inside.copy()
        hole[4, 4, 4] = False
        closed = np.asarray(morphological_cleanup(
            jnp.asarray(hole), close_iters=1))
        assert closed[4, 4, 4]
