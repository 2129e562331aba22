"""pymomentum.axel surface added in round 2's sweep: SDF member methods,
dual contouring (quads) + triangulate_quads, msgpack SDF IO, standalone
Laplacian smoothing (axel_pybind.cpp; SignedDistanceFieldIO.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

import momentum_tpu.axel as ax


@pytest.fixture(scope="module")
def sphere_sdf():
    n = 24
    xs = np.linspace(-1.2, 1.2, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    vals = np.linalg.norm(g, axis=-1) - 1.0
    return ax.SignedDistanceField(
        origin=jnp.asarray([-1.2] * 3, jnp.float32),
        spacing=jnp.asarray([2.4 / (n - 1)] * 3, jnp.float32),
        values=jnp.asarray(vals, jnp.float32))


class TestSdfMembers:
    def test_sample_with_gradient(self, sphere_sdf):
        v, g = sphere_sdf.sample_with_gradient(
            jnp.asarray([[0.5, 0.0, 0.0]]))
        assert abs(float(v[0]) + 0.5) < 0.02
        gn = np.asarray(g[0])
        np.testing.assert_allclose(gn / np.linalg.norm(gn), [1, 0, 0],
                                   atol=0.05)

    def test_grid_world_round_trip(self, sphere_sdf):
        p = jnp.asarray([[0.3, -0.7, 0.1]])
        back = sphere_sdf.grid_to_world(sphere_sdf.world_to_grid(p))
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-6)

    def test_bounds_and_contains(self, sphere_sdf):
        lo, hi = sphere_sdf.bounds
        np.testing.assert_allclose(np.asarray(lo), -1.2, atol=1e-6)
        assert bool(sphere_sdf.contains(jnp.zeros(3)))
        assert not bool(sphere_sdf.contains(jnp.asarray([9.0, 0.0, 0.0])))
        assert sphere_sdf.is_valid_index(0, 0, 0)
        assert not sphere_sdf.is_valid_index(0, 0, 99)
        assert sphere_sdf.total_voxels == 24 ** 3
        np.testing.assert_allclose(np.asarray(sphere_sdf.voxel_size),
                                   2.4 / 23, atol=1e-6)


class TestDualContouring:
    def test_sphere_quads(self, sphere_sdf):
        verts, quads = ax.dual_contouring(sphere_sdf)
        assert quads.shape[1] == 4 and len(verts) > 50
        r = np.linalg.norm(verts, axis=1)
        assert abs(r.mean() - 1.0) < 0.01
        # the Newton surface projection (DualContouring.cpp
        # pushVertexToSurface semantics) lands every vertex on the level
        # set — far tighter than surface-nets mean-of-crossings placement
        assert r.std() < 0.005
        assert np.abs(r - 1.0).max() < 0.01

    def test_triangulate_quads(self):
        tris = ax.triangulate_quads([[0, 1, 2, 3], [4, 5, 6, 7]])
        assert tris.shape == (4, 3)
        assert tris[0].tolist() == [0, 1, 2] and tris[2].tolist() == [0, 2, 3]

    def test_closed_surface(self, sphere_sdf):
        # every quad edge must be shared by exactly two quads (watertight)
        _, quads = ax.dual_contouring(sphere_sdf)
        from collections import Counter

        edges = Counter()
        for q in quads:
            for i in range(4):
                a, b = int(q[i]), int(q[(i + 1) % 4])
                edges[(min(a, b), max(a, b))] += 1
        counts = set(edges.values())
        assert counts == {2}, counts


class TestMsgpackIo:
    def test_single_round_trip(self, sphere_sdf, tmp_path):
        p = tmp_path / "s.msgpack"
        ax.save_sdf_to_msgpack(sphere_sdf, p)
        sdf2 = ax.load_sdf_from_msgpack(p)
        np.testing.assert_allclose(np.asarray(sdf2.values),
                                   np.asarray(sphere_sdf.values), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sdf2.origin),
                                   np.asarray(sphere_sdf.origin), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sdf2.spacing),
                                   np.asarray(sphere_sdf.spacing), atol=1e-5)

    def test_multi_with_parent_joints(self, sphere_sdf, tmp_path):
        p = tmp_path / "ss.msgpack"
        ax.save_sdfs_to_msgpack(
            {"body": (sphere_sdf, "b_spine0"), "hand": sphere_sdf}, p)
        d = ax.load_sdfs_from_msgpack(p)
        assert set(d) == {"body", "hand"}
        assert d["body"][1] == "b_spine0" and d["hand"][1] == ""
        np.testing.assert_allclose(np.asarray(d["hand"][0].values),
                                   np.asarray(sphere_sdf.values), atol=1e-6)

    def test_layout_is_x_fastest(self, tmp_path):
        # pin the reference's linear = k·nx·ny + j·nx + i layout
        vals = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        sdf = ax.SignedDistanceField(
            origin=jnp.zeros(3), spacing=jnp.ones(3),
            values=jnp.asarray(vals))
        p = tmp_path / "l.msgpack"
        ax.save_sdf_to_msgpack(sdf, p)
        from momentum_tpu.axel.sdf_io import _unpack

        obj, _ = _unpack(p.read_bytes())
        data = np.frombuffer(obj["data"], "<f4")
        # first run over the x axis (i fastest): values[0..1, 0, 0]
        np.testing.assert_allclose(data[:2], vals[:2, 0, 0])
        sdf2 = ax.load_sdf_from_msgpack(p)
        np.testing.assert_allclose(np.asarray(sdf2.values), vals)


class TestSmoothing:
    def test_spike_flattens_and_pins(self):
        verts = np.zeros((5, 3))
        verts[:4, :2] = [[0, 0], [1, 0], [1, 1], [0, 1]]
        verts[4] = [0.5, 0.5, 1.0]
        tris = np.asarray([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]])
        out = ax.smooth_mesh_laplacian(verts, tris, vertex_mask=[4],
                                       iterations=5)
        assert out[4, 2] < 0.2
        np.testing.assert_allclose(out[:4], verts[:4])

    def test_fill_holes_alias(self):
        assert ax.fill_holes is ax.fill_mesh_holes
