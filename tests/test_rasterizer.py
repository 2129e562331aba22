"""Rasterizer tests (reference: momentum/test/rasterizer/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.camera import Camera, PinholeIntrinsics
from momentum_tpu.math import skel_state as ss
from momentum_tpu.rasterizer import rasterize, render_mesh


def test_single_triangle_coverage_and_depth():
    verts = jnp.asarray([
        [10.0, 10.0, 2.0],
        [50.0, 10.0, 2.0],
        [10.0, 50.0, 4.0],
    ])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    buf = rasterize(verts, faces, 64, 64)
    face = np.asarray(buf["face"])
    depth = np.asarray(buf["depth"])
    assert face[12, 12] == 0  # inside
    assert face[12, 45] == 0  # near the x edge
    assert face[60, 60] == -1  # outside
    # depth interpolates between 2 (bottom) and 4 (top)
    assert 2.0 <= depth[12, 12] <= 4.0
    assert depth[11, 11] < depth[48, 11]
    bary = np.asarray(buf["bary"])[12, 12]
    np.testing.assert_allclose(bary.sum(), 1.0, atol=1e-5)


def test_occlusion_nearer_triangle_wins():
    verts = jnp.asarray([
        [0.0, 0.0, 5.0], [64.0, 0.0, 5.0], [0.0, 64.0, 5.0],   # far
        [0.0, 0.0, 2.0], [64.0, 0.0, 2.0], [0.0, 64.0, 2.0],   # near
    ])
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    buf = rasterize(verts, faces, 32, 32)
    assert np.all(np.asarray(buf["face"])[np.asarray(buf["face"]) >= 0] == 1)
    d = np.asarray(buf["depth"])
    assert abs(d[5, 5] - 2.0) < 1e-5


def test_render_character_mesh():
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4)
    cam = Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0),
        ss.join(jnp.asarray([0.0, -1.5, 6.0]), jnp.asarray([0.0, 0, 0, 1.0]),
                jnp.ones(1)))
    buf = render_mesh(cam, char.mesh.vertices, char.mesh.faces, 64, 64)
    mask = np.asarray(buf["mask"])
    assert mask.sum() > 20  # character visible
    color = np.asarray(buf["color"])
    assert color[mask].max() > 0.05
    assert np.all(color[~mask] == 0)


def test_textured_render():
    import numpy as np
    from momentum_tpu.rasterizer import render_mesh_textured
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4)
    v = char.mesh.vertices
    # planar UVs from x/y extents
    vn = np.asarray(v)
    uv = (vn[:, :2] - vn[:, :2].min(0)) / (np.ptp(vn[:, :2], 0) + 1e-6)
    tex = np.zeros((8, 8, 3), np.float32)
    tex[::2, ::2] = 1.0  # checker
    cam = Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0),
        ss.join(jnp.asarray([0.0, -1.5, 6.0]), jnp.asarray([0.0, 0, 0, 1.0]),
                jnp.ones(1)))
    out = render_mesh_textured(cam, v, char.mesh.faces, jnp.asarray(uv, jnp.float32),
                               jnp.asarray(tex), 64, 64)
    mask = np.asarray(out["mask"])
    col = np.asarray(out["color"])
    assert mask.sum() > 20
    # checker produces both lit and dark pixels inside the mask
    assert col[mask].max() > 0.3 and col[mask].min() < 0.05


def test_shadow_map_occlusion():
    """Two horizontal quads stacked along -y light: the lower one is shadowed
    where the upper one covers it."""
    import numpy as np
    from momentum_tpu.rasterizer import render_mesh_shadowed

    # upper small quad (occluder) at y=2 over x,z in [-0.5, 0.5];
    # lower big quad at y=0 over x,z in [-2, 2]
    verts = jnp.asarray([
        [-0.5, 2.0, -0.5], [0.5, 2.0, -0.5], [0.5, 2.0, 0.5], [-0.5, 2.0, 0.5],
        [-2.0, 0.0, -2.0], [2.0, 0.0, -2.0], [2.0, 0.0, 2.0], [-2.0, 0.0, 2.0],
    ])
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32)
    cam = Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0),
        # look down from above-front
        ss.join(jnp.asarray([0.0, -1.0, 8.0]), jnp.asarray([0.3, 0, 0, 0.954]),
                jnp.ones(1)))
    out = render_mesh_shadowed(cam, verts, faces, 64, 64,
                               light_dir=(0.0, -1.0, 0.0),
                               shadow_resolution=128)
    import numpy as np
    mask = np.asarray(out["mask"])
    lit = np.asarray(out["shadow"])
    assert mask.sum() > 50
    # some visible pixels are lit and some are shadowed
    assert (lit[mask] > 0.5).any()
    assert (lit[mask] < 0.5).any()
    # shadowed pixels are darker than lit pixels of the same surface
    col = np.asarray(out["color"]).max(-1)
    assert col[mask & (lit > 0.5)].mean() > col[mask & (lit < 0.5)].mean()
