"""Primitive tessellation + rasterize_* wrappers
(reference: pymomentum/renderer renderer_pybind.cpp:261-833)."""

import jax.numpy as jnp
import numpy as np

from momentum_tpu.camera import Camera, PinholeIntrinsics
from momentum_tpu.math import skel_state as ss
from momentum_tpu.rasterizer import (
    make_capsule,
    make_checkerboard,
    make_cylinder,
    make_grid_lines,
    make_sphere,
    rasterize_character,
    rasterize_circles_2d,
    rasterize_lines_2d,
    rasterize_skeleton,
    rasterize_spheres,
    rasterize_wireframe,
    subdivide_mesh,
)
from momentum_tpu.testing.fixtures import create_test_character


def _cam(dist=6.0):
    return Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0),
        ss.join(jnp.asarray([0.0, 0.0, dist]), jnp.asarray([0.0, 0, 0, 1.0]),
                jnp.ones(1)))


def test_subdivide_quadruples_faces():
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.asarray([[0, 1, 2]], np.int32)
    v2, f2 = subdivide_mesh(v, f, 1)
    assert f2.shape == (4, 3)
    assert v2.shape == (6, 3)  # 3 corners + 3 shared midpoints
    v3, f3 = subdivide_mesh(v, f, 2)
    assert f3.shape == (16, 3)


def test_make_sphere_unit():
    v, f = make_sphere(2)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
    assert f.shape == (20 * 16, 3)
    # closed 2-manifold: every edge shared by exactly 2 faces
    edges = {}
    for tri in f:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    assert set(edges.values()) == {2}


def test_make_cylinder_capsule_shapes():
    v, f = make_cylinder(2, 8)
    assert np.isfinite(v).all()
    assert v[:, 0].min() >= -1e-6 and v[:, 0].max() <= 1 + 1e-6
    v, f = make_capsule(0.5, 0.25, 2.0)
    assert v[:, 0].min() >= -0.5 - 1e-5
    assert v[:, 0].max() <= 2.25 + 1e-5
    r_mid = np.linalg.norm(v[np.abs(v[:, 0]) < 1e-6][:, 1:], axis=1)
    np.testing.assert_allclose(r_mid, 0.5, atol=1e-5)


def test_rasterize_spheres_visible():
    out = rasterize_spheres(_cam(), [[0.0, 0, 0], [1.5, 0, 0]], [0.5, 0.25],
                            64, 64)
    mask = np.asarray(out["mask"])
    assert mask.sum() > 50
    # two blobs: pixels on both sides of the image center
    cols = np.nonzero(mask.any(axis=0))[0]
    assert cols.max() - cols.min() > 15


def test_rasterize_skeleton_and_character():
    char = create_test_character(4)
    states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    cam = _cam(10.0)
    out = rasterize_skeleton(cam, char.skeleton, states, 64, 64,
                             bone_radius=0.1)
    assert np.asarray(out["mask"]).sum() > 10
    out2 = rasterize_character(cam, char, jnp.zeros(char.num_model_parameters),
                               64, 64)
    assert np.asarray(out2["mask"]).sum() > 10


def test_wireframe_and_2d_overlays():
    char = create_test_character(4)
    img = rasterize_wireframe(_cam(8.0), char.mesh.vertices, char.mesh.faces,
                              64, 64)
    assert img.max() > 0.5  # some edges drawn
    img2 = rasterize_lines_2d(img, [[[2, 2], [60, 2]]], color=(1, 0, 0))
    assert (img2[2, 2:60, 0] > 0.9).all()
    img3 = rasterize_circles_2d(np.zeros((64, 64, 3), np.float32),
                                [[32, 32]], [10])
    ys, xs = np.nonzero(img3[..., 0] > 0.5)
    rad = np.sqrt((ys - 32.0) ** 2 + (xs - 32.0) ** 2)
    assert np.abs(rad - 10).max() < 2.0


def test_checkerboard_and_grid():
    v, f, c = make_checkerboard(10.0, 4)
    assert f.shape[0] == 2 * 16 and c.shape[0] == f.shape[0]
    assert len(np.unique(c[:, 0])) == 2
    segs = make_grid_lines(10.0, 5.0)
    assert segs.shape == (10, 2, 3)


def test_text_2d_and_billboard():
    from momentum_tpu.rasterizer import (
        measure_text, rasterize_text, rasterize_text_2d,
    )

    img = np.zeros((32, 96, 3), np.float32)
    out = rasterize_text_2d(img, "IK 42%", 2, 2, color=(0, 1, 0), scale=1)
    assert (out[..., 1] > 0.5).sum() > 20  # pixels drawn
    assert out[..., 0].max() == 0  # only the green channel
    w, h = measure_text("IK 42%")
    assert w == 6 * 6 and h == 7
    # scale doubles coverage
    out2 = rasterize_text_2d(img, "A", 2, 2, scale=2)
    out1 = rasterize_text_2d(img, "A", 2, 2, scale=1)
    assert (out2.sum() > 3 * out1.sum())
    # billboard via camera projection
    cam = _cam(4.0)
    out3 = rasterize_text(np.zeros((64, 64, 3), np.float32), cam, "X",
                          [0.0, 0.0, 0.0])
    ys, xs = np.nonzero(out3[..., 0] > 0.5)
    assert len(ys) > 0
    assert abs(ys.mean() - 32) < 6 and abs(xs.mean() - 32) < 6
