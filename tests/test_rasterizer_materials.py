"""Phong material / multi-light / supersampling tests
(reference surface: momentum/rasterizer/rasterizer.h:49-110 PhongMaterial +
Light, rasterizeMesh per-vertex colors + back-face culling; AA by
supersampling)."""

import jax.numpy as jnp
import numpy as np

from momentum_tpu.camera import Camera, PinholeIntrinsics
from momentum_tpu.math import skel_state as ss
from momentum_tpu.rasterizer import (
    PhongMaterial,
    ambient_light,
    directional_light,
    downsample,
    point_light,
    render_mesh_phong,
)
from momentum_tpu.testing.fixtures import create_test_character


def _cam():
    return Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0),
        ss.join(jnp.asarray([0.0, -1.5, 6.0]), jnp.asarray([0.0, 0, 0, 1.0]),
                jnp.ones(1)))


def _char():
    return create_test_character(4)


def test_phong_default_lights_visible():
    char = _char()
    out = render_mesh_phong(_cam(), char.mesh.vertices, char.mesh.faces,
                            64, 64, backface_culling=False)
    mask = np.asarray(out["mask"])
    color = np.asarray(out["color"])
    assert mask.sum() > 20
    assert color[mask].max() > 0.05
    assert np.all(color[~mask] == 0)
    # normal buffer is unit length where covered
    n = np.asarray(out["normal"])[mask]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)


def test_ambient_only_is_flat_diffuse():
    char = _char()
    mat = PhongMaterial.create(diffuse_color=(0.3, 0.5, 0.7))
    out = render_mesh_phong(_cam(), char.mesh.vertices, char.mesh.faces,
                            64, 64, material=mat,
                            lights=(ambient_light((1.0, 1.0, 1.0)),),
                            backface_culling=False)
    mask = np.asarray(out["mask"])
    color = np.asarray(out["color"])[mask]
    np.testing.assert_allclose(color, np.tile([[0.3, 0.5, 0.7]],
                                              (len(color), 1)), atol=1e-5)


def test_emissive_adds_unlit_color():
    char = _char()
    mat = PhongMaterial.create(diffuse_color=(0.0, 0.0, 0.0),
                               emissive_color=(0.2, 0.0, 0.1))
    out = render_mesh_phong(_cam(), char.mesh.vertices, char.mesh.faces,
                            64, 64, material=mat,
                            lights=(directional_light((0.0, 0.0, -1.0)),),
                            backface_culling=False)
    mask = np.asarray(out["mask"])
    color = np.asarray(out["color"])[mask]
    np.testing.assert_allclose(color[:, 0], 0.2, atol=1e-5)
    np.testing.assert_allclose(color[:, 2], 0.1, atol=1e-5)


def test_specular_highlight_appears():
    """Specular term adds energy somewhere on a lit sphere-ish surface."""
    char = _char()
    base = PhongMaterial.create(diffuse_color=(0.4, 0.4, 0.4))
    shiny = PhongMaterial.create(diffuse_color=(0.4, 0.4, 0.4),
                                 specular_color=(0.9, 0.9, 0.9),
                                 specular_exponent=8.0)
    # camera world position is (0, 1.5, -6); put the light on the visible
    # side so a reflection lobe can reach the eye
    lights = (point_light((0.5, 1.0, -5.0)),)
    flat = render_mesh_phong(_cam(), char.mesh.vertices, char.mesh.faces,
                             64, 64, material=base, lights=lights,
                             backface_culling=False)
    spec = render_mesh_phong(_cam(), char.mesh.vertices, char.mesh.faces,
                             64, 64, material=shiny, lights=lights,
                             backface_culling=False)
    gain = np.asarray(spec["color"]) - np.asarray(flat["color"])
    assert gain.max() > 0.05  # highlight present
    assert gain.min() >= -1e-5  # specular only adds


def test_per_vertex_colors_modulate():
    char = _char()
    v = np.asarray(char.mesh.vertices)
    vc = np.zeros((len(v), 3), np.float32)
    vc[:, 0] = 1.0  # pure red mesh
    out = render_mesh_phong(_cam(), char.mesh.vertices, char.mesh.faces,
                            64, 64, vertex_colors=jnp.asarray(vc),
                            lights=(ambient_light((1.0, 1.0, 1.0)),),
                            backface_culling=False)
    mask = np.asarray(out["mask"])
    color = np.asarray(out["color"])[mask]
    assert (color[:, 0] > 0.5).all()
    np.testing.assert_allclose(color[:, 1:], 0.0, atol=1e-5)


def test_supersampling_smooths_edges():
    """4x supersampling produces intermediate coverage values at silhouette
    edges (the whole point of AA) and preserves the mean image."""
    char = _char()
    kw = dict(lights=(ambient_light((1.0, 1.0, 1.0)),),
              backface_culling=False)
    # roll the camera so silhouette edges are NOT pixel-axis-aligned (the
    # fixture mesh is an axis-aligned ribbon whose vertical edges otherwise
    # land exactly on supersample-block boundaries)
    roll = np.sin(0.15), np.cos(0.15)
    cam = Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0),
        ss.join(jnp.asarray([0.0, -1.5, 6.0]),
                jnp.asarray([0.0, 0.0, roll[0], roll[1]]), jnp.ones(1)))
    out1 = render_mesh_phong(cam, char.mesh.vertices, char.mesh.faces,
                             64, 64, supersample=1, **kw)
    out4 = render_mesh_phong(cam, char.mesh.vertices, char.mesh.faces,
                             64, 64, supersample=4, **kw)
    a1 = np.asarray(out1["alpha"])
    a4 = np.asarray(out4["alpha"])
    # aliased alpha is binary; supersampled alpha has fractional edge pixels
    assert set(np.unique(a1)) <= {0.0, 1.0}
    frac = (a4 > 0.01) & (a4 < 0.99)
    assert frac.sum() > 10
    # coverage is consistent between the two
    assert abs(a1.mean() - a4.mean()) < 0.05
    assert out4["color"].shape == (64, 64, 3)
    assert out4["face"].shape == (64, 64)


def test_downsample_box_filter():
    img = jnp.arange(16.0).reshape(4, 4)
    d = np.asarray(downsample(img, 2))
    np.testing.assert_allclose(d, [[2.5, 4.5], [10.5, 12.5]])


def test_backface_culling_removes_back_surface():
    """A single CCW-in-screen triangle survives culling; its mirror is
    dropped."""
    # camera at origin looking +z; triangle in front
    cam = Camera.create(PinholeIntrinsics.create(60.0, 60.0, 32.0, 32.0))
    tri_front = jnp.asarray([[-1.0, -1.0, 4.0], [1.0, -1.0, 4.0],
                             [0.0, 1.0, 4.0]])
    faces_a = jnp.asarray([[0, 1, 2]], jnp.int32)
    faces_b = jnp.asarray([[0, 2, 1]], jnp.int32)
    out_a = render_mesh_phong(cam, tri_front, faces_a, 64, 64,
                              backface_culling=True)
    out_b = render_mesh_phong(cam, tri_front, faces_b, 64, 64,
                              backface_culling=True)
    cov_a = np.asarray(out_a["mask"]).sum()
    cov_b = np.asarray(out_b["mask"]).sum()
    # exactly one winding is visible after culling
    assert (cov_a > 20) != (cov_b > 20)
    # and without culling both are visible
    out_nc = render_mesh_phong(cam, tri_front, faces_b, 64, 64,
                               backface_culling=False)
    assert np.asarray(out_nc["mask"]).sum() > 20
