"""Windowed (scatter-min) rasterizer vs the dense reference path.

rasterize_windowed is the HBM-lean production path (O(F·K² + H·W·cap)
instead of O(H·W·F)); these tests pin it against the dense rasterizer,
which is the validated reference implementation (rasterizer.h z-buffer
semantics). Agreement is exact except where two faces land within one
depth-quantization step of each other at the same pixel — vanishingly rare
on random meshes, and bounded below as a mismatch-fraction check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.rasterizer.render import rasterize, rasterize_windowed


def _random_mesh(rng, n_tris, spread=60.0, size=8.0, zlo=1.0, zhi=10.0):
    """Random small triangles scattered over the screen."""
    center = rng.uniform(5, spread, (n_tris, 1, 2))
    offset = rng.uniform(-size / 2, size / 2, (n_tris, 3, 2))
    z = rng.uniform(zlo, zhi, (n_tris, 1, 1)) + rng.uniform(
        0, 0.1, (n_tris, 3, 1))
    verts = np.concatenate([center + offset, z], axis=-1).reshape(-1, 3)
    faces = np.arange(3 * n_tris, dtype=np.int32).reshape(n_tris, 3)
    return jnp.asarray(verts, jnp.float32), jnp.asarray(faces)


def _agreement(a, b):
    same = np.asarray(a["face"]) == np.asarray(b["face"])
    return same.mean(), same


def test_windowed_matches_dense_random_mesh():
    rng = np.random.default_rng(0)
    verts, faces = _random_mesh(rng, 120)
    w, h = 72, 64
    dense = jax.jit(lambda v: rasterize(v, faces, w, h))(verts)
    windowed = jax.jit(lambda v: rasterize_windowed(v, faces, w, h,
                                                    window=16))(verts)
    frac, same = _agreement(dense, windowed)
    assert frac > 0.995, frac  # quantized tie-breaks only
    d0 = np.asarray(dense["depth"])[same]
    d1 = np.asarray(windowed["depth"])[same]
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-5)
    b0 = np.asarray(dense["bary"])[same]
    b1 = np.asarray(windowed["bary"])[same]
    np.testing.assert_allclose(b1, b0, rtol=1e-4, atol=1e-5)
    # both actually drew something
    assert (np.asarray(dense["face"]) >= 0).mean() > 0.05


def test_windowed_big_faces_route_to_dense_pass():
    """Faces larger than the window (ground planes, close-ups) must still
    rasterize — via the capacity-bounded dense pass."""
    rng = np.random.default_rng(1)
    verts, faces = _random_mesh(rng, 40)
    # a huge floor quad (2 triangles) covering the whole screen, behind
    floor = jnp.asarray([
        [-10.0, -10.0, 20.0], [100.0, -10.0, 20.0],
        [100.0, 100.0, 20.0], [-10.0, 100.0, 20.0]], jnp.float32)
    fverts = jnp.concatenate([verts, floor])
    n = verts.shape[0]
    ffaces = jnp.concatenate([
        faces, jnp.asarray([[n, n + 1, n + 2], [n, n + 2, n + 3]],
                           faces.dtype)])
    w, h = 72, 64
    dense = rasterize(fverts, ffaces, w, h)
    windowed = rasterize_windowed(fverts, ffaces, w, h, window=16,
                                  big_capacity=8)
    frac, same = _agreement(dense, windowed)
    assert frac > 0.995, frac
    # the floor fills every pixel in both
    assert (np.asarray(dense["face"]) >= 0).all()
    assert (np.asarray(windowed["face"]) >= 0).all()


def test_windowed_empty_and_behind_camera():
    verts = jnp.asarray([[10.0, 10.0, -1.0], [20.0, 10.0, -1.0],
                         [15.0, 20.0, -1.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    out = rasterize_windowed(verts, faces, 32, 32, window=16)
    assert (np.asarray(out["face"]) == -1).all()
    assert np.isinf(np.asarray(out["depth"])).all()


def test_windowed_occlusion_order():
    """Two overlapping triangles: the nearer one must win, exactly as in
    the dense path."""
    verts = jnp.asarray([
        [4.0, 4.0, 5.0], [28.0, 4.0, 5.0], [16.0, 28.0, 5.0],   # far
        [4.0, 6.0, 2.0], [28.0, 6.0, 2.0], [16.0, 26.0, 2.0],   # near
    ], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    dense = rasterize(verts, faces, 32, 32)
    windowed = rasterize_windowed(verts, faces, 32, 32, window=32)
    np.testing.assert_array_equal(np.asarray(dense["face"]),
                                  np.asarray(windowed["face"]))
    np.testing.assert_allclose(np.asarray(windowed["depth"]),
                               np.asarray(dense["depth"]), atol=1e-5)


def test_render_mesh_method_dispatch():
    """render_mesh(method=...) produces matching images through both paths
    on a posed character mesh."""
    from momentum_tpu.character.skinning import skin_points
    from momentum_tpu.rasterizer.render import render_mesh
    from momentum_tpu.rasterizer.utils import create_camera_for_body
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character().with_inverse_bind_pose()
    theta = jnp.zeros(char.num_model_parameters)
    st = char.skeleton_states(theta)
    verts = skin_points(char.skin_weights, st, char.inverse_bind_pose,
                        char.mesh.vertices)
    cam = create_camera_for_body(char, st, 96, 128)
    a = render_mesh(cam, verts, char.mesh.faces, 128, 96, method="dense")
    b = render_mesh(cam, verts, char.mesh.faces, 128, 96, method="windowed")
    same = np.asarray(a["face"]) == np.asarray(b["face"])
    assert same.mean() > 0.99, same.mean()
    assert (np.asarray(a["face"]) >= 0).any()
    ca, cb = np.asarray(a["color"]), np.asarray(b["color"])
    np.testing.assert_allclose(cb[same], ca[same], atol=1e-4)
