"""Renderer utility surface (rasterizer/utils.py): buffers, alpha matting,
polygon triangulation, scene rasterizers, planar shadow matrix, auto-framed
body/hand cameras (pymomentum.renderer parity, renderer_pybind.cpp:217-893)."""

import numpy as np
import pytest

import jax.numpy as jnp

import momentum_tpu.rasterizer as R
from momentum_tpu.camera import Camera, PinholeIntrinsics
from momentum_tpu.testing.fixtures import create_test_character

W, H = 64, 48


@pytest.fixture
def cam():
    intr = PinholeIntrinsics.create(60.0, 60.0, 31.5, 23.5, image_size=(W, H))
    return Camera.create(intr).look_at((0.0, 30.0, -80.0), (0.0, 0.0, 0.0))


def test_buffers():
    z = R.create_z_buffer(W, H)
    rgb = R.create_rgb_buffer(W, H)
    idx = R.create_index_buffer(W, H)
    assert z.shape == (H, W) and np.isinf(np.asarray(z)).all()
    assert rgb.shape == (H, W, 3) and float(rgb.sum()) == 0.0
    assert idx.shape == (H, W) and int(idx[0, 0]) == -1


def test_triangulate_fan():
    tris = R.triangulate([0, 1, 2, 3, 4, 5, 6], [0, 4, 7])
    assert tris.tolist() == [[0, 1, 2], [0, 2, 3], [4, 5, 6]]
    with pytest.raises(ValueError):
        R.triangulate([0, 1], [0, 2])


def test_checkerboard_draws_and_ztests(cam):
    z, rgb = R.rasterize_checkerboard(cam, W, H, half_extent=60.0, squares=6)
    covered = np.isfinite(np.asarray(z))
    assert covered.any()
    # both checker colors present
    g = np.asarray(rgb)[covered][:, 0]
    assert (np.abs(g - 0.8) < 1e-3).any() and (np.abs(g - 0.4) < 1e-3).any()


def test_grid_composites_into_buffers(cam):
    z1, c1 = R.rasterize_checkerboard(cam, W, H, half_extent=60.0, squares=6)
    z2, c2 = R.rasterize_grid(cam, W, H, half_extent=60.0, step=20.0,
                              z_buffer=z1, rgb_buffer=c1)
    assert np.isfinite(np.asarray(z2)).sum() >= np.isfinite(np.asarray(z1)).sum()


def test_transforms_draw_three_axis_colors():
    # oblique viewpoint so no axis is end-on (an end-on axis projects to a dot)
    intr = PinholeIntrinsics.create(60.0, 60.0, 31.5, 23.5, image_size=(W, H))
    cam = Camera.create(intr).look_at((-50.0, 40.0, -60.0), (0.0, 10.0, 0.0))
    tr = jnp.asarray([[0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0]])
    z, rgb = R.rasterize_transforms(cam, tr, W, H, scale=15.0, thickness=2.0)
    covered = np.isfinite(np.asarray(z))
    assert covered.any()
    cols = np.asarray(rgb)[covered]
    # red-, green- and blue-dominant pixels all present
    assert (cols.argmax(axis=1) == 0).any()
    assert (cols.argmax(axis=1) == 1).any()
    assert (cols.argmax(axis=1) == 2).any()


def test_transforms_accepts_matrices(cam):
    z, rgb = R.rasterize_transforms(cam, np.eye(4)[None], W, H, scale=15.0)
    assert np.isfinite(np.asarray(z)).any()
    with pytest.raises(ValueError):
        R.rasterize_transforms(cam, np.zeros((2, 5)), W, H)


def test_camera_frustum(cam):
    shown = Camera.create(
        PinholeIntrinsics.create(60.0, 60.0, 31.5, 23.5, image_size=(W, H)))
    z, rgb = R.rasterize_camera_frustum(cam, shown, W, H, depth=20.0)
    assert np.isfinite(np.asarray(z)).any()


def test_alpha_matte(cam):
    z, rgb = R.rasterize_checkerboard(cam, W, H, half_extent=60.0, squares=6)
    img = jnp.full((H, W, 3), 0.5)
    out = np.asarray(R.alpha_matte(z, rgb, img, alpha=0.8))
    covered = np.isfinite(np.asarray(z))
    np.testing.assert_allclose(out[~covered], 0.5)
    np.testing.assert_allclose(
        out[covered], 0.8 * np.asarray(rgb)[covered] + 0.2 * 0.5, atol=1e-6)


def test_rasterize_mesh_into_buffers(cam):
    z0, c0 = R.rasterize_checkerboard(cam, W, H, half_extent=60.0, squares=6)
    verts = jnp.asarray([[-20.0, 0.0, -20.0], [20.0, 0.0, -20.0],
                         [0.0, 40.0, 0.0]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    z1, c1 = R.rasterize_mesh(cam, verts, faces, W, H,
                              z_buffer=z0, rgb_buffer=c0)
    assert (np.asarray(z1) <= np.asarray(z0) + 1e-6).all()


def test_shadow_projection_flattens_to_plane():
    m = np.asarray(R.create_shadow_projection_matrix(
        (0.3, -1.0, 0.2), (0.0, 1.0, 0.0), 0.0))
    pts = np.random.default_rng(0).uniform(1, 5, (10, 3))
    hom = np.concatenate([pts, np.ones((10, 1))], axis=1)
    proj = hom @ m.T
    proj = proj[:, :3] / proj[:, 3:4]
    np.testing.assert_allclose(proj[:, 1], 0.0, atol=1e-5)
    with pytest.raises(ValueError):
        R.create_shadow_projection_matrix((1.0, 0.0, 0.0), (0.0, 1.0, 0.0))


def test_create_camera_for_body_sees_all_joints():
    char = create_test_character(5)
    states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    cam = R.create_camera_for_body(char, states, H, W)
    uvz, valid = cam.project(states[:, :3])
    u, v, z = np.asarray(uvz).T
    assert (z > 0).all()
    assert (u > -1).all() and (u < W).all()
    assert (v > -1).all() and (v < H).all()


def test_create_camera_for_body_multi_frame():
    char = create_test_character(4)
    s0 = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    s1 = char.skeleton_states(0.3 * jnp.ones(char.num_model_parameters))
    states = jnp.stack([s0, s1])
    cam = R.create_camera_for_body(char, states, H, W, horizontal=True)
    for s in (s0, s1):
        _, valid = cam.project(s[:, :3])
        assert bool(np.asarray(valid).all())


def test_create_camera_for_hand():
    m = np.eye(4)
    m[:3, 3] = [100.0, 200.0, 300.0]  # mm → cm: (10, 20, 30)
    cam = R.create_camera_for_hand(m, H, W)
    uvz, valid = cam.project(jnp.asarray([10.0, 20.0, 30.0]))
    assert bool(valid)
    # hand center lands at the image center, 50 cm out
    np.testing.assert_allclose(float(uvz[2]), 50.0, atol=1e-4)
    np.testing.assert_allclose(float(uvz[0]), (W - 1) / 2.0, atol=1e-3)
    with pytest.raises(ValueError):
        R.create_camera_for_hand(np.eye(3), H, W)
