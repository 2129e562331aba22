"""Depth-tested 3-D overlays (rasterizer/overlays.py — the reference's
rasterizeLines/rasterizeCircles/rasterizeSplats, rasterizer.h:229/278/475):
coverage, interpolated depth, z-buffer composition with meshes, splat
orientation."""

import numpy as np
import pytest
import jax.numpy as jnp

from momentum_tpu.camera import Camera, PinholeIntrinsics
from momentum_tpu.rasterizer import (
    rasterize_circles,
    rasterize_lines,
    rasterize_splats,
)

W = H = 64


@pytest.fixture(scope="module")
def cam():
    # camera at origin looking down +z, principal point at image center
    return Camera.create(PinholeIntrinsics.create(64.0, 64.0, 32.0, 32.0))


def test_line_coverage_and_depth(cam):
    """A horizontal segment crossing the image center writes its color along
    the row and interpolates depth between the endpoints."""
    pts = [[-2.0, 0.0, 4.0], [2.0, 0.0, 8.0]]  # left near, right far
    z, rgb = rasterize_lines(cam, pts, W, H, color=(1.0, 0.0, 0.0),
                             thickness=2.0)
    row = np.asarray(z)[32]
    assert np.isfinite(row).sum() > 30  # covered along the center row
    # depth increases left to right between the endpoint depths
    cov = np.nonzero(np.isfinite(row))[0]
    assert row[cov[0]] < row[cov[-1]]
    assert 3.9 < row[cov[0]] < 6.0 and 6.0 < row[cov[-1]] < 8.1
    assert np.asarray(rgb)[32, 32, 0] == 1.0  # red
    # rows far away are untouched
    assert not np.isfinite(np.asarray(z)[5]).any()


def test_line_z_test_against_existing_buffer(cam):
    """A line behind an existing surface does not overwrite it."""
    z0 = jnp.full((H, W), 3.0)  # opaque wall at depth 3
    rgb0 = jnp.zeros((H, W, 3))
    z, rgb = rasterize_lines(cam, [[-2.0, 0.0, 5.0], [2.0, 0.0, 5.0]],
                             W, H, color=(0.0, 1.0, 0.0), z_buffer=z0,
                             rgb_buffer=rgb0)
    np.testing.assert_allclose(np.asarray(z), 3.0)
    np.testing.assert_allclose(np.asarray(rgb), 0.0)


def test_circles_fill_outline_and_foreshortening(cam):
    """World radius fore-shortens with depth; outline overrides fill."""
    centers = [[0.0, 0.0, 4.0]]
    z, rgb = rasterize_circles(cam, centers, W, H, radius=1.0,
                               fill_color=(0.0, 0.0, 1.0),
                               line_color=(1.0, 1.0, 0.0),
                               line_thickness=1.0)
    # r_px = 1 * 64 / 4 = 16 pixels
    zz = np.asarray(z)
    assert np.isfinite(zz[32, 32])  # filled center
    assert np.isfinite(zz[32, 32 + 15])
    assert not np.isfinite(zz[32, 32 + 19])
    rgbv = np.asarray(rgb)
    np.testing.assert_allclose(rgbv[32, 32], [0, 0, 1], atol=1e-6)  # fill
    # some pixel on the ring (within a pixel of r_px = 16) is outline-colored
    ring = rgbv[32, 32 + 14: 32 + 18]
    assert (ring[:, 0] > 0.5).any()

    far_z, _ = rasterize_circles(cam, [[0.0, 0.0, 8.0]], W, H, radius=1.0,
                                 fill_color=(1.0, 0.0, 0.0))
    # twice the depth → half the pixel radius
    assert np.isfinite(np.asarray(far_z)[32, 32 + 7])
    assert not np.isfinite(np.asarray(far_z)[32, 32 + 10])


def test_circles_require_a_color(cam):
    with pytest.raises(ValueError, match="line_color and/or fill_color"):
        rasterize_circles(cam, [[0.0, 0.0, 4.0]], W, H)


def test_splat_facing_and_tilt(cam):
    """A camera-facing splat covers a disk; a heavily tilted one
    fore-shortens to a thin ellipse; front/back materials differ."""
    from momentum_tpu.rasterizer import PhongMaterial

    front = PhongMaterial.create(diffuse_color=(1.0, 0.0, 0.0))
    back = PhongMaterial.create(diffuse_color=(0.0, 0.0, 1.0))

    z, rgb = rasterize_splats(cam, [[0.0, 0.0, 4.0]], [[0.0, 0.0, -1.0]],
                              W, H, radius=0.5, front_material=front,
                              back_material=back)
    zz = np.asarray(z)
    assert np.isfinite(zz[32, 32]) and abs(zz[32, 32] - 4.0) < 1e-3
    assert np.asarray(rgb)[32, 32, 0] > np.asarray(rgb)[32, 32, 2]  # front

    # back-facing: normal along +z (pointing away from the camera)
    _, rgb_b = rasterize_splats(cam, [[0.0, 0.0, 4.0]], [[0.0, 0.0, 1.0]],
                                W, H, radius=0.5, front_material=front,
                                back_material=back)
    assert np.asarray(rgb_b)[32, 32, 2] > np.asarray(rgb_b)[32, 32, 0]

    # tilted 80° about y: projected width shrinks, height stays
    ang = np.deg2rad(80.0)
    n = [np.sin(ang), 0.0, -np.cos(ang)]
    zt, _ = rasterize_splats(cam, [[0.0, 0.0, 4.0]], [n], W, H, radius=0.5)
    cover_t = np.isfinite(np.asarray(zt))
    cover_f = np.isfinite(zz)
    width_t = cover_t[32].sum()
    width_f = cover_f[32].sum()
    assert width_t < width_f * 0.55
    assert abs(int(cover_t[:, 32].sum()) - int(cover_f[:, 32].sum())) <= 2


def test_overlays_composite_with_mesh(cam):
    """Line in front of a rendered triangle wins; behind it loses."""
    from momentum_tpu.rasterizer import render_mesh

    verts = jnp.asarray([[-3.0, -3.0, 6.0], [3.0, -3.0, 6.0],
                         [0.0, 3.0, 6.0]])
    faces = jnp.asarray([[0, 1, 2]])
    out = render_mesh(cam, verts, faces, W, H)
    depth = jnp.where(out["mask"], out["depth"], jnp.inf)
    rgb = out["color"]

    z2, rgb2 = rasterize_lines(cam, [[-2.0, 0.0, 5.0], [2.0, 0.0, 5.0]],
                               W, H, color=(1.0, 0.0, 1.0),
                               z_buffer=depth, rgb_buffer=rgb)
    assert abs(float(z2[32, 32]) - 5.0) < 1e-3  # line in front
    z3, rgb3 = rasterize_lines(cam, [[-2.0, 0.0, 7.0], [2.0, 0.0, 7.0]],
                               W, H, color=(1.0, 0.0, 1.0),
                               z_buffer=z2, rgb_buffer=rgb2)
    assert abs(float(z3[32, 32]) - 5.0) < 1e-3  # farther line rejected
