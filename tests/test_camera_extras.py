"""Camera surface added for pymomentum.camera parity: intrinsic parameter
vectors, image-geometry ops (resize/crop/down/upsample), look_at/frame,
project_intrinsics_jacobian (camera.h:85-330, camera_pybind.cpp:48-90)."""

import numpy as np
import pytest

import jax.numpy as jnp

from momentum_tpu.camera import (
    Camera,
    OpenCVFisheyeIntrinsics,
    OpenCVIntrinsics,
    PinholeIntrinsics,
)


@pytest.fixture
def pin():
    return PinholeIntrinsics.create(500.0, 480.0, 320.0, 240.0,
                                    image_size=(640, 480))


class TestParameterVectors:
    def test_pinhole_round_trip(self, pin):
        v = pin.get_intrinsic_parameters()
        assert v.shape == (4,)
        assert pin.parameter_names() == ["fx", "fy", "cx", "cy"]
        p2 = pin.set_intrinsic_parameters(v * 2.0)
        np.testing.assert_allclose(np.asarray(p2.get_intrinsic_parameters()),
                                   np.asarray(v) * 2.0)

    def test_opencv_14_params(self):
        ocv = OpenCVIntrinsics.create(
            500.0, 500.0, 320.0, 240.0, k=(0.1, 0.01, 0, 0, 0, 0),
            p=(0.01, -0.02))
        v = ocv.get_intrinsic_parameters()
        assert v.shape == (14,)  # fx fy cx cy k1-k6 p1-p4 (camera.cpp:559)
        assert ocv.parameter_names() == [
            "fx", "fy", "cx", "cy", "k1", "k2", "k3", "k4", "k5", "k6",
            "p1", "p2", "p3", "p4"]
        # legacy 2-tuple p pads with thin-prism zeros
        np.testing.assert_allclose(np.asarray(v[10:]), [0.01, -0.02, 0, 0])

    def test_fisheye_8_params(self):
        fe = OpenCVFisheyeIntrinsics.create(400.0, 400.0, 320.0, 240.0,
                                            k=(0.1, 0, 0, 0))
        assert fe.get_intrinsic_parameters().shape == (8,)

    def test_set_wrong_length_raises(self, pin):
        with pytest.raises(ValueError):
            pin.set_intrinsic_parameters(jnp.zeros(5))

    def test_clone_is_independent_value(self, pin):
        c = pin.clone()
        assert c is not pin
        np.testing.assert_allclose(float(c.fx), float(pin.fx))


class TestImageGeometry:
    def test_resize_half_pixel_convention(self, pin):
        r = pin.resize(320, 240)
        # camera.cpp:150-156: new_c = (old_c + .5)·s − .5
        assert abs(float(r.fx) - 250.0) < 1e-5
        assert abs(float(r.cx) - ((320.0 + 0.5) * 0.5 - 0.5)) < 1e-5
        assert r.image_width == 320 and r.image_height == 240

    def test_resize_round_trip_projects_same_pixel_center(self, pin):
        p = jnp.asarray([0.1, -0.2, 2.0])
        uvz, _ = pin.project(p)
        uvz2, _ = pin.resize(1280, 960).project(p)
        # pixel centers map: u' = (u + .5)·2 − .5
        np.testing.assert_allclose(float(uvz2[0]),
                                   (float(uvz[0]) + 0.5) * 2 - 0.5, atol=1e-3)

    def test_crop_shifts_principal_point(self, pin):
        c = pin.crop(10, 20, 600, 460)
        assert float(c.cx) == 300.0 and float(c.cy) == 230.0
        assert c.image_width == 600 and c.image_height == 460

    def test_down_up_sample(self, pin):
        assert pin.downsample(2.0).image_width == 320
        assert pin.upsample(2.0).image_width == 1280

    def test_requires_image_size(self):
        bare = PinholeIntrinsics.create(500.0, 500.0, 320.0, 240.0)
        with pytest.raises(ValueError):
            bare.resize(100, 100)

    def test_camera_level_passthrough(self, pin):
        cam = Camera.create(pin)
        assert cam.resize(320, 240).intrinsics.image_width == 320
        assert float(cam.crop(0, 10, 600, 480).intrinsics.cx) == 310.0
        assert cam.downsample(2.0).intrinsics.image_width == 320
        v = cam.get_intrinsic_parameters()
        cam2 = cam.set_intrinsic_parameters(v + 1.0)
        assert float(cam2.intrinsics.fx) == float(pin.fx) + 1.0


class TestLookAtFrame:
    def test_look_at_centers_target(self, pin):
        cam = Camera.create(pin).look_at((5.0, 3.0, -8.0), (1.0, 2.0, 0.5))
        uvz, valid = cam.project(jnp.asarray([1.0, 2.0, 0.5]))
        assert bool(valid)
        np.testing.assert_allclose(float(uvz[0]), 320.0, atol=1e-2)
        np.testing.assert_allclose(float(uvz[1]), 240.0, atol=1e-2)

    def test_look_at_image_y_down(self, pin):
        cam = Camera.create(pin).look_at((0.0, 0.0, -5.0), (0.0, 0.0, 0.0))
        up_uvz, _ = cam.project(jnp.asarray([0.0, 1.0, 0.0]))
        assert float(up_uvz[1]) < 240.0  # above center in image coords

    def test_look_at_degenerate_is_identity(self, pin):
        cam = Camera.create(pin)
        cam2 = cam.look_at((1.0, 1.0, 1.0), (1.0, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(cam2.eye_from_world),
                                   np.asarray(cam.eye_from_world))

    def test_frame_contains_all_points(self, pin):
        cam = Camera.create(pin).look_at((0.0, 0.0, -10.0), (0.0, 0.0, 0.0))
        pts = np.random.default_rng(1).uniform(-3, 3, (64, 3)).astype(np.float32)
        framed = cam.frame(pts, min_z=0.1, edge_padding=0.05)
        uvz, _ = framed.project(jnp.asarray(pts))
        u, v, z = np.asarray(uvz).T
        assert (z >= 0.0999).all()
        pad_u, pad_v = 0.05 * 640, 0.05 * 480
        slack = 21.0  # framing centers on bbox, not per-point optimum
        assert (u >= pad_u - slack).all() and (u <= 640 - pad_u + slack).all()
        assert (v >= pad_v - slack).all() and (v <= 480 - pad_v + slack).all()

    def test_frame_empty_is_identity(self, pin):
        cam = Camera.create(pin)
        cam2 = cam.frame(np.zeros((0, 3)))
        np.testing.assert_allclose(np.asarray(cam2.eye_from_world),
                                   np.asarray(cam.eye_from_world))


class TestIntrinsicsJacobian:
    def test_pinhole_closed_form(self, pin):
        uvz, jac, valid = pin.project_intrinsics_jacobian(
            jnp.asarray([1.0, 0.5, 2.0]))
        assert bool(valid) and jac.shape == (2, 4)
        np.testing.assert_allclose(float(jac[0, 0]), 0.5, atol=1e-6)  # du/dfx
        np.testing.assert_allclose(float(jac[1, 1]), 0.25, atol=1e-6)  # dv/dfy
        np.testing.assert_allclose(float(jac[0, 2]), 1.0, atol=1e-6)  # du/dcx
        np.testing.assert_allclose(float(jac[0, 1]), 0.0, atol=1e-6)

    def test_opencv_matches_fd(self):
        ocv = OpenCVIntrinsics.create(
            500.0, 490.0, 320.0, 240.0, k=(0.05, -0.01, 0, 0.002, 0, 0),
            p=(0.01, -0.005))
        p = jnp.asarray([0.4, -0.3, 1.7])
        _, jac, _ = ocv.project_intrinsics_jacobian(p)
        v0 = np.asarray(ocv.get_intrinsic_parameters())
        # f32 central differences on pixel-scale outputs carry ~5e-2 noise
        eps = 3e-3
        for i in range(14):
            dv = v0.copy()
            dv[i] += eps
            up, _ = ocv.set_intrinsic_parameters(jnp.asarray(dv)).project(p)
            dn, _ = ocv.set_intrinsic_parameters(
                jnp.asarray(v0 - (dv - v0))).project(p)
            fd = (np.asarray(up[:2]) - np.asarray(dn[:2])) / (2 * eps)
            np.testing.assert_allclose(np.asarray(jac[:, i]), fd, atol=5e-2)
