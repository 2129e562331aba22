"""Camera models: pinhole, OpenCV (rational radial + tangential), OpenCV
fisheye — batched JAX versions of momentum/camera/camera.h:29-640.

Each intrinsics model is a frozen pytree whose fields are arrays, so
intrinsics can be solver variables (the reference's intrinsics-as-parameters,
character_solver/camera_intrinsics_parameters.h) and gradients flow through
projection via AD (replacing the hand-written projectJacobian /
projectIntrinsicsJacobian).

Conventions (camera.h):
  * project(p_eye) maps camera-space points to (u, v, z): pixel coordinates
    plus the camera-space depth; valid = z > 0
  * distortion for OpenCV (camera.cpp:313-344):
      radial = (1 + r²(k1 + r²(k2 + r²k3))) / (1 + r²(k4 + r²(k5 + r²k6)))
      x'' = x'·radial + 2p1x'y' + p2(r² + 2x'²);  y'' symmetric
  * fisheye (camera.cpp:759-815): θd = θ(1 + k1θ² + k2θ⁴ + k3θ⁶ + k4θ⁸),
    scale = θd/r (→1 at the axis)
  * unproject inverts the distortion with a fixed-iteration Newton solve
    (camera.h:72-78), expressed as lax.scan for jit-safety
  * Camera = intrinsics + extrinsics T_eye_from_world (8-param skel_state)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from momentum_tpu.math import skel_state as ss

__all__ = ["PinholeIntrinsics", "OpenCVIntrinsics", "OpenCVFisheyeIntrinsics", "Camera"]


def _f(x):
    return jnp.asarray(x, jnp.float32)


class _IntrinsicsBase:
    """project(p) -> ((..., 3) [u, v, z], valid); distort maps normalized
    (x', y') to distorted (x'', y'')."""

    def _distort(self, xp, yp):
        return xp, yp

    def project(self, p_eye: jnp.ndarray):
        z = p_eye[..., 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1.0)
        xp = p_eye[..., 0] / safe_z
        yp = p_eye[..., 1] / safe_z
        xpp, ypp = self._distort(xp, yp)
        u = self.fx * xpp + self.cx
        v = self.fy * ypp + self.cy
        return jnp.stack([u, v, z], axis=-1), z > 0

    def unproject(self, uvz: jnp.ndarray, iterations: int = 10):
        """Invert the projection for pixel (u, v) at depth z (camera.h:72-78)."""
        xpp = (uvz[..., 0] - self.cx) / self.fx
        ypp = (uvz[..., 1] - self.cy) / self.fy
        target = jnp.stack([xpp, ypp], axis=-1)

        def newton(carry, _):
            xy = carry

            def fwd(q):
                a, b = self._distort(q[..., 0], q[..., 1])
                return jnp.stack([a, b], axis=-1)

            out, jvp_ab = jax.linearize(fwd, xy)
            # 2x2 jacobian via two JVPs (batched)
            e0 = jnp.zeros_like(xy).at[..., 0].set(1.0)
            e1 = jnp.zeros_like(xy).at[..., 1].set(1.0)
            j0 = jvp_ab(e0)
            j1 = jvp_ab(e1)
            jmat = jnp.stack([j0, j1], axis=-1)  # (..., 2, 2)
            resid = out - target
            det = (jmat[..., 0, 0] * jmat[..., 1, 1]
                   - jmat[..., 0, 1] * jmat[..., 1, 0])
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            dx = inv_det * (jmat[..., 1, 1] * resid[..., 0] - jmat[..., 0, 1] * resid[..., 1])
            dy = inv_det * (-jmat[..., 1, 0] * resid[..., 0] + jmat[..., 0, 0] * resid[..., 1])
            return xy - jnp.stack([dx, dy], axis=-1), None

        xy, _ = jax.lax.scan(newton, target, None, length=iterations)
        z = uvz[..., 2]
        return jnp.stack([xy[..., 0] * z, xy[..., 1] * z, z], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PinholeIntrinsics(_IntrinsicsBase):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def create(cls, fx, fy, cx, cy):
        return cls(_f(fx), _f(fy), _f(cx), _f(cy))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OpenCVIntrinsics(_IntrinsicsBase):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k: jnp.ndarray  # (6,) rational radial k1..k6
    p: jnp.ndarray  # (2,) tangential p1, p2

    def _distort(self, xp, yp):
        r2 = xp * xp + yp * yp
        k = self.k
        num = 1.0 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
        den = 1.0 + r2 * (k[3] + r2 * (k[4] + r2 * k[5]))
        radial = num / den
        p1, p2 = self.p[0], self.p[1]
        xpp = xp * radial + 2.0 * p1 * xp * yp + p2 * (r2 + 2.0 * xp * xp)
        ypp = yp * radial + p1 * (r2 + 2.0 * yp * yp) + 2.0 * p2 * xp * yp
        return xpp, ypp

    @classmethod
    def create(cls, fx, fy, cx, cy, k=(0.0,) * 6, p=(0.0, 0.0)):
        return cls(_f(fx), _f(fy), _f(cx), _f(cy), _f(k), _f(p))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OpenCVFisheyeIntrinsics(_IntrinsicsBase):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k: jnp.ndarray  # (4,) theta-polynomial k1..k4

    def _distort(self, xp, yp):
        r = jnp.sqrt(xp * xp + yp * yp + 1e-20)
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1.0 + t2 * (self.k[0] + t2 * (
            self.k[1] + t2 * (self.k[2] + t2 * self.k[3]))))
        scale = jnp.where(r > 1e-8, theta_d / r, 1.0)
        return xp * scale, yp * scale

    @classmethod
    def create(cls, fx, fy, cx, cy, k=(0.0,) * 4):
        return cls(_f(fx), _f(fy), _f(cx), _f(cy), _f(k))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Intrinsics + extrinsics (T_eye_from_world as an 8-param skel_state)
    — camera.h:180-310."""

    intrinsics: object
    eye_from_world: jnp.ndarray  # (8,)

    @classmethod
    def create(cls, intrinsics, eye_from_world=None):
        if eye_from_world is None:
            eye_from_world = ss.identity()
        return cls(intrinsics=intrinsics, eye_from_world=jnp.asarray(eye_from_world))

    def world_to_eye(self, p_world: jnp.ndarray) -> jnp.ndarray:
        return ss.transform_points(self.eye_from_world, p_world)

    def project(self, p_world: jnp.ndarray):
        return self.intrinsics.project(self.world_to_eye(p_world))

    def unproject(self, uvz: jnp.ndarray, iterations: int = 10) -> jnp.ndarray:
        p_eye = self.intrinsics.unproject(uvz, iterations)
        return ss.transform_points(ss.inverse(self.eye_from_world), p_eye)

    def projection_matrix(self) -> jnp.ndarray:
        """(3, 4) pinhole-equivalent matrix (for ProjectionErrorFunction when
        distortion is zero)."""
        t, q, s = ss.split(self.eye_from_world)
        from momentum_tpu.math import quaternion as quat

        r = quat.to_rotation_matrix(q) * s[..., None]
        kmat = jnp.asarray([
            [self.intrinsics.fx, 0.0, self.intrinsics.cx],
            [0.0, self.intrinsics.fy, self.intrinsics.cy],
            [0.0, 0.0, 1.0],
        ])
        rt = jnp.concatenate([r, t[..., None]], axis=-1)
        return kmat @ rt
