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
    (x', y') to distorted (x'', y'').

    Also carries the pymomentum IntrinsicsModel surface (camera.h:85-160):
    parameter vectors (get/set_intrinsic_parameters, parameter_names,
    project_intrinsics_jacobian) and image-geometry ops (resize/crop/
    downsample/upsample) when image_width/height are known."""

    def _distort(self, xp, yp):
        return xp, yp

    # ---- intrinsic parameter vector (camera.h:135-158; order per model) ----

    _scalar_params = ("fx", "fy", "cx", "cy")
    _vector_params = ()  # (field_name, length) pairs

    def parameter_names(self):
        names = list(self._scalar_params)
        for field, length in self._vector_params:
            base = field if field != "k" else "k"
            names += [f"{base}{i + 1}" for i in range(length)]
        return names

    def get_intrinsic_parameters(self) -> jnp.ndarray:
        parts = [jnp.reshape(getattr(self, f), (1,)) for f in self._scalar_params]
        parts += [jnp.reshape(getattr(self, f), (n,))
                  for f, n in self._vector_params]
        return jnp.concatenate(parts)

    def set_intrinsic_parameters(self, params):
        """→ new model (frozen pytrees; matches setIntrinsicParameters)."""
        params = jnp.asarray(params, jnp.float32)
        n_expected = len(self._scalar_params) + sum(
            n for _, n in self._vector_params)
        if params.shape[-1] != n_expected:
            raise ValueError(
                f"expected {n_expected} parameters, got {params.shape[-1]}")
        kw = {f: params[i] for i, f in enumerate(self._scalar_params)}
        off = len(self._scalar_params)
        for f, n in self._vector_params:
            kw[f] = params[off: off + n]
            off += n
        return dataclasses.replace(self, **kw)

    @property
    def num_intrinsic_parameters(self) -> int:
        return len(self._scalar_params) + sum(n for _, n in self._vector_params)

    def clone(self):
        """Deep copy (frozen pytrees make this a plain replace)."""
        return dataclasses.replace(self)

    def project_intrinsics_jacobian(self, p_eye):
        """(uvz, d(u,v)/d(intrinsics) (..., 2, N), valid) — the reference's
        projectIntrinsicsJacobian (camera.h:166-175), via AD instead of the
        hand-written per-model formulas."""
        p_eye = jnp.asarray(p_eye, jnp.float32)

        def f(vec):
            uvz, _ = self.set_intrinsic_parameters(vec).project(p_eye)
            return uvz[..., :2]

        vec0 = self.get_intrinsic_parameters()
        uvz, valid = self.project(p_eye)
        jac = jax.jacfwd(f)(vec0)  # (..., 2, N)
        return uvz, jac, valid

    # ---- image-geometry ops (camera.h:85-118) ----

    def _require_size(self):
        if not self.image_width or not self.image_height:
            raise ValueError(
                "intrinsics carry no image size; pass image_size to create()")

    def resize(self, image_width: int, image_height: int):
        """Rescale to a new resolution, pixel centers mapping exactly
        (half-pixel-offset convention, camera.cpp:144-159)."""
        self._require_size()
        sx = image_width / self.image_width
        sy = image_height / self.image_height
        return dataclasses.replace(
            self,
            fx=self.fx * sx, fy=self.fy * sy,
            cx=(self.cx + 0.5) * sx - 0.5, cy=(self.cy + 0.5) * sy - 0.5,
            image_width=int(image_width), image_height=int(image_height))

    def crop(self, top: int, left: int, new_width: int, new_height: int):
        """Sub-region of the image: principal point shifts, focal unchanged
        (camera.h:107-118)."""
        return dataclasses.replace(
            self, cx=self.cx - left, cy=self.cy - top,
            image_width=int(new_width), image_height=int(new_height))

    def downsample(self, factor: float):
        self._require_size()
        return self.resize(int(self.image_width / factor),
                           int(self.image_height / factor))

    def upsample(self, factor: float):
        self._require_size()
        return self.resize(int(self.image_width * factor),
                           int(self.image_height * factor))

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
    # 0 = unknown; needed only by resize/crop/frame (static metadata)
    image_width: int = dataclasses.field(default=0, metadata=dict(static=True))
    image_height: int = dataclasses.field(default=0, metadata=dict(static=True))

    @classmethod
    def create(cls, fx, fy, cx, cy, image_size=(0, 0)):
        return cls(_f(fx), _f(fy), _f(cx), _f(cy),
                   int(image_size[0]), int(image_size[1]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OpenCVIntrinsics(_IntrinsicsBase):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k: jnp.ndarray  # (6,) rational radial k1..k6
    # (4,) tangential p1, p2 + thin-prism p3, p4 — p3/p4 ride in the
    # parameter vector but do not enter the distortion, matching the
    # reference (camera.cpp:687-689 documents the same unused state)
    p: jnp.ndarray
    image_width: int = dataclasses.field(default=0, metadata=dict(static=True))
    image_height: int = dataclasses.field(default=0, metadata=dict(static=True))

    _vector_params = (("k", 6), ("p", 4))

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
    def create(cls, fx, fy, cx, cy, k=(0.0,) * 6, p=(0.0, 0.0),
               image_size=(0, 0)):
        p = tuple(p) + (0.0,) * (4 - len(tuple(p)))  # accept legacy (p1, p2)
        return cls(_f(fx), _f(fy), _f(cx), _f(cy), _f(k), _f(p),
                   int(image_size[0]), int(image_size[1]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OpenCVFisheyeIntrinsics(_IntrinsicsBase):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k: jnp.ndarray  # (4,) theta-polynomial k1..k4
    image_width: int = dataclasses.field(default=0, metadata=dict(static=True))
    image_height: int = dataclasses.field(default=0, metadata=dict(static=True))

    _vector_params = (("k", 4),)

    def _distort(self, xp, yp):
        r = jnp.sqrt(xp * xp + yp * yp + 1e-20)
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1.0 + t2 * (self.k[0] + t2 * (
            self.k[1] + t2 * (self.k[2] + t2 * self.k[3]))))
        scale = jnp.where(r > 1e-8, theta_d / r, 1.0)
        return xp * scale, yp * scale

    @classmethod
    def create(cls, fx, fy, cx, cy, k=(0.0,) * 4, image_size=(0, 0)):
        return cls(_f(fx), _f(fy), _f(cx), _f(cy), _f(k),
                   int(image_size[0]), int(image_size[1]))


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

    # ---- pymomentum Camera surface (camera.h:236-330) ----

    def clone(self) -> "Camera":
        return dataclasses.replace(self)

    def get_intrinsic_parameters(self) -> jnp.ndarray:
        return self.intrinsics.get_intrinsic_parameters()

    def set_intrinsic_parameters(self, params) -> "Camera":
        return dataclasses.replace(
            self, intrinsics=self.intrinsics.set_intrinsic_parameters(params))

    def project_intrinsics_jacobian(self, p_world):
        return self.intrinsics.project_intrinsics_jacobian(
            self.world_to_eye(jnp.asarray(p_world, jnp.float32)))

    def resize(self, image_width: int, image_height: int) -> "Camera":
        return dataclasses.replace(
            self, intrinsics=self.intrinsics.resize(image_width, image_height))

    def crop(self, top: int, left: int, new_width: int, new_height: int) -> "Camera":
        return dataclasses.replace(
            self, intrinsics=self.intrinsics.crop(top, left, new_width, new_height))

    def downsample(self, factor: float) -> "Camera":
        return dataclasses.replace(
            self, intrinsics=self.intrinsics.downsample(factor))

    def upsample(self, factor: float) -> "Camera":
        return dataclasses.replace(
            self, intrinsics=self.intrinsics.upsample(factor))

    def look_at(self, position, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)) -> "Camera":
        """Place the camera at `position` looking at `target`
        (camera.cpp:1246-1287). Eye-space +Z looks forward, +Y points down
        (pixel (0,0) top-left), so the world up vector flips when building
        the basis. Degenerate inputs return the camera unchanged."""
        import numpy as np

        from momentum_tpu.math import quaternion as quat

        position = np.asarray(position, np.float64)
        diff = np.asarray(target, np.float64) - position
        n = np.linalg.norm(diff)
        if n == 0.0:
            return self
        z = diff / n
        x = np.cross(diff, -np.asarray(up, np.float64)
                     / max(np.linalg.norm(up), 1e-30))
        if np.linalg.norm(x) == 0.0:
            # up parallel to look direction: any roll works; align +Z only
            q = np.asarray(quat.from_two_vectors(
                jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(z, jnp.float32)))
            r = np.asarray(quat.to_rotation_matrix(jnp.asarray(q)))
        else:
            y = np.cross(x, z)
            y /= np.linalg.norm(y)
            x = np.cross(y, z)
            x /= np.linalg.norm(x)
            r = np.stack([x, y, z], axis=1)  # eye→world columns
        if np.linalg.det(r) < 0.9:
            return self
        # eye_from_world = (eye_to_world)⁻¹: R_efw = Rᵀ, t_efw = −Rᵀ·position
        r_efw = r.T
        t_efw = -r_efw @ position
        q_efw = quat.from_rotation_matrix(jnp.asarray(r_efw, jnp.float32))
        state = jnp.concatenate([
            jnp.asarray(t_efw, jnp.float32), jnp.asarray(q_efw, jnp.float32),
            jnp.ones(1, jnp.float32)])
        return dataclasses.replace(self, eye_from_world=state)

    def frame(self, points, min_z: float = 0.1,
              edge_padding: float = 0.05) -> "Camera":
        """Translate the camera (orientation preserved) so every point
        projects inside the padded image rect (framePoints,
        camera.cpp:1289-1345): recenter laterally on the eye-space bbox,
        put the near plane at the closest point, then dolly back until every
        point satisfies its FOV and min-z constraints."""
        import numpy as np

        points = jnp.asarray(points, jnp.float32).reshape(-1, 3)
        if points.shape[0] == 0:
            return self
        intr = self.intrinsics
        intr._require_size()
        w, h = intr.image_width, intr.image_height
        cx, cy = w / 2.0, h / 2.0  # geometric center, ignoring principal point
        fx = float(np.asarray(intr.fx))
        fy = float(np.asarray(intr.fy))

        p_eye = np.asarray(self.world_to_eye(points))
        lo, hi = p_eye.min(axis=0), p_eye.max(axis=0)
        center = 0.5 * (lo + hi)
        shift = np.asarray([-center[0], -center[1], -lo[2]], np.float32)
        efw = ss.multiply(ss.from_translation(jnp.asarray(shift)),
                          self.eye_from_world)

        p_eye2 = p_eye + shift[None, :]
        max_x = (1.0 - 2.0 * edge_padding) * max(cx, (w - 1) - cx)
        max_y = (1.0 - 2.0 * edge_padding) * max(cy, (h - 1) - cy)
        # clip-plane constraint only participates for points inside min_z
        # (camera.cpp:1330-1332)
        dz_clip = np.where(p_eye2[:, 2] < min_z, min_z - p_eye2[:, 2], -np.inf)
        dz_x = fx * np.abs(p_eye2[:, 0]) / max_x - p_eye2[:, 2]
        dz_y = fy * np.abs(p_eye2[:, 1]) / max_y - p_eye2[:, 2]
        # the FOV constraints are unconditional, so (like the reference) the
        # dolly applies even when negative — it moves the camera closer
        max_dz = float(np.max(np.concatenate([dz_clip, dz_x, dz_y])))
        efw = ss.multiply(
            ss.from_translation(jnp.asarray([0.0, 0.0, max_dz], jnp.float32)),
            efw)
        return dataclasses.replace(self, eye_from_world=efw)

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
