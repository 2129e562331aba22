"""CameraProjectionErrorFunction: pixel residual through a full camera model
(with distortion), gradients flowing to pose AND camera (extrinsics +
intrinsics as pytree leaves).

Reference: character_solver/camera_projection_error_function.{h,cpp} +
camera_intrinsics_parameters.h (intrinsics-as-parameters). Residual per
constraint: f = project(T_joint·offset).uv − target, active when the point is
in front of the camera (depth ≥ nearClip).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.camera.models import Camera
from momentum_tpu.errors.base import EvalContext, VectorErrorFunction, pad_rows
from momentum_tpu.math import skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = ["CameraProjectionErrorFunction"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraProjectionErrorFunction(VectorErrorFunction):
    camera: Camera
    parent: jnp.ndarray  # (C,)
    offset: jnp.ndarray  # (C, 3)
    target: jnp.ndarray  # (C, 2) pixel targets
    cweight: jnp.ndarray
    weight: jnp.ndarray
    near_clip: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 2

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def raw(self, character, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        p_world = ss.transform_points(states, self.offset)
        uvz, valid = self.camera.project(p_world)
        valid = valid & (uvz[..., 2] >= self.near_clip)
        f = uvz[..., :2] - self.target
        return jnp.where(valid[..., None], f, 0.0), self.cweight

    @classmethod
    def create(cls, camera, parent, offset, target, cweight=None, weight=1.0,
               near_clip=0.01, loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            camera=camera,
            parent=jnp.asarray(pad_rows(parent, cap)),
            offset=jnp.asarray(pad_rows(np.asarray(offset, np.float32).reshape(n, 3), cap)),
            target=jnp.asarray(pad_rows(np.asarray(target, np.float32).reshape(n, 2), cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            near_clip=near_clip,
            loss=loss or GeneralizedLoss(),
        )
