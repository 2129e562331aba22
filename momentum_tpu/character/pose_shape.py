"""PoseShape: pose-dependent corrective deformation driven by joint rotations.

Reference: momentum/character/pose_shape.{h,cpp}:15-45 — quaternion-weighted
linear blendshapes: the coefficients are the quaternion components of each
driving joint's rotation relative to a base joint,
    base = baseRot · R(baseJoint)⁻¹
    coeffs = concat_i (base · R(jointMap[i])).coeffs()   (x, y, z, w each)
    shape = baseShape + shapeVectors · coeffs
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from momentum_tpu.math import quaternion as quat, skel_state as ss

__all__ = ["PoseShape"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseShape:
    base_rot: jnp.ndarray  # (4,) quaternion
    base_shape: jnp.ndarray  # (V, 3)
    shape_vectors: jnp.ndarray  # (V, 3, nDrivers*4)
    base_joint: int = dataclasses.field(default=0, metadata=dict(static=True))
    joint_map: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    def compute(self, skel_states: jnp.ndarray) -> jnp.ndarray:
        """(..., nJ, 8) global states → (..., V, 3) deformed vertices."""
        import numpy as np

        _, q_all, _ = ss.split(skel_states)
        base = quat.multiply(
            self.base_rot, quat.conjugate(q_all[..., self.base_joint, :]))
        drivers = jnp.take(q_all, jnp.asarray(np.asarray(self.joint_map, np.int32)),
                           axis=-2)  # (..., D, 4)
        rel = quat.multiply(base[..., None, :], drivers)
        coeffs = rel.reshape(rel.shape[:-2] + (-1,))  # (..., D*4)
        return self.base_shape + jnp.einsum(
            "vik,...k->...vi", self.shape_vectors, coeffs)
