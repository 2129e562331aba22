"""StateErrorFunction: match a full target skeleton state.

Reference: character_solver/state_error_function.{h,cpp}:199-262 —
per joint i:
    position term  ‖t_i − t*_i‖² · kPositionWeight(=1e-3) · posWgt · posW_i
    rotation term  (RotationMatrixDifference default) ‖R_i − R*_i‖² ·
                   kOrientationWeight(=1) · rotWgt · rotW_i
    (QuaternionLogMap alternative: ‖log(q*⁻¹ q)‖²)
summed and scaled by the global weight. Rows: 3 position + 9 (or 3 logmap)
rotation rows per joint, weight-0 rows for unused joints.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import ErrorFunction, EvalContext
from momentum_tpu.math import quaternion as quat, skel_state as ss

__all__ = ["StateErrorFunction"]

K_STATE_POSITION_WEIGHT = 1e-3  # state_error_function.h:115
K_STATE_ORIENTATION_WEIGHT = 1.0  # state_error_function.h:116


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StateErrorFunction(ErrorFunction):
    target_state: jnp.ndarray  # (nJ, 8) target global skel states
    position_weight: jnp.ndarray  # (nJ,)
    rotation_weight: jnp.ndarray  # (nJ,)
    pos_wgt: jnp.ndarray  # scalar posWgt_
    rot_wgt: jnp.ndarray  # scalar rotWgt_
    weight: jnp.ndarray
    rotation_error_type: str = dataclasses.field(
        default="matrix", metadata=dict(static=True)
    )  # "matrix" | "logmap"

    def _parts(self, ctx: EvalContext):
        t, q, _ = ss.split(ctx.skel_states)
        t_tgt, q_tgt, _ = ss.split(self.target_state)
        pos_diff = t - t_tgt  # (nJ, 3)
        if self.rotation_error_type == "logmap":
            q_rel = quat.multiply(quat.conjugate(q_tgt), q)
            rot_diff = quat.to_axis_angle(q_rel)  # (nJ, 3)
        else:
            rot_diff = quat.to_rotation_matrix(q) - quat.to_rotation_matrix(q_tgt)
            rot_diff = rot_diff.reshape(rot_diff.shape[:-2] + (9,))
        return pos_diff, rot_diff

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        pos_diff, rot_diff = self._parts(ctx)
        pos_e = jnp.sum(self.position_weight * jnp.sum(pos_diff**2, axis=-1), axis=-1)
        rot_e = jnp.sum(self.rotation_weight * jnp.sum(rot_diff**2, axis=-1), axis=-1)
        return self.weight * (
            K_STATE_POSITION_WEIGHT * self.pos_wgt * pos_e
            + K_STATE_ORIENTATION_WEIGHT * self.rot_wgt * rot_e
        )

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        pos_diff, rot_diff = self._parts(ctx)
        pos_s = jnp.sqrt(jnp.maximum(
            self.weight * K_STATE_POSITION_WEIGHT * self.pos_wgt * self.position_weight, 0.0
        ))
        rot_s = jnp.sqrt(jnp.maximum(
            self.weight * K_STATE_ORIENTATION_WEIGHT * self.rot_wgt * self.rotation_weight, 0.0
        ))
        rows = jnp.concatenate(
            [
                (pos_s[..., None] * pos_diff).reshape(pos_diff.shape[:-2] + (-1,)),
                (rot_s[..., None] * rot_diff).reshape(rot_diff.shape[:-2] + (-1,)),
            ],
            axis=-1,
        )
        return rows

    def num_rows(self) -> int:
        nj = self.target_state.shape[-2]
        rot_d = 3 if self.rotation_error_type == "logmap" else 9
        return nj * (3 + rot_d)

    @classmethod
    def create(cls, target_state, position_weight=None, rotation_weight=None,
               pos_wgt=1.0, rot_wgt=1.0, weight=1.0, rotation_error_type="matrix"):
        target_state = jnp.asarray(target_state, jnp.float32)
        nj = target_state.shape[0]
        if position_weight is None:
            position_weight = np.ones(nj, np.float32)
        if rotation_weight is None:
            rotation_weight = np.ones(nj, np.float32)
        return cls(
            target_state=target_state,
            position_weight=jnp.asarray(position_weight, jnp.float32),
            rotation_weight=jnp.asarray(rotation_weight, jnp.float32),
            pos_wgt=jnp.asarray(pos_wgt, jnp.float32),
            rot_wgt=jnp.asarray(rot_wgt, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
            rotation_error_type=rotation_error_type,
        )


def _state_jacobian(self, character, ctx, jc):
    """Analytic rows for the matrix rotation type: joint origins are world
    points of their own joints; rotation-matrix columns are world directions."""
    from momentum_tpu.solver.analytic_jacobian import point_jacobian, vector_jacobian

    nj = self.target_state.shape[-2]
    idx = jnp.arange(nj, dtype=jnp.int32)
    t, q, _ = ss.split(ctx.skel_states)
    t_tgt, q_tgt, _ = ss.split(self.target_state)
    pos_diff = t - t_tgt
    j_pos = point_jacobian(jc, t, idx)  # (..., nJ, 3, J)
    r = quat.to_rotation_matrix(q)
    rot_diff = (r - quat.to_rotation_matrix(q_tgt)).reshape(
        r.shape[:-3] + (nj, 9))
    cols = [vector_jacobian(jc, r[..., k], idx) for k in range(3)]
    j_rot = jnp.stack(cols, axis=-2)  # (..., nJ, 3out, 3col, J)
    j_rot = j_rot.reshape(j_rot.shape[:-4] + (nj, 9, j_rot.shape[-1]))

    pos_s = jnp.sqrt(jnp.maximum(
        self.weight * K_STATE_POSITION_WEIGHT * self.pos_wgt * self.position_weight, 0.0))
    rot_s = jnp.sqrt(jnp.maximum(
        self.weight * K_STATE_ORIENTATION_WEIGHT * self.rot_wgt * self.rotation_weight, 0.0))
    rows = jnp.concatenate([
        (pos_s[:, None] * pos_diff).reshape(pos_diff.shape[:-2] + (-1,)),
        (rot_s[:, None] * rot_diff).reshape(rot_diff.shape[:-2] + (-1,)),
    ], axis=-1)
    j = jnp.concatenate([
        (pos_s[:, None, None] * j_pos).reshape(
            j_pos.shape[:-3] + (nj * 3, j_pos.shape[-1])),
        (rot_s[:, None, None] * j_rot).reshape(
            j_rot.shape[:-3] + (nj * 9, j_rot.shape[-1])),
    ], axis=-2)
    return rows, j, None


def _state_has_analytic(self):
    return self.rotation_error_type == "matrix"


StateErrorFunction.has_analytic_jacobian = property(_state_has_analytic)
StateErrorFunction.jacobian = _state_jacobian
