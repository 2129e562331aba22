"""Sequence (multi-frame) residual modules.

Reference: momentum/character_sequence_solver/sequence_error_function.h — a
residual spanning `numFrames()` contiguous frames, evaluated on spans of
per-frame params/skeleton states. Here each module declares a static `window`
W and evaluates on an EvalContext whose arrays carry a leading W axis.

Forms:
  ModelParametersSequenceErrorFunction
      (model_parameters_sequence_error_function.cpp:31-57; kMotionWeight=1e-1):
      error = weight·kMotion·Σ_i (w_i·(θ₁ᵢ − θ₀ᵢ))²            (window 2)
  StateSequenceErrorFunction (state_sequence_error_function.cpp:515-573):
      per joint: pos ‖t₁ − (T_tgt·T₀).t‖²·kPos(1e-3)·posWgt·wᵢ and
      rot ‖R₁ − R_tgt·R₀‖²·kOrient(1)·rotWgt·wᵢ                 (window 2)
  FiniteDifferenceSequenceErrorFunction
      (finite_difference_sequence_error_function.cpp:64-92):
      per joint: ‖Σ_k c_k·pos_k − target‖²·wᵢ, stencil c of length W
      AccelerationSequenceErrorFunction: c = [1, −2, 1]
      JerkSequenceErrorFunction:         c = [−1, 3, −3, 1]
  VelocityMagnitudeSequenceErrorFunction
      (velocity_magnitude_sequence_error_function.cpp): per joint
      (‖pos₁ − pos₀‖ − targetMagnitude)²·wᵢ                      (window 2)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import EvalContext
from momentum_tpu.math import quaternion as quat, skel_state as ss

__all__ = [
    "SequenceErrorFunction",
    "ModelParametersSequenceErrorFunction",
    "StateSequenceErrorFunction",
    "FiniteDifferenceSequenceErrorFunction",
    "AccelerationSequenceErrorFunction",
    "JerkSequenceErrorFunction",
    "VelocityMagnitudeSequenceErrorFunction",
]

K_MOTION_WEIGHT = 1e-1  # model_parameters_sequence_error_function.h:62
K_SEQ_POSITION_WEIGHT = 1e-3  # state_sequence_error_function.h:113
K_SEQ_ORIENTATION_WEIGHT = 1.0  # state_sequence_error_function.h:114


class SequenceErrorFunction:
    """Base: subclasses declare static `window` and implement residual/error on
    a window-stacked EvalContext (leading axis = window)."""

    window: int = 2

    def residual(self, character, ctxs: EvalContext) -> jnp.ndarray:
        raise NotImplementedError

    def error(self, character, ctxs: EvalContext) -> jnp.ndarray:
        r = self.residual(character, ctxs)
        return jnp.sum(r * r, axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ModelParametersSequenceErrorFunction(SequenceErrorFunction):
    pweight: jnp.ndarray  # (P,) per-parameter weights (inside the square)
    weight: jnp.ndarray

    window = 2

    def residual(self, character, ctxs: EvalContext) -> jnp.ndarray:
        diff = ctxs.model_params[..., 1, :] - ctxs.model_params[..., 0, :]
        scale = jnp.sqrt(jnp.maximum(self.weight * K_MOTION_WEIGHT, 0.0))
        return scale * self.pweight * diff

    @classmethod
    def create(cls, num_params=None, pweight=None, weight=1.0):
        if pweight is None:
            pweight = np.ones(num_params, np.float32)
        return cls(pweight=jnp.asarray(pweight, jnp.float32),
                   weight=jnp.asarray(weight, jnp.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StateSequenceErrorFunction(SequenceErrorFunction):
    # optional per-joint offset transform applied to the *previous* frame
    # (targetState_, state_sequence_error_function.cpp:535-537); identity default
    target_offset: jnp.ndarray  # (nJ, 8)
    position_weight: jnp.ndarray  # (nJ,)
    rotation_weight: jnp.ndarray  # (nJ,)
    pos_wgt: jnp.ndarray
    rot_wgt: jnp.ndarray
    weight: jnp.ndarray
    rotation_error_type: str = dataclasses.field(default="matrix", metadata=dict(static=True))

    window = 2

    def residual(self, character, ctxs: EvalContext) -> jnp.ndarray:
        prev = ctxs.skel_states[..., 0, :, :]
        nxt = ctxs.skel_states[..., 1, :, :]
        prev_t = ss.multiply(self.target_offset, prev)
        t0, q0, _ = ss.split(prev_t)
        t1, q1, _ = ss.split(nxt)
        pos_diff = t1 - t0
        if self.rotation_error_type == "logmap":
            rot_diff = quat.to_axis_angle(quat.multiply(quat.conjugate(q1), q0))
        else:
            rot_diff = quat.to_rotation_matrix(q1) - quat.to_rotation_matrix(q0)
            rot_diff = rot_diff.reshape(rot_diff.shape[:-2] + (9,))
        pos_s = jnp.sqrt(jnp.maximum(
            self.weight * K_SEQ_POSITION_WEIGHT * self.pos_wgt * self.position_weight, 0.0))
        rot_s = jnp.sqrt(jnp.maximum(
            self.weight * K_SEQ_ORIENTATION_WEIGHT * self.rot_wgt * self.rotation_weight, 0.0))
        return jnp.concatenate([
            (pos_s[..., None] * pos_diff).reshape(pos_diff.shape[:-2] + (-1,)),
            (rot_s[..., None] * rot_diff).reshape(rot_diff.shape[:-2] + (-1,)),
        ], axis=-1)

    @classmethod
    def create(cls, num_joints, position_weight=None, rotation_weight=None,
               target_offset=None, pos_wgt=1.0, rot_wgt=1.0, weight=1.0,
               rotation_error_type="matrix"):
        if position_weight is None:
            position_weight = np.ones(num_joints, np.float32)
        if rotation_weight is None:
            rotation_weight = np.ones(num_joints, np.float32)
        if target_offset is None:
            target_offset = np.asarray(ss.identity((num_joints,)))
        return cls(
            target_offset=jnp.asarray(target_offset, jnp.float32),
            position_weight=jnp.asarray(position_weight, jnp.float32),
            rotation_weight=jnp.asarray(rotation_weight, jnp.float32),
            pos_wgt=jnp.asarray(pos_wgt, jnp.float32),
            rot_wgt=jnp.asarray(rot_wgt, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
            rotation_error_type=rotation_error_type,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FiniteDifferenceSequenceErrorFunction(SequenceErrorFunction):
    stencil: jnp.ndarray  # (W,)
    jweight: jnp.ndarray  # (nJ,)
    target: jnp.ndarray  # (nJ, 3)
    weight: jnp.ndarray
    window: int = dataclasses.field(default=3, metadata=dict(static=True))

    def residual(self, character, ctxs: EvalContext) -> jnp.ndarray:
        t, _, _ = ss.split(ctxs.skel_states)  # (..., W, nJ, 3)
        deriv = jnp.einsum("k,...kji->...ji", self.stencil, t)
        f = deriv - self.target
        scale = jnp.sqrt(jnp.maximum(self.weight * self.jweight, 0.0))
        return (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))

    @classmethod
    def create(cls, stencil, num_joints, jweight=None, target=None, weight=1.0):
        stencil = np.asarray(stencil, np.float32)
        if jweight is None:
            jweight = np.ones(num_joints, np.float32)
        if target is None:
            target = np.zeros((num_joints, 3), np.float32)
        return cls(
            stencil=jnp.asarray(stencil),
            jweight=jnp.asarray(jweight, jnp.float32),
            target=jnp.asarray(target, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
            window=len(stencil),
        )


class AccelerationSequenceErrorFunction(FiniteDifferenceSequenceErrorFunction):
    """Stencil [1, −2, 1] (acceleration_sequence_error_function.h:17-24)."""

    @classmethod
    def create(cls, num_joints, jweight=None, target=None, weight=1.0):  # noqa: D417
        return FiniteDifferenceSequenceErrorFunction.create(
            [1.0, -2.0, 1.0], num_joints, jweight, target, weight)


class JerkSequenceErrorFunction(FiniteDifferenceSequenceErrorFunction):
    """Stencil [−1, 3, −3, 1] (jerk_sequence_error_function.h)."""

    @classmethod
    def create(cls, num_joints, jweight=None, target=None, weight=1.0):  # noqa: D417
        return FiniteDifferenceSequenceErrorFunction.create(
            [-1.0, 3.0, -3.0, 1.0], num_joints, jweight, target, weight)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VelocityMagnitudeSequenceErrorFunction(SequenceErrorFunction):
    jweight: jnp.ndarray  # (nJ,)
    target_magnitude: jnp.ndarray  # scalar or (nJ,)
    weight: jnp.ndarray

    window = 2

    def residual(self, character, ctxs: EvalContext) -> jnp.ndarray:
        t, _, _ = ss.split(ctxs.skel_states)
        vel = t[..., 1, :, :] - t[..., 0, :, :]
        mag = jnp.linalg.norm(vel + 1e-20, axis=-1)
        f = mag - self.target_magnitude
        scale = jnp.sqrt(jnp.maximum(self.weight * self.jweight, 0.0))
        return scale * f

    @classmethod
    def create(cls, num_joints, jweight=None, target_magnitude=0.0, weight=1.0):
        if jweight is None:
            jweight = np.ones(num_joints, np.float32)
        return cls(
            jweight=jnp.asarray(jweight, jnp.float32),
            target_magnitude=jnp.asarray(target_magnitude, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JointToJointSequenceErrorFunction(SequenceErrorFunction):
    """Relative joint placement consistency across adjacent frames
    (joint_to_joint_sequence_error_function.cpp): per constraint,
    rel_f = R_refᵀ(p_src − p_ref) evaluated at both frames;
    f = rel₁ − rel₀ (3 rows each)."""

    source: jnp.ndarray  # (C,)
    reference: jnp.ndarray  # (C,)
    source_offset: jnp.ndarray  # (C, 3)
    reference_offset: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray  # (C,)
    weight: jnp.ndarray

    window = 2

    def _rel(self, states):
        src = jnp.take(states, self.source, axis=-2)
        ref = jnp.take(states, self.reference, axis=-2)
        p_src = ss.transform_points(src, self.source_offset)
        p_ref = ss.transform_points(ref, self.reference_offset)
        _, q_ref, _ = ss.split(ref)
        return quat.rotate_vector(quat.conjugate(q_ref), p_src - p_ref)

    def residual(self, character, ctxs):
        rel0 = self._rel(ctxs.skel_states[..., 0, :, :])
        rel1 = self._rel(ctxs.skel_states[..., 1, :, :])
        f = rel1 - rel0
        scale = jnp.sqrt(jnp.maximum(self.weight * self.cweight, 0.0))
        return (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))

    @classmethod
    def create(cls, source, reference, source_offset, reference_offset,
               cweight=None, weight=1.0):
        source = np.asarray(source, np.int32)
        n = source.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        return cls(
            source=jnp.asarray(source),
            reference=jnp.asarray(reference, jnp.int32),
            source_offset=jnp.asarray(source_offset, jnp.float32).reshape(n, 3),
            reference_offset=jnp.asarray(reference_offset, jnp.float32).reshape(n, 3),
            cweight=jnp.asarray(cweight),
            weight=jnp.asarray(weight, jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexSequenceErrorFunction(SequenceErrorFunction):
    """Vertex velocity smoothness (vertex_sequence_error_function.cpp):
    per tracked vertex, f = v₁ − v₀ on the posed mesh (needs mesh)."""

    vertex_index: jnp.ndarray  # (C,)
    cweight: jnp.ndarray
    weight: jnp.ndarray

    window = 2
    needs_mesh = True

    def residual(self, character, ctxs):
        v0 = jnp.take(ctxs.mesh_vertices[..., 0, :, :], self.vertex_index, axis=-2)
        v1 = jnp.take(ctxs.mesh_vertices[..., 1, :, :], self.vertex_index, axis=-2)
        f = v1 - v0
        scale = jnp.sqrt(jnp.maximum(self.weight * self.cweight, 0.0))
        return (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))

    @classmethod
    def create(cls, vertex_index, cweight=None, weight=1.0):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        return cls(vertex_index=jnp.asarray(vertex_index),
                   cweight=jnp.asarray(cweight),
                   weight=jnp.asarray(weight, jnp.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SdfCollisionSequenceErrorFunction(SequenceErrorFunction):
    """Per-frame SDF penetration applied across the window
    (sdf_collision_sequence_error_function.cpp): f = min(sdf(v), 0) for each
    tracked vertex at each frame of the window."""

    sdf: object  # axel.SignedDistanceField
    vertex_index: jnp.ndarray
    cweight: jnp.ndarray
    weight: jnp.ndarray

    window = 2
    needs_mesh = True

    def residual(self, character, ctxs):
        v = jnp.take(ctxs.mesh_vertices, self.vertex_index, axis=-2)  # (..., W, C, 3)
        d = self.sdf.sample(v)
        f = jnp.minimum(d, 0.0)
        scale = jnp.sqrt(jnp.maximum(self.weight * self.cweight * 5e-3, 0.0))
        return (scale * f).reshape(f.shape[:-2] + (-1,))

    @classmethod
    def create(cls, sdf, vertex_index, cweight=None, weight=1.0):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        return cls(sdf=sdf, vertex_index=jnp.asarray(vertex_index),
                   cweight=jnp.asarray(cweight),
                   weight=jnp.asarray(weight, jnp.float32))
