"""Joint-to-joint residual modules (relations between two joints' frames).

Reference forms (momentum/character_solver/):
  JointToJointPositionErrorFunction (joint_to_joint_position_error_function.cpp:86-104):
      f = R_refᵀ·(T_src·srcOffset − T_ref·refOffset) − target   (3 rows)
  JointToJointDistanceErrorFunction (joint_to_joint_distance_error_function.cpp:60-76;
      kDistanceWeight = 1e-2, .h:117):
      f = ‖p1 − p2‖ − target                                    (1 row)
  JointToJointOrientationErrorFunction (joint_to_joint_orientation_error_function.cpp:88-96):
      f = R_refᵀ·R_src − R_target (flattened)                    (9 rows)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import EvalContext, VectorErrorFunction, pad_rows
from momentum_tpu.math import quaternion as quat, skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = [
    "JointToJointPositionErrorFunction",
    "JointToJointDistanceErrorFunction",
    "JointToJointOrientationErrorFunction",
]

K_J2J_DISTANCE_WEIGHT = 1e-2  # joint_to_joint_distance_error_function.h:117


def _pad_fields(cap, **arrays):
    return {k: jnp.asarray(pad_rows(v, cap)) for k, v in arrays.items()}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _PairBase(VectorErrorFunction):
    source: jnp.ndarray  # (C,) int32
    reference: jnp.ndarray  # (C,) int32
    source_offset: jnp.ndarray  # (C, 3)
    reference_offset: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    def constraint_count(self) -> int:
        return self.source.shape[0]

    def _points(self, ctx: EvalContext):
        src = jnp.take(ctx.skel_states, self.source, axis=-2)
        ref = jnp.take(ctx.skel_states, self.reference, axis=-2)
        p_src = ss.transform_points(src, self.source_offset)
        p_ref = ss.transform_points(ref, self.reference_offset)
        return src, ref, p_src, p_ref


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JointToJointPositionErrorFunction(_PairBase):
    target: jnp.ndarray = dataclasses.field(default=None)  # (C, 3) in ref frame

    D = 3

    def raw(self, character, ctx: EvalContext):
        src, ref, p_src, p_ref = self._points(ctx)
        _, q_ref, _ = ss.split(ref)
        rel = quat.rotate_vector(quat.conjugate(q_ref), p_src - p_ref)
        return rel - self.target, self.cweight

    @classmethod
    def create(cls, source, reference, source_offset, reference_offset, target,
               cweight=None, weight=1.0, loss=None, capacity=None):
        source = np.asarray(source, np.int32)
        n = source.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            source=source,
            reference=np.asarray(reference, np.int32),
            source_offset=np.asarray(source_offset, np.float32).reshape(n, 3),
            reference_offset=np.asarray(reference_offset, np.float32).reshape(n, 3),
            target=np.asarray(target, np.float32).reshape(n, 3),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JointToJointDistanceErrorFunction(_PairBase):
    target: jnp.ndarray = dataclasses.field(default=None)  # (C,) distances

    D = 1

    def raw(self, character, ctx: EvalContext):
        _, _, p_src, p_ref = self._points(ctx)
        dist = jnp.linalg.norm(p_src - p_ref + 1e-20, axis=-1)
        return (dist - self.target)[..., None], self.cweight * K_J2J_DISTANCE_WEIGHT

    @classmethod
    def create(cls, source, reference, source_offset, reference_offset, target,
               cweight=None, weight=1.0, loss=None, capacity=None):
        source = np.asarray(source, np.int32)
        n = source.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            source=source,
            reference=np.asarray(reference, np.int32),
            source_offset=np.asarray(source_offset, np.float32).reshape(n, 3),
            reference_offset=np.asarray(reference_offset, np.float32).reshape(n, 3),
            target=np.asarray(target, np.float32).reshape(n),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JointToJointOrientationErrorFunction(VectorErrorFunction):
    source: jnp.ndarray
    reference: jnp.ndarray
    target: jnp.ndarray  # (C, 4) target relative rotation quaternion
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 9

    def constraint_count(self) -> int:
        return self.source.shape[0]

    def raw(self, character, ctx: EvalContext):
        src = jnp.take(ctx.skel_states, self.source, axis=-2)
        ref = jnp.take(ctx.skel_states, self.reference, axis=-2)
        _, q_src, _ = ss.split(src)
        _, q_ref, _ = ss.split(ref)
        rel = quat.multiply(quat.conjugate(q_ref), q_src)
        diff = quat.to_rotation_matrix(rel) - quat.to_rotation_matrix(self.target)
        return diff.reshape(diff.shape[:-2] + (9,)), self.cweight

    @classmethod
    def create(cls, source, reference, target, cweight=None, weight=1.0, loss=None,
               capacity=None):
        source = np.asarray(source, np.int32)
        n = source.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        ident = np.tile(np.asarray([0, 0, 0, 1], np.float32), (cap, 1))
        tgt = ident.copy()
        tgt[:n] = np.asarray(target, np.float32).reshape(n, 4)
        f = _pad_fields(cap, source=source, reference=np.asarray(reference, np.int32),
                        cweight=cweight)
        return cls(target=jnp.asarray(tgt), weight=jnp.asarray(weight, jnp.float32),
                   loss=loss or GeneralizedLoss(), **f)


# ---------------------------------------------------------------------------
# analytic Jacobians
# ---------------------------------------------------------------------------

def _finish_pair(self, f, j, w):
    import jax

    sq = jnp.sum(f * f, axis=-1)
    scale = self._row_scale(w, sq)
    rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
    jrows = (scale[..., None, None] * j).reshape(
        j.shape[:-3] + (rows.shape[-1], j.shape[-1]))
    return rows, jrows, None


def _j2j_position_jacobian(self, character, ctx, jc):
    """rel = R_refᵀ(p_s − p_r); d rel = R_refᵀ(dp_s − dp_r − ω_ref×(p_s−p_r))
    where ω_ref×diff is vector_jacobian of the world diff attached to ref."""
    from momentum_tpu.solver.analytic_jacobian import point_jacobian, vector_jacobian

    src, ref, p_src, p_ref = self._points(ctx)
    _, q_ref, _ = ss.split(ref)
    diff = p_src - p_ref
    j_ps = point_jacobian(jc, p_src, self.source)
    j_pr = point_jacobian(jc, p_ref, self.reference)
    j_rot = vector_jacobian(jc, diff, self.reference)
    j_world = j_ps - j_pr - j_rot  # (C, 3, J)
    r_ref_t = jnp.swapaxes(quat.to_rotation_matrix(q_ref), -1, -2)
    j = jnp.einsum("...cij,...cjk->...cik", r_ref_t, j_world)
    f = quat.rotate_vector(quat.conjugate(q_ref), diff) - self.target
    return _finish_pair(self, f, j, self.cweight)


def _j2j_distance_jacobian(self, character, ctx, jc):
    from momentum_tpu.solver.analytic_jacobian import point_jacobian

    _, _, p_src, p_ref = self._points(ctx)
    dvec = p_src - p_ref
    dist = jnp.linalg.norm(dvec + 1e-20, axis=-1)
    dhat = dvec / jnp.maximum(dist, 1e-12)[..., None]
    j_ps = point_jacobian(jc, p_src, self.source)
    j_pr = point_jacobian(jc, p_ref, self.reference)
    j = jnp.einsum("...ci,...cij->...cj", dhat, j_ps - j_pr)[..., None, :]
    f = (dist - self.target)[..., None]
    return _finish_pair(self, f, j, self.cweight * K_J2J_DISTANCE_WEIGHT)


def _j2j_orientation_jacobian(self, character, ctx, jc):
    """Columns c_j = R_refᵀ·w_j with w_j = R_src·e_j:
    d c_j = R_refᵀ(dw_j − ω_ref×w_j)."""
    from momentum_tpu.solver.analytic_jacobian import vector_jacobian

    src = jnp.take(ctx.skel_states, self.source, axis=-2)
    ref = jnp.take(ctx.skel_states, self.reference, axis=-2)
    _, q_src, _ = ss.split(src)
    _, q_ref, _ = ss.split(ref)
    r_src = quat.to_rotation_matrix(q_src)
    r_ref_t = jnp.swapaxes(quat.to_rotation_matrix(q_ref), -1, -2)
    rel = jnp.einsum("...cij,...cjk->...cik", r_ref_t, r_src)
    f = (rel - quat.to_rotation_matrix(self.target)).reshape(rel.shape[:-2] + (9,))
    cols = []
    for jcol in range(3):
        w = r_src[..., jcol]
        jw = vector_jacobian(jc, w, self.source) - vector_jacobian(jc, w, self.reference)
        cols.append(jnp.einsum("...cij,...cjk->...cik", r_ref_t, jw))
    j_full = jnp.stack(cols, axis=-2)  # (..., C, 3row, 3col, J)
    c = self.source.shape[0]
    j = j_full.reshape(j_full.shape[:-4] + (c * 9, j_full.shape[-1]))
    return _finish_pair(self, f, j, self.cweight)


JointToJointPositionErrorFunction.has_analytic_jacobian = True
JointToJointPositionErrorFunction.jacobian = _j2j_position_jacobian
JointToJointDistanceErrorFunction.has_analytic_jacobian = True
JointToJointDistanceErrorFunction.jacobian = _j2j_distance_jacobian
JointToJointOrientationErrorFunction.has_analytic_jacobian = True
JointToJointOrientationErrorFunction.jacobian = _j2j_orientation_jacobian
