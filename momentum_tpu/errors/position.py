"""Position, orientation, and model-parameter residual modules.

References:
  PositionErrorFunction  — character_solver/position_error_function.{h,cpp}:15-27
      f_c = WorldTransform(parent_c) · offset_c − target_c          (3 rows)
  OrientationErrorFunction — character_solver/orientation_error_function.cpp:15-40
      f_c = R_world(parent_c) · R_offset_c − R_target_c (flattened)  (9 rows)
  ModelParametersErrorFunction — character_solver/model_parameters_error_function.h
      f_p = w_p · (θ_p − target_p), one row per model parameter.

All constraint tables are padded to a static capacity with weight-0 rows.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import ErrorFunction, EvalContext, VectorErrorFunction
from momentum_tpu.math import quaternion as quat, skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = [
    "PositionErrorFunction",
    "OrientationErrorFunction",
    "ModelParametersErrorFunction",
]


_LN2 = 0.6931471805599453  # scale is log2-parameterized (joint_state.cpp:22-62)


def _pad_rows(arr: np.ndarray, capacity: int) -> np.ndarray:
    out = np.zeros((capacity,) + arr.shape[1:], arr.dtype)
    out[: arr.shape[0]] = arr
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PositionErrorFunction(VectorErrorFunction):
    """3D point → target constraints ("locator" style)."""

    parent: jnp.ndarray  # (C,) int32 joint index
    offset: jnp.ndarray  # (C, 3) point in joint-local frame
    target: jnp.ndarray  # (C, 3) world-space target
    cweight: jnp.ndarray  # (C,) per-constraint weight (0 = padding)
    weight: jnp.ndarray  # scalar global weight
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 3

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def raw(self, character, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)  # (C, 8)
        world = ss.transform_points(states, self.offset)
        return world - self.target, self.cweight

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Analytic rows + d(rows)/d(joint params)
        (position path of skeleton_derivative.cpp)."""
        from momentum_tpu.solver.analytic_jacobian import point_jacobian

        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        world = ss.transform_points(states, self.offset)
        f = world - self.target
        sq = jnp.sum(f * f, axis=-1)
        scale = self._row_scale(self.cweight, sq)
        j_pt = point_jacobian(jc, world, self.parent)  # (..., C, 3, nJ7)
        rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
        j = (scale[..., None, None] * j_pt).reshape(
            j_pt.shape[:-3] + (rows.shape[-1], j_pt.shape[-1]))
        return rows, j, None

    def jacobian_model(self, character, ctx: EvalContext, jc, pt_mat):
        """Fused rows + d(rows)/d(model params) — never materializes the
        joint-space Jacobian (analytic_jacobian.fused_point_jacobian_model).
        MOMENTUM_TPU_FUSED_STACKED=1 selects the stacked-factor contraction
        (one mask matmul) — measured SLOWER (8.4 → 13.7 ms/iter, round-5 A/B
        in docs/BENCHMARKS.md: the 12-slot concat is a J-sized copy and the
        merged einsum loses the per-term fusion). Default 0; kept for A/B."""
        import os as _os

        from momentum_tpu.solver.analytic_jacobian import (
            fused_point_jacobian_model, fused_point_jacobian_model_merged,
            fused_point_jacobian_model_stacked)

        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        world = ss.transform_points(states, self.offset)
        f = world - self.target
        sq = jnp.sum(f * f, axis=-1)
        scale = self._row_scale(self.cweight, sq)
        if _os.environ.get("MOMENTUM_TPU_FUSED_STACKED", "0") != "0":
            fused = fused_point_jacobian_model_stacked
        elif _os.environ.get("MOMENTUM_TPU_FUSED_MERGED", "1") != "0":
            # two mask matmuls instead of four (linearity reassociation);
            # round-5 A/B in docs/BENCHMARKS.md
            fused = fused_point_jacobian_model_merged
        else:
            fused = fused_point_jacobian_model
        j = fused(jc, world, self.parent, pt_mat, scale=scale)
        rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
        j = j.reshape(j.shape[:-3] + (rows.shape[-1], pt_mat.shape[1]))
        return rows, j

    has_normal_contrib = True

    def accumulate_normal(self, character, ctx: EvalContext, jc, pt_mat, acc,
                          mxu_dtype=None):
        """Closed-form position-row JᵀJ/Jᵀr from ONE combined mask matmul.

        The position row block is affine in the constraint point p_c:

            J_c = Ã_c + B̃_c × p_c + ln2·p_c·ũ_c

        with (Ã, B̃, ũ) = mask @ (A, B, u) for per-joint factors
            A_j = transAxis·PT_t − (rotAxis·PT_r)×t_j − ln2·t_j⊗PT_s
            B_j = rotAxis·PT_r,   u_j = ln2·PT_s
        stacked into one (nJ, 7, P) factor, so the reference's rank-update
        accumulation (skeleton_error_function.h getSolverDerivatives) becomes
        a single (C, nJ)×(nJ, 7P) MXU matmul + an elementwise cross + one
        (3C, P)-wide JᵀJ contraction — no (B, nJ, 3, P) temporary trio and no
        Jacobian handed back to the solver. Position path of
        skeleton_derivative.cpp, reassociated.

        mxu_dtype (e.g. bfloat16): run the two large matmuls with inputs cast
        to that dtype and f32 accumulation (the MXU precision split of
        sequence_cholesky_solver.h:31-33, inverted: compute low, accumulate
        high)."""
        jtj, jtr, sq_acc = acc
        nj = jc.anc_mask.shape[0]
        p_dim = pt_mat.shape[1]
        ptj = pt_mat.reshape(nj, 7, p_dim)
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        world = ss.transform_points(states, self.offset)  # (..., C, 3)
        f = world - self.target
        sqe = jnp.sum(f * f, axis=-1)
        scale = self._row_scale(self.cweight, sqe)  # (..., C)
        mask = jnp.take(jc.anc_mask, self.parent, axis=1).T  # (C, nJ)
        mask = mask * scale[..., :, None]  # fold row scale into the mask

        t = jc.joint_pos  # (..., nJ, 3)
        a_t = jnp.einsum("...nij,njp->...nip", jc.trans_axis, ptj[:, :3])
        d_r = jnp.einsum("...nwk,nkp->...nwp", jc.rot_axis, ptj[:, 3:6])
        a = (a_t
             - jnp.cross(d_r, t[..., :, :, None], axisa=-2, axisb=-2, axisc=-2)
             - _LN2 * t[..., :, :, None] * ptj[:, 6][:, None, :])
        u = jnp.broadcast_to(_LN2 * ptj[:, 6:7, :], a.shape[:-2] + (1, p_dim))
        g = jnp.concatenate([a, d_r, u], axis=-2)  # (..., nJ, 7, P)

        kw = {}
        if mxu_dtype is not None:
            mask = mask.astype(mxu_dtype)
            g = g.astype(mxu_dtype)
            kw = dict(preferred_element_type=jnp.float32)
        gt = jnp.einsum("...cn,...nap->...cap", mask, g, **kw)  # (..., C, 7, P)
        jbar = (gt[..., :3, :]
                + jnp.cross(gt[..., 3:6, :], world[..., :, :, None],
                            axisa=-2, axisb=-2, axisc=-2)
                + world[..., :, :, None] * gt[..., 6:7, :])  # (..., C, 3, P)
        r = scale[..., None] * f  # (..., C, 3)
        if mxu_dtype is not None:
            jb = jbar.astype(mxu_dtype)
            jtj = jtj + jnp.einsum("...cvp,...cvq->...pq", jb, jb,
                                   preferred_element_type=jnp.float32)
        else:
            jtj = jtj + jnp.einsum("...cvp,...cvq->...pq", jbar, jbar)
        jtr = jtr + jnp.einsum("...cvp,...cv->...p", jbar, r)
        sq_acc = sq_acc + jnp.sum(scale * scale * sqe, axis=-1)
        return jtj, jtr, sq_acc

    @classmethod
    def create(cls, parent, offset, target, cweight=None, weight=1.0, loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        offset = np.asarray(offset, np.float32).reshape(n, 3)
        target = np.asarray(target, np.float32).reshape(n, 3)
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            parent=jnp.asarray(_pad_rows(parent, cap)),
            offset=jnp.asarray(_pad_rows(offset, cap)),
            target=jnp.asarray(_pad_rows(target, cap)),
            cweight=jnp.asarray(_pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OrientationErrorFunction(VectorErrorFunction):
    """Match a joint's world rotation (with local offset) to a target rotation.

    The raw residual is the 9-entry matrix difference, matching
    orientation_error_function.cpp:15-40.
    """

    parent: jnp.ndarray  # (C,) int32
    offset: jnp.ndarray  # (C, 4) quaternion offset in joint frame
    target: jnp.ndarray  # (C, 4) target world quaternion
    cweight: jnp.ndarray  # (C,)
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 9

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def raw(self, character, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        _, q, _ = ss.split(states)
        r_world = quat.to_rotation_matrix(quat.multiply(q, self.offset))
        r_target = quat.to_rotation_matrix(self.target)
        diff = r_world - r_target
        return diff.reshape(diff.shape[:-2] + (9,)), self.cweight

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Each column of R_world·R_offset is a world direction; its joint
        derivative is rotationAxis × column (orientation path of
        skeleton_derivative.cpp)."""
        from momentum_tpu.solver.analytic_jacobian import vector_jacobian

        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        _, q, _ = ss.split(states)
        r_world = quat.to_rotation_matrix(quat.multiply(q, self.offset))
        diff = r_world - quat.to_rotation_matrix(self.target)
        f = diff.reshape(diff.shape[:-2] + (9,))
        sq = jnp.sum(f * f, axis=-1)
        scale = self._row_scale(self.cweight, sq)
        c = self.parent.shape[0]
        # d r[i, j] — column j is the direction; stack (C, 3out_i, 3col_j, nJ7)
        jcols = [vector_jacobian(jc, r_world[..., j], self.parent) for j in range(3)]
        # (..., C, 3out, 3col, nJ7); index [..., i, j, :] = d r[i, j] so the
        # row-major flatten (i*3 + j) matches raw()
        j_full = jnp.stack(jcols, axis=-2)
        rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
        j = (scale[..., None, None, None] * j_full).reshape(
            j_full.shape[:-4] + (rows.shape[-1], j_full.shape[-1]))
        return rows, j, None

    def jacobian_model(self, character, ctx: EvalContext, jc, pt_mat):
        """Fused model-space orientation Jacobian: each R column's derivative
        axis × col reassociates to (Σ m·axis·PT) × col."""
        from momentum_tpu.solver.analytic_jacobian import (
            fused_vector_jacobian_model,
        )

        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        _, q, _ = ss.split(states)
        r_world = quat.to_rotation_matrix(quat.multiply(q, self.offset))
        diff = r_world - quat.to_rotation_matrix(self.target)
        f = diff.reshape(diff.shape[:-2] + (9,))
        sq = jnp.sum(f * f, axis=-1)
        scale = self._row_scale(self.cweight, sq)
        jcols = [fused_vector_jacobian_model(
            jc, r_world[..., j], self.parent, pt_mat, scale=scale)
            for j in range(3)]
        j_full = jnp.stack(jcols, axis=-2)  # (..., C, 3out, 3col, P)
        c = self.parent.shape[0]
        rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
        j = j_full.reshape(j_full.shape[:-4] + (c * 9, pt_mat.shape[1]))
        return rows, j

    has_normal_contrib = True

    def accumulate_normal(self, character, ctx: EvalContext, jc, pt_mat, acc,
                          mxu_dtype=None):
        """Closed-form JᵀJ/Jᵀr without the 9-row Jacobian.

        Every row block is J_c = [v_j]-cross structure: row (i,j) equals
        (h1 × v_j)_i with h1 = scale·(Σ_n m·rotAxis·PT) (the fused rotation
        factor) and v_j the j-th COLUMN of the orthonormal R_world. Using
        Σ_j v_j v_jᵀ = R Rᵀ = I and Σ_j ‖v_j‖² = 3:

            JᵀJ = 3·h1ᵀh1 − h1ᵀ(Σ_j v_j v_jᵀ)h1 = 2·h1ᵀh1
            Jᵀr = h1ᵀ · Σ_j (f_j × v_j),  f_j = col j of scale·(R_w − R_t)

        i.e. the 9C rows contract to a 3C-wide MXU product — a 3× smaller
        contraction and no (B, C, 9, P) Jacobian in HBM. Orientation path of
        skeleton_derivative.cpp, reassociated."""
        from momentum_tpu.solver.analytic_jacobian import fused_rotation_factor

        jtj, jtr, sq = acc
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        _, q, _ = ss.split(states)
        r_world = quat.to_rotation_matrix(quat.multiply(q, self.offset))
        diff = r_world - quat.to_rotation_matrix(self.target)  # (..., C, 3out, 3col)
        f9 = diff.reshape(diff.shape[:-2] + (9,))
        sqe = jnp.sum(f9 * f9, axis=-1)
        scale = self._row_scale(self.cweight, sqe)
        h1 = fused_rotation_factor(jc, self.parent, pt_mat, scale=scale)
        if mxu_dtype is not None:
            h = h1.astype(mxu_dtype)
            jtj = jtj + 2.0 * jnp.einsum("...cwp,...cwq->...pq", h, h,
                                         preferred_element_type=jnp.float32)
        else:
            jtj = jtj + 2.0 * jnp.einsum("...cwp,...cwq->...pq", h1, h1)
        # g_c = Σ_j v_j × f_j with f_j, v_j the j-th COLUMNS (axis -1)
        g = jnp.sum(
            jnp.cross(r_world, scale[..., None, None] * diff,
                      axisa=-2, axisb=-2, axisc=-2),
            axis=-1)  # (..., C, 3)
        jtr = jtr + jnp.einsum("...cwp,...cw->...p", h1, g)
        sq = sq + jnp.sum(scale * scale * sqe, axis=-1)
        return jtj, jtr, sq

    @classmethod
    def create(cls, parent, target, offset=None, cweight=None, weight=1.0, loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        target = np.asarray(target, np.float32).reshape(n, 4)
        if offset is None:
            offset = np.tile(np.asarray([0, 0, 0, 1], np.float32), (n, 1))
        else:
            offset = np.asarray(offset, np.float32).reshape(n, 4)
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        ident = np.tile(np.asarray([0, 0, 0, 1], np.float32), (cap, 1))
        off_p = ident.copy()
        off_p[:n] = offset
        tgt_p = ident.copy()
        tgt_p[:n] = target
        return cls(
            parent=jnp.asarray(_pad_rows(parent, cap)),
            offset=jnp.asarray(off_p),
            target=jnp.asarray(tgt_p),
            cweight=jnp.asarray(_pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ModelParametersErrorFunction(ErrorFunction):
    """L2 regularizer pulling model parameters toward a target pose
    (model_parameters_error_function.h: error = weight·Σ w_p·(θ_p − t_p)²).

    Implemented as one 1-D residual row per parameter; loss is always L2
    (matching the reference, which has no robust loss here).
    """

    target: jnp.ndarray  # (P,)
    pweight: jnp.ndarray  # (P,) per-parameter weights (0 disables)
    weight: jnp.ndarray

    def raw(self, character, ctx: EvalContext):
        f = (ctx.model_params - self.target)[..., None]  # (P, 1)
        return f, self.pweight

    def num_rows(self) -> int:
        return self.target.shape[0]

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        f, w = self.raw(character, ctx)
        scale = jnp.sqrt(jnp.maximum(self.weight * w, 0.0))
        return (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        f, w = self.raw(character, ctx)
        return self.weight * jnp.sum(w * jnp.sum(f * f, axis=-1), axis=-1)

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Direct model-parameter rows: J = diag(scale)."""
        scale = jnp.sqrt(jnp.maximum(self.weight * self.pweight, 0.0))
        rows = scale * (ctx.model_params - self.target)
        j_model = jnp.broadcast_to(jnp.diag(scale), rows.shape + rows.shape[-1:])
        return rows, None, j_model

    @classmethod
    def create(cls, target, pweight=None, weight=1.0):
        target = np.asarray(target, np.float32)
        if pweight is None:
            pweight = np.ones_like(target)
        return cls(
            target=jnp.asarray(target),
            pweight=jnp.asarray(pweight, np.float32),
            weight=jnp.asarray(weight, jnp.float32),
        )
