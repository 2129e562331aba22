"""LimitErrorFunction: penalties for parameter-limit violations.

Reference: momentum/character_solver/limit_error_function.cpp. Per record the
raw residual r is zero inside the feasible region and linear outside; the
energy is kLimitWeight(=10, limit_error_function.h:91) · weight · Σ w_rec ·
ρ(r²), with ellipsoid records additionally scaled by kPositionWeight(=1e-4,
limit_error_function.cpp:21).

Residual forms (limit_error_function.cpp:32-193):
  MinMax        r = clip(θ_i, lo, hi) − θ_i                 (model param)
  MinMaxJoint   same over joint parameters
  Linear        r = θ_tgt·scale − offset − θ_ref   when θ_tgt ∈ [rmin, rmax)
  LinearJoint   same over joint parameters
  HalfPlane     r = min((p1, p2)·n − o, 0)
  Ellipsoid     r⃗ = worldPoint − worldProjectionOntoEllipsoidSurface (3 rows)

MinMaxJointPassive records contribute nothing here (they are pre-FK clamps,
ParameterLimits.apply_passive). The reference gates records by
enabledParameters/activeJointParams; here disabled-parameter columns are
masked at the solver level, which leaves the same optimum.

All record tables live in the character's ParameterLimits pytree (static
counts), so this module is pure index-free masked math.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from momentum_tpu.errors.base import ErrorFunction, EvalContext
from momentum_tpu.math import skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = ["LimitErrorFunction", "K_LIMIT_WEIGHT"]

K_LIMIT_WEIGHT = 10.0  # limit_error_function.h:91
_K_POSITION_WEIGHT = 1e-4  # limit_error_function.cpp:21 (ellipsoid records)


def _minmax_residual(vals, bounds):
    return jnp.clip(vals, bounds[..., 0], bounds[..., 1]) - vals


def _linear_residual(ref, tgt, scale, offset, rng):
    in_range = (tgt >= rng[..., 0]) & (tgt < rng[..., 1])
    r = tgt * scale - offset - ref
    return jnp.where(in_range, r, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LimitErrorFunction(ErrorFunction):
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    def _pieces(self, character, ctx: EvalContext):
        """-> list of (f (C,D), w (C,)) per record type, in a fixed order."""
        lim = character.limits
        mp = ctx.model_params
        jp = ctx.joint_params
        out = []
        if lim.minmax_index.shape[0]:
            vals = jnp.take(mp, lim.minmax_index, axis=-1)
            out.append((_minmax_residual(vals, lim.minmax_bounds)[..., None], lim.minmax_weight))
        if lim.minmax_joint_index.shape[0]:
            vals = jnp.take(jp, lim.minmax_joint_index, axis=-1)
            r = _minmax_residual(vals, lim.minmax_joint_bounds)
            w = lim.minmax_joint_weight * (1.0 - lim.minmax_joint_passive)
            out.append((r[..., None], w))
        if lim.linear_ref.shape[0]:
            r = _linear_residual(
                jnp.take(mp, lim.linear_ref, axis=-1),
                jnp.take(mp, lim.linear_tgt, axis=-1),
                lim.linear_scale, lim.linear_offset, lim.linear_range,
            )
            out.append((r[..., None], lim.linear_weight))
        if lim.linear_joint_ref.shape[0]:
            r = _linear_residual(
                jnp.take(jp, lim.linear_joint_ref, axis=-1),
                jnp.take(jp, lim.linear_joint_tgt, axis=-1),
                lim.linear_joint_scale, lim.linear_joint_offset, lim.linear_joint_range,
            )
            out.append((r[..., None], lim.linear_joint_weight))
        if lim.halfplane_idx1.shape[0]:
            p1 = jnp.take(mp, lim.halfplane_idx1, axis=-1)
            p2 = jnp.take(mp, lim.halfplane_idx2, axis=-1)
            d = p1 * lim.halfplane_normal[..., 0] + p2 * lim.halfplane_normal[..., 1] \
                - lim.halfplane_offset
            out.append((jnp.minimum(d, 0.0)[..., None], lim.halfplane_weight))
        if lim.ellipsoid_parent.shape[0]:
            # limit_error_function.cpp:173-193
            par = jnp.take(ctx.skel_states, lim.ellipsoid_parent, axis=-2)
            epar = jnp.take(ctx.skel_states, lim.ellipsoid_frame_parent, axis=-2)
            pos = ss.transform_points(par, lim.ellipsoid_point_offset)
            local = ss.transform_points(ss.inverse(epar), pos)
            ell_inv = lim.ellipsoid_inv
            ep = jnp.einsum("...ij,...j->...i", ell_inv[..., :3, :3], local) + ell_inv[..., :3, 3]
            nrm = ep / jnp.maximum(jnp.linalg.norm(ep, axis=-1, keepdims=True), 1e-12)
            ell = lim.ellipsoid_mat
            proj = jnp.einsum("...ij,...j->...i", ell[..., :3, :3], nrm) + ell[..., :3, 3]
            diff = pos - ss.transform_points(epar, proj)
            out.append((diff, lim.ellipsoid_weight * _K_POSITION_WEIGHT))
        return out

    def raw(self, character, ctx: EvalContext):
        raise NotImplementedError("LimitErrorFunction evaluates per record type")

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        total = jnp.zeros(ctx.model_params.shape[:-1], ctx.model_params.dtype)
        for f, w in self._pieces(character, ctx):
            sq = jnp.sum(f * f, axis=-1)
            total = total + jnp.sum(w * self.loss.value(sq), axis=-1)
        return K_LIMIT_WEIGHT * self.weight * total

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        rows = []
        for f, w in self._pieces(character, ctx):
            sq = jnp.sum(f * f, axis=-1)
            scale = jnp.sqrt(jnp.maximum(K_LIMIT_WEIGHT * self.weight * w, 0.0))
            if self.loss.alpha == 2.0:
                scale = scale * (1.0 / self.loss.c)
            else:
                scale = scale * jax.lax.stop_gradient(
                    jnp.sqrt(jnp.maximum(self.loss.deriv(sq), 0.0))
                )
            rows.append((scale[..., None] * f).reshape(f.shape[:-2] + (-1,)))
        if not rows:
            return jnp.zeros(ctx.model_params.shape[:-1] + (0,), ctx.model_params.dtype)
        return jnp.concatenate(rows, axis=-1)

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Analytic rows for every record type (limit_error_function.cpp
        gradient paths). Ellipsoid rows use the frozen-projection
        approximation: the surface projection point is held fixed during the
        linearization (first-order exact when the residual is normal to the
        surface)."""
        from momentum_tpu.solver.analytic_jacobian import point_jacobian

        lim = character.limits
        mp = ctx.model_params
        jp = ctx.joint_params
        p_dim = mp.shape[-1]
        jp_dim = jp.shape[-1]
        dtype = mp.dtype
        kw = K_LIMIT_WEIGHT * self.weight

        rows_l, jjp_l, jm_l = [], [], []

        def scale_of(w, sq):
            s = jnp.sqrt(jnp.maximum(kw * w, 0.0))
            if self.loss.alpha == 2.0:
                return s * (1.0 / self.loss.c)
            return s * jax.lax.stop_gradient(
                jnp.sqrt(jnp.maximum(self.loss.deriv(sq), 0.0)))

        batch = mp.shape[:-1]

        def add(r, w, j_jp=None, j_model=None):
            sq = r * r
            s = scale_of(w, sq)
            n = r.shape[-1]
            rows_l.append(s * r)
            jjp_l.append(jnp.zeros(batch + (n, jp_dim), dtype)
                         if j_jp is None else s[..., None] * j_jp)
            jm_l.append(jnp.zeros(batch + (n, p_dim), dtype)
                        if j_model is None else s[..., None] * j_model)

        if lim.minmax_index.shape[0]:
            vals = jnp.take(mp, lim.minmax_index, axis=-1)
            r = _minmax_residual(vals, lim.minmax_bounds)
            active = (r != 0).astype(dtype)
            m = lim.minmax_index.shape[0]
            jm = jnp.zeros(batch + (m, p_dim), dtype).at[
                ..., jnp.arange(m), lim.minmax_index].set(-active)
            add(r, lim.minmax_weight, j_model=jm)
        if lim.minmax_joint_index.shape[0]:
            vals = jnp.take(jp, lim.minmax_joint_index, axis=-1)
            r = _minmax_residual(vals, lim.minmax_joint_bounds)
            w = lim.minmax_joint_weight * (1.0 - lim.minmax_joint_passive)
            active = (r != 0).astype(dtype)
            m = lim.minmax_joint_index.shape[0]
            jj = jnp.zeros(batch + (m, jp_dim), dtype).at[
                ..., jnp.arange(m), lim.minmax_joint_index].set(-active)
            add(r, w, j_jp=jj)
        if lim.linear_ref.shape[0]:
            ref = jnp.take(mp, lim.linear_ref, axis=-1)
            tgt = jnp.take(mp, lim.linear_tgt, axis=-1)
            r = _linear_residual(ref, tgt, lim.linear_scale, lim.linear_offset,
                                 lim.linear_range)
            in_r = ((tgt >= lim.linear_range[..., 0])
                    & (tgt < lim.linear_range[..., 1])).astype(dtype)
            m = lim.linear_ref.shape[0]
            jm = jnp.zeros(batch + (m, p_dim), dtype)
            jm = jm.at[..., jnp.arange(m), lim.linear_tgt].add(in_r * lim.linear_scale)
            jm = jm.at[..., jnp.arange(m), lim.linear_ref].add(-in_r)
            add(r, lim.linear_weight, j_model=jm)
        if lim.linear_joint_ref.shape[0]:
            ref = jnp.take(jp, lim.linear_joint_ref, axis=-1)
            tgt = jnp.take(jp, lim.linear_joint_tgt, axis=-1)
            r = _linear_residual(ref, tgt, lim.linear_joint_scale,
                                 lim.linear_joint_offset, lim.linear_joint_range)
            in_r = ((tgt >= lim.linear_joint_range[..., 0])
                    & (tgt < lim.linear_joint_range[..., 1])).astype(dtype)
            m = lim.linear_joint_ref.shape[0]
            jj = jnp.zeros(batch + (m, jp_dim), dtype)
            jj = jj.at[..., jnp.arange(m), lim.linear_joint_tgt].add(in_r * lim.linear_joint_scale)
            jj = jj.at[..., jnp.arange(m), lim.linear_joint_ref].add(-in_r)
            add(r, lim.linear_joint_weight, j_jp=jj)
        if lim.halfplane_idx1.shape[0]:
            p1 = jnp.take(mp, lim.halfplane_idx1, axis=-1)
            p2 = jnp.take(mp, lim.halfplane_idx2, axis=-1)
            d = p1 * lim.halfplane_normal[..., 0] + p2 * lim.halfplane_normal[..., 1] \
                - lim.halfplane_offset
            r = jnp.minimum(d, 0.0)
            active = (d < 0).astype(dtype)
            m = lim.halfplane_idx1.shape[0]
            jm = jnp.zeros(batch + (m, p_dim), dtype)
            jm = jm.at[..., jnp.arange(m), lim.halfplane_idx1].add(active * lim.halfplane_normal[..., 0])
            jm = jm.at[..., jnp.arange(m), lim.halfplane_idx2].add(active * lim.halfplane_normal[..., 1])
            add(r, lim.halfplane_weight, j_model=jm)
        if lim.ellipsoid_parent.shape[0]:
            par = jnp.take(ctx.skel_states, lim.ellipsoid_parent, axis=-2)
            epar = jnp.take(ctx.skel_states, lim.ellipsoid_frame_parent, axis=-2)
            pos = ss.transform_points(par, lim.ellipsoid_point_offset)
            local = ss.transform_points(ss.inverse(epar), pos)
            ell_inv = lim.ellipsoid_inv
            ep = jnp.einsum("...ij,...j->...i", ell_inv[..., :3, :3], local) + ell_inv[..., :3, 3]
            nrm = ep / jnp.maximum(jnp.linalg.norm(ep, axis=-1, keepdims=True), 1e-12)
            ell = lim.ellipsoid_mat
            proj = jnp.einsum("...ij,...j->...i", ell[..., :3, :3], nrm) + ell[..., :3, 3]
            proj_world = ss.transform_points(epar, proj)
            diff = pos - proj_world
            sq = jnp.sum(diff * diff, axis=-1)
            w = lim.ellipsoid_weight * _K_POSITION_WEIGHT
            s = scale_of(w, sq)
            j_pos = point_jacobian(jc, pos, lim.ellipsoid_parent)
            j_proj = point_jacobian(jc, jax.lax.stop_gradient(proj_world),
                                    lim.ellipsoid_frame_parent)
            jdiff = j_pos - j_proj  # (E, 3, nJ7)
            e = lim.ellipsoid_parent.shape[0]
            rows_l.append((s[..., None] * diff).reshape(
                diff.shape[:-2] + (-1,)))
            jjp_l.append((s[..., None, None] * jdiff).reshape(
                jdiff.shape[:-3] + (3 * e, jp_dim)))
            jm_l.append(jnp.zeros(batch + (3 * e, p_dim), dtype))

        if not rows_l:
            z = jnp.zeros(batch + (0,), dtype)
            return (z, jnp.zeros(batch + (0, jp_dim), dtype),
                    jnp.zeros(batch + (0, p_dim), dtype))
        return (jnp.concatenate(rows_l, axis=-1),
                jnp.concatenate(jjp_l, axis=-2),
                jnp.concatenate(jm_l, axis=-2))

    has_normal_contrib = True

    def supports_normal_contrib(self, character) -> bool:
        """The direct path covers the model-parameter-space record types
        (minmax / linear / halfplane), whose rows have ≤ 2 nonzero Jacobian
        entries. Joint-space and ellipsoid records fall back to dense rows."""
        c = character.limits.counts
        return (c["minmax_joint"] + c["linear_joint"] + c["ellipsoid"]) == 0

    def accumulate_normal(self, character, ctx: EvalContext, jc, pt_mat, acc,
                          mxu_dtype=None):
        """Scatter-add JᵀJ/Jᵀr directly: every model-space limit row has at
        most two nonzero entries (column idx1/idx2 with values v1/v2), so its
        rank-1 update touches ≤ 4 JᵀJ cells — the reference's sparse
        getSolverDerivatives rank update (limit_error_function.cpp gradient
        paths) instead of L dense rows through the Jacobian."""
        jtj, jtr, sq = acc
        lim = character.limits
        mp = ctx.model_params
        dtype = mp.dtype
        kw = K_LIMIT_WEIGHT * self.weight

        def scale_of(w, sqv):
            s = jnp.sqrt(jnp.maximum(kw * w, 0.0))
            if self.loss.alpha == 2.0:
                return s * (1.0 / self.loss.c)
            return s * jax.lax.stop_gradient(
                jnp.sqrt(jnp.maximum(self.loss.deriv(sqv), 0.0)))

        i1_l, v1_l, i2_l, v2_l, r_l = [], [], [], [], []

        if lim.minmax_index.shape[0]:
            vals = jnp.take(mp, lim.minmax_index, axis=-1)
            r = _minmax_residual(vals, lim.minmax_bounds)
            s = scale_of(lim.minmax_weight, r * r)
            i1_l.append(lim.minmax_index)
            v1_l.append(-s * (r != 0).astype(dtype))
            i2_l.append(jnp.zeros_like(lim.minmax_index))
            v2_l.append(jnp.zeros_like(s * r))
            r_l.append(s * r)
        if lim.linear_ref.shape[0]:
            ref = jnp.take(mp, lim.linear_ref, axis=-1)
            tgt = jnp.take(mp, lim.linear_tgt, axis=-1)
            r = _linear_residual(ref, tgt, lim.linear_scale, lim.linear_offset,
                                 lim.linear_range)
            in_r = ((tgt >= lim.linear_range[..., 0])
                    & (tgt < lim.linear_range[..., 1])).astype(dtype)
            s = scale_of(lim.linear_weight, r * r)
            i1_l.append(lim.linear_tgt)
            v1_l.append(s * in_r * lim.linear_scale)
            i2_l.append(lim.linear_ref)
            v2_l.append(-s * in_r)
            r_l.append(s * r)
        if lim.halfplane_idx1.shape[0]:
            p1 = jnp.take(mp, lim.halfplane_idx1, axis=-1)
            p2 = jnp.take(mp, lim.halfplane_idx2, axis=-1)
            d = p1 * lim.halfplane_normal[..., 0] \
                + p2 * lim.halfplane_normal[..., 1] - lim.halfplane_offset
            r = jnp.minimum(d, 0.0)
            act = (d < 0).astype(dtype)
            s = scale_of(lim.halfplane_weight, r * r)
            i1_l.append(lim.halfplane_idx1)
            v1_l.append(s * act * lim.halfplane_normal[..., 0])
            i2_l.append(lim.halfplane_idx2)
            v2_l.append(s * act * lim.halfplane_normal[..., 1])
            r_l.append(s * r)

        if not r_l:
            return acc
        i1 = jnp.concatenate(i1_l)
        i2 = jnp.concatenate(i2_l)
        v1 = jnp.concatenate(v1_l, axis=-1)
        v2 = jnp.concatenate(v2_l, axis=-1)
        r = jnp.concatenate(r_l, axis=-1)
        jtr = jtr.at[..., i1].add(v1 * r)
        jtr = jtr.at[..., i2].add(v2 * r)
        jtj = jtj.at[..., i1, i1].add(v1 * v1)
        jtj = jtj.at[..., i2, i2].add(v2 * v2)
        jtj = jtj.at[..., i1, i2].add(v1 * v2)
        jtj = jtj.at[..., i2, i1].add(v1 * v2)
        sq = sq + jnp.sum(r * r, axis=-1)
        return jtj, jtr, sq

    def num_rows_for(self, character) -> int:
        c = character.limits.counts
        return (c["minmax"] + c["minmax_joint"] + c["linear"] + c["linear_joint"]
                + c["halfplane"] + 3 * c["ellipsoid"])

    @classmethod
    def create(cls, weight=1.0, loss=None):
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss())
