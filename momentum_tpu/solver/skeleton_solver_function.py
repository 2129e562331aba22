"""SkeletonSolverFunction: adapts a Character + error functions to the solver.

Reference: momentum/character_solver/skeleton_solver_function.h:21-95 — one FK
(+ one mesh-state update) per evaluation shared by all error functions, then a
loop over error functions. Here that becomes a pure function building an
`EvalContext` once; under jit, XLA CSEs the FK between `residual` and `error`
evaluations at the same parameters.

The residual vector is the static concatenation of every module's rows; its
Jacobian (via jax.linearize in the solvers) replaces the reference's
block-streaming protocol (solver_function.h:191-347) — on TPU one dense (R, P)
Jacobian contracted on the MXU beats streaming blocks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from momentum_tpu.character import fk
from momentum_tpu.character.character import Character
from momentum_tpu.character.skinning import skin_points, update_normals
from momentum_tpu.errors.base import EvalContext

__all__ = ["SkeletonSolverFunction"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkeletonSolverFunction:
    character: Character
    error_functions: tuple  # tuple of ErrorFunction pytrees
    # Use fused model-space Jacobians where modules provide them. Off by
    # default: at small problem sizes (nJ~24, C~24) XLA fuses the plain
    # joint-space path better (measured 15.4k vs 14.5k solves/s) and the
    # fused program compiles ~3x slower; enable for large rigs/constraint
    # counts where the (B,C,3,nJ*7) intermediate dominates HBM traffic.
    prefer_fused: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Force the AD (jax.linearize) Jacobian path even when every module has
    # an analytic one — for equivalence tests and A/B benchmarks.
    force_ad: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # Run the large normal-equation matmuls (Jacobian-factor assembly + JᵀJ
    # contraction) with bf16 inputs and f32 accumulation — the MXU precision
    # split (sequence_cholesky_solver.h:31-33's accumulate-high precedent,
    # inverted: compute low, accumulate high). Only affects normal_equations;
    # gate on the workload's convergence bar before enabling in production.
    ne_bf16: bool = dataclasses.field(default=False, metadata=dict(static=True))

    def context(self, model_params: jnp.ndarray) -> EvalContext:
        """One FK pass (+ mesh pose if any module needs it) — the shared state
        of skeleton_solver_function.cpp getError/getJacobian."""
        char = self.character
        jp = char.parameter_transform.apply(model_params)
        jp = char.limits.apply_passive(jp)
        nj = char.skeleton.num_joints
        states = fk.global_skel_states(
            char.skeleton, jp.reshape(jp.shape[:-1] + (nj, 7))
        )
        mesh_vertices = None
        mesh_normals = None
        rest_vertices = None
        if any(getattr(ef, "needs_mesh", False) for ef in self.error_functions):
            rest_vertices = char.mesh.vertices
            if char.blend_shape is not None and char.blend_shape_param_index is not None:
                coeffs = jnp.take(
                    model_params, jnp.asarray(char.blend_shape_param_index), axis=-1
                )
                rest_vertices = char.blend_shape.apply(coeffs)
            if char.face_expression_blend_shape is not None \
                    and char.face_expression_param_index is not None:
                fcoeffs = jnp.take(
                    model_params,
                    jnp.asarray(char.face_expression_param_index), axis=-1)
                rest_vertices = rest_vertices \
                    + char.face_expression_blend_shape.compute_deltas(fcoeffs)
            mesh_vertices = skin_points(
                char.skin_weights, states, char.inverse_bind_pose, rest_vertices
            )
            mesh_normals = update_normals(mesh_vertices, char.mesh.faces)
        return EvalContext(
            model_params=model_params,
            joint_params=jp,
            skel_states=states,
            mesh_vertices=mesh_vertices,
            mesh_normals=mesh_normals,
            rest_vertices=rest_vertices,
        )

    def residual(self, model_params: jnp.ndarray) -> jnp.ndarray:
        ctx = self.context(model_params)
        rows = [ef.residual(self.character, ctx) for ef in self.error_functions]
        if not rows:
            return jnp.zeros(model_params.shape[:-1] + (0,), model_params.dtype)
        return jnp.concatenate(rows, axis=-1)

    def error(self, model_params: jnp.ndarray) -> jnp.ndarray:
        """Exact robust energy Σ_ef weight·Σ w·ρ(‖f‖²)
        (skeleton_solver_function.cpp getError:64-82)."""
        ctx = self.context(model_params)
        total = jnp.zeros(model_params.shape[:-1], model_params.dtype)
        for ef in self.error_functions:
            total = total + ef.error(self.character, ctx)
        return total

    def gradient(self, model_params: jnp.ndarray) -> jnp.ndarray:
        return jax.grad(self.error)(model_params)

    # ---- analytic Jacobian fast path ----

    @property
    def fully_analytic(self) -> bool:
        if self.force_ad:
            return False
        return all(getattr(ef, "has_analytic_jacobian", False)
                   for ef in self.error_functions)

    def residual_and_jacobian(self, model_params: jnp.ndarray):
        """(rows (R,), J (R, P)) mixing analytic modules (chained through the
        dense parameter-transform matmul — the reference's sparse PT scatter,
        skeleton_derivative.cpp) with AD for modules lacking an analytic path.
        Replaces the P-tangent jacfwd: memory traffic drops from O(P·nJ) to
        O(C·nJ) per evaluation."""
        ctx = self.context(model_params)
        return self._rows_and_jacobian(ctx, self.error_functions, model_params)

    def _rows_and_jacobian(self, ctx, error_functions, model_params):
        from momentum_tpu.solver.analytic_jacobian import make_jacobian_context

        analytic = [ef for ef in error_functions
                    if getattr(ef, "has_analytic_jacobian", False)]
        ad_efs = [ef for ef in error_functions
                  if not getattr(ef, "has_analytic_jacobian", False)]

        rows_list = []
        j_list = []
        if analytic:
            jc = make_jacobian_context(self.character, ctx)
            pt_mat = self.character.parameter_transform.transform  # (nJ7, P)
            # fused modules first so rows and Jacobian blocks stay aligned
            use_fused = self.prefer_fused
            fused = [ef for ef in analytic
                     if use_fused and hasattr(ef, "jacobian_model")]
            fused_ids = {id(ef) for ef in fused}
            blockwise = [ef for ef in analytic if id(ef) not in fused_ids]
            for ef in fused:
                # straight to model space, no joint-space J materialized
                r, j_m = ef.jacobian_model(self.character, ctx, jc, pt_mat)
                rows_list.append(r)
                j_list.append(j_m)
            jp_blocks = []
            model_blocks = []
            for ef in blockwise:
                r, j_jp, j_model = ef.jacobian(self.character, ctx, jc)
                rows_list.append(r)
                p = model_params.shape[-1]
                jp_blocks.append(j_jp if j_jp is not None
                                 else jnp.zeros(r.shape + (pt_mat.shape[0],), r.dtype))
                model_blocks.append(j_model if j_model is not None
                                    else jnp.zeros(r.shape + (p,), r.dtype))
            if jp_blocks:
                j_jp_all = jnp.concatenate(jp_blocks, axis=-2)
                j_model_all = jnp.concatenate(model_blocks, axis=-2)
                j_list.append(
                    jnp.einsum("...rj,jp->...rp", j_jp_all, pt_mat) + j_model_all)
        if ad_efs:
            def ad_residual(x):
                c2 = self.context(x)
                return jnp.concatenate(
                    [ef.residual(self.character, c2) for ef in ad_efs], axis=-1)

            rows_ad, jvp = jax.linearize(ad_residual, model_params)
            eye = jnp.eye(model_params.shape[-1], dtype=model_params.dtype)
            if model_params.ndim > 1:
                j_ad = jax.vmap(lambda e: jvp(
                    jnp.broadcast_to(e, model_params.shape)))(eye)
                j_ad = jnp.moveaxis(j_ad, 0, -1)  # (..., R_ad, P)
            else:
                j_ad = jax.vmap(jvp)(eye).T  # (R_ad, P)
            rows_list.append(rows_ad)
            j_list.append(j_ad)
        return (jnp.concatenate(rows_list, axis=-1),
                jnp.concatenate(j_list, axis=-2))

    # ---- normal-equation fast path ----

    @property
    def has_structured_modules(self) -> bool:
        return any(ef.supports_normal_contrib(self.character)
                   for ef in self.error_functions)

    def normal_equations(self, model_params: jnp.ndarray):
        """(JᵀJ (..., P, P), Jᵀr (..., P), Σrows² (...,)) in one pass.

        Structured modules (pose prior, model-space limits) add their
        contributions directly via accumulate_normal — their rows never enter
        the dense Jacobian — while everything else goes through the fused
        analytic rows + one MXU contraction. This is the TPU shape of the
        reference's per-error-function getSolverDerivatives rank updates
        (gauss_newton_solver.cpp:113-221)."""
        from momentum_tpu.solver.analytic_jacobian import make_jacobian_context

        ctx = self.context(model_params)
        p = model_params.shape[-1]
        batch = model_params.shape[:-1]
        direct = [ef for ef in self.error_functions
                  if ef.supports_normal_contrib(self.character)]
        direct_ids = {id(ef) for ef in direct}
        dense = [ef for ef in self.error_functions if id(ef) not in direct_ids]

        mxu_dtype = jnp.bfloat16 if self.ne_bf16 else None
        jtj = jnp.zeros(batch + (p, p), model_params.dtype)
        jtr = jnp.zeros(batch + (p,), model_params.dtype)
        sq = jnp.zeros(batch, model_params.dtype)
        if dense:
            rows, j = self._rows_and_jacobian(ctx, dense, model_params)
            if mxu_dtype is not None:
                j16 = j.astype(mxu_dtype)
                jtj = jtj + jnp.einsum("...rp,...rq->...pq", j16, j16,
                                       preferred_element_type=jnp.float32)
            else:
                jtj = jtj + jnp.einsum("...rp,...rq->...pq", j, j)
            jtr = jtr + jnp.einsum("...rp,...r->...p", j, rows)
            sq = sq + jnp.sum(rows * rows, axis=-1)
        if direct:
            jc = make_jacobian_context(self.character, ctx)
            pt_mat = self.character.parameter_transform.transform
            acc = (jtj, jtr, sq)
            for ef in direct:
                acc = ef.accumulate_normal(self.character, ctx, jc, pt_mat,
                                           acc, mxu_dtype=mxu_dtype)
            jtj, jtr, sq = acc
        return jtj, jtr, sq

    def residual_sq(self, model_params: jnp.ndarray) -> jnp.ndarray:
        """Σ rows² without assembling the row vector (the GN surrogate energy
        used for LM acceptance when energy_from_residual)."""
        ctx = self.context(model_params)
        total = jnp.zeros(model_params.shape[:-1], model_params.dtype)
        for ef in self.error_functions:
            r = ef.residual(self.character, ctx)
            total = total + jnp.sum(r * r, axis=-1)
        return total
