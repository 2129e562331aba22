"""Error-function (residual module) protocol.

The reference's SkeletonErrorFunctionT (momentum/character_solver/
skeleton_error_function.h:19-150) is a virtual interface with
getError/getGradient/getJacobian. The TPU-native shape is different: every
error function is a frozen *pytree* holding padded constraint arrays, and
exposes two pure functions of an `EvalContext`:

    raw(ctx)       -> (f, w)   raw residual vectors (C, D) + constraint weights (C,)
    residual(ctx)  -> (C*D,)   GN residual rows, scaled by sqrt(weight · w · ρ'(‖f‖²))
    error(ctx)     -> scalar   exact energy  weight · Σ_c w_c · ρ(‖f_c‖²)

Derivatives come from JAX AD through `residual` — the chain walk the reference
hand-codes in SkeletonDerivativeT (skeleton_derivative.cpp) is replaced by
jacfwd through the (lifted) FK, which XLA turns into batched dense work on the
MXU. The robust-loss row scaling is wrapped in `stop_gradient` so the
linearization matches the reference's IRLS-style Gauss-Newton Jacobian
(joint_error_function-inl.h:179-225: rows are sqrt(w·dloss)·df/dθ with the
weight treated as constant).

Padding convention: every constraint table has a static capacity; unused rows
have weight 0 and parent index 0, so evaluation is dense masked math (the SoA
layout precedent is the reference's SIMD path,
character_solver_simd/simd_position_error_function.h:22-73).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = ["EvalContext", "ErrorFunction", "VectorErrorFunction",
           "UnionErrorFunction", "pad_rows"]


def pad_rows(arr, capacity: int, fill=0):
    """Pad a leading-axis table to a static capacity (default zero-fill)."""
    import numpy as np

    arr = np.asarray(arr)
    out = np.full((capacity,) + arr.shape[1:], fill, arr.dtype)
    out[: arr.shape[0]] = arr
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EvalContext:
    """Per-evaluation state shared by all error functions (one FK + one skinning
    pass per solver iteration — mirrors SkeletonSolverFunctionT's shared
    SkeletonState/MeshState, skeleton_solver_function.h:21-95)."""

    model_params: jnp.ndarray  # (P,)
    joint_params: jnp.ndarray  # (nJ*7,)
    skel_states: jnp.ndarray  # (nJ, 8) global skeleton states
    mesh_vertices: Optional[jnp.ndarray] = None  # (V, 3) posed, if mesh in play
    mesh_normals: Optional[jnp.ndarray] = None  # (V, 3)
    rest_vertices: Optional[jnp.ndarray] = None  # (V, 3) post-blendshape rest mesh


class ErrorFunction:
    """Base for all residual modules.

    Subclasses are `@jax.tree_util.register_dataclass` frozen dataclasses with:
      * array fields for constraint data (targets, offsets, weights...)
      * a `weight` scalar array (the error function's global weight, traced so
        differentiable-IK can expose gradients to it)
      * a static `loss` GeneralizedLoss field

    and implement `raw(character, ctx) -> (f, w)` with f (C, D), w (C,).
    `needs_mesh` marks functions that require ctx.mesh_vertices.
    """

    needs_mesh: bool = False

    # -- subclass interface -------------------------------------------------
    def raw(self, character, ctx: EvalContext):
        raise NotImplementedError

    # -- derived ------------------------------------------------------------
    def _loss(self) -> GeneralizedLoss:
        return getattr(self, "loss", GeneralizedLoss())

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        """weight · Σ w_c · ρ(‖f_c‖²) (joint_error_function-inl.h:35-54).
        Batch-preserving: leading dims of the raw residual survive, so the
        batch-native solvers get a per-element energy."""
        f, w = self.raw(character, ctx)
        sq = jnp.sum(f * f, axis=-1)
        return self.weight * jnp.sum(w * self._loss().value(sq), axis=-1)

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        """Flattened GN rows: sqrt(weight · w · ρ'(‖f‖²)) · f, robust scale
        frozen (stop_gradient) to match the reference's Jacobian."""
        f, w = self.raw(character, ctx)
        sq = jnp.sum(f * f, axis=-1)
        scale = jnp.sqrt(jnp.maximum(self.weight * w, 0.0))
        loss = self._loss()
        if not (loss.alpha == 2.0):  # non-L2: IRLS reweighting, frozen per linearization
            # ρ'(s)·c² == 1 at L2 so the factor is skipped there; value(s)=s/c²
            # and deriv carry the 1/c² themselves.
            scale = scale * jax.lax.stop_gradient(jnp.sqrt(jnp.maximum(loss.deriv(sq), 0.0)))
        else:
            scale = scale * (1.0 / loss.c)
        return (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))

    def num_rows(self) -> int:
        """Static residual row count (C*D) for this module."""
        raise NotImplementedError

    # -- optional analytic fast path ----------------------------------------
    # Subclasses may implement
    #     jacobian(character, ctx, jc) -> (rows (R,), j_rows (R, nJ*7))
    # returning the weighted residual rows together with their Jacobian w.r.t.
    # JOINT parameters (the solver chains through the parameter transform).
    # `jc` is a solver.analytic_jacobian.JacobianContext. When every error
    # function in a solver function provides this, the solver skips the
    # tangent-batched AD Jacobian entirely (the reference's analytic
    # SkeletonDerivative path, skeleton_derivative.cpp).
    has_analytic_jacobian: bool = False

    # -- optional normal-equation fast path ----------------------------------
    # Modules with *structured* Jacobians (diagonal limit rows, the pose
    # prior's constant-per-mode whitening) may implement
    #     accumulate_normal(character, ctx, jc, pt_mat, acc) -> acc
    # with acc = (jtj (..., P, P), jtr (..., P), sq (...,)), adding their
    # JᵀJ / Jᵀr / Σrows² contributions directly instead of materializing rows
    # in the dense Jacobian — the TPU equivalent of the reference's per-error-
    # function getSolverDerivatives rank-update specialization
    # (skeleton_error_function.h:19-150, gauss_newton_solver.cpp:113-221).
    # Convention: the GN step solves (JᵀJ + λD)δ = Jᵀr with x_new = x − δ.
    has_normal_contrib: bool = False

    def supports_normal_contrib(self, character) -> bool:
        """Whether accumulate_normal covers this module's records for this
        character (some modules only special-case a subset of record types)."""
        return self.has_normal_contrib

    def _row_scale(self, w, sq):
        """Common sqrt(weight·w·ρ') row scaling with IRLS freeze."""
        scale = jnp.sqrt(jnp.maximum(self.weight * w, 0.0))
        loss = self._loss()
        if loss.alpha == 2.0:
            return scale * (1.0 / loss.c)
        return scale * jax.lax.stop_gradient(
            jnp.sqrt(jnp.maximum(loss.deriv(sq), 0.0)))


class VectorErrorFunction(ErrorFunction):
    """Helper base for modules whose raw() is (C, D) with static C, D."""

    D: int = 3

    def num_rows(self) -> int:
        return self.constraint_count() * self.D

    def constraint_count(self) -> int:
        raise NotImplementedError


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UnionErrorFunction(ErrorFunction):
    """Compose several error functions into one (diff_ik
    union_error_function.h UnionErrorFunctionT): residual rows are the
    children's rows concatenated, energy is the sum. Useful wherever a single
    error-function slot is expected (e.g. IFT inputs)."""

    children: tuple = ()
    weight: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.ones(()))

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        total = 0.0
        for c in self.children:
            total = total + c.error(character, ctx)
        return self.weight * total

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        rows = [c.residual(character, ctx) for c in self.children]
        if not rows:
            return jnp.zeros(ctx.skel_states.shape[:-2] + (0,))
        w = jnp.sqrt(self.weight)
        return jnp.concatenate([w * r for r in rows], axis=-1)

    def num_rows(self) -> int:
        return sum(c.num_rows() for c in self.children)

    @property
    def needs_mesh(self) -> bool:
        return any(getattr(c, "needs_mesh", False) for c in self.children)
