"""Differentiable IK via the implicit function theorem.

Reference: momentum/diff_ik/fully_differentiable_body_ik.h:49-57 +
pymomentum tensor_ik.cpp:191-360 — given dL/dθ* at an IK optimum θ*, the
gradient w.r.t. every error-function *input* φ (targets, weights, offsets...)
is
    dL/dφ = −(∂G/∂φ)ᵀ · H⁻¹ · dL/dθ*,
where G(θ, φ) = ∂E/∂θ and H = ∂G/∂θ ≈ 2·JᵀJ (Gauss-Newton approximation, the
same one the reference uses). Validity requires θ* to be near a stationary
point (fully_differentiable_body_ik.h:45-48); `gradient_rmse` mirrors the
reference's check.

TPU-native shape: ONE `jax.custom_vjp` around the fused solve. The forward is
the jitted GN/LM loop; the backward is one masked PSD solve plus one vjp of
the θ-gradient w.r.t. the error-function pytree — so gradients flow to any
array field of any error function (targets, per-constraint weights, offsets,
global weights) without per-type "named input" plumbing
(FullyDifferentiable*ErrorFunction's getInput/setInput becomes the pytree
structure itself).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from momentum_tpu.math.linalg import psd_solve

from momentum_tpu.solver.gauss_newton import SolverOptions, _jacobian
from momentum_tpu.solver.ik import solve_ik
from momentum_tpu.solver.skeleton_solver_function import SkeletonSolverFunction

__all__ = ["solve_ik_ift", "gradient_rmse"]


def gradient_rmse(solver_fn: SkeletonSolverFunction, theta: jnp.ndarray,
                  enabled_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """RMS of the (masked) energy gradient at theta — should be ~0 for the IFT
    backward to be valid (reference returns gradientRmse, tensor_ik.cpp)."""
    g = solver_fn.gradient(theta)
    if enabled_mask is not None:
        g = g * enabled_mask
    return jnp.sqrt(jnp.mean(g * g))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def solve_ik_ift(
    solver_fn: SkeletonSolverFunction,
    x0: jnp.ndarray,
    enabled_mask: Optional[jnp.ndarray],
    options: SolverOptions = SolverOptions(),
    method: str = "gauss_newton",
) -> jnp.ndarray:
    """Differentiable IK solve: returns θ*; gradients flow to solver_fn's
    arrays (targets/weights/offsets/...) via IFT and to x0 through disabled
    parameters (which pass through untouched)."""
    return solve_ik(solver_fn, x0, enabled_mask, options, method).params


def _fwd(solver_fn, x0, enabled_mask, options, method):
    theta = solve_ik(solver_fn, x0, enabled_mask, options, method).params
    return theta, (solver_fn, theta, enabled_mask)


def _bwd(options, method, res, g):
    solver_fn, theta, enabled_mask = res
    p = theta.shape[-1]
    mask = jnp.ones(p, theta.dtype) if enabled_mask is None else enabled_mask.astype(theta.dtype)

    # H ≈ 2·JᵀJ on the enabled subspace (d_modelParams_d_inputs solves the
    # same system, fully_differentiable_body_ik.cpp)
    _, jt = _jacobian(solver_fn.residual, theta)
    jt = jt * mask[:, None]
    h = 2.0 * (jt @ jt.T)
    h = h + (options.regularization + (1.0 - mask)) * jnp.eye(p, dtype=theta.dtype)
    u = psd_solve(h, g * mask) * mask

    # φ̄ = −(∂G/∂φ)ᵀ u with G(φ) = ∂E/∂θ at fixed θ*
    def theta_grad(fn):
        return jax.grad(fn.error)(theta) * mask

    _, vjp_fn = jax.vjp(theta_grad, solver_fn)
    (fn_bar,) = vjp_fn(-u)

    # disabled parameters pass through from x0
    x0_bar = g * (1.0 - mask)
    mask_bar = None if enabled_mask is None else jnp.zeros_like(enabled_mask)
    return fn_bar, x0_bar, mask_bar


solve_ik_ift.defvjp(_fwd, _bwd)
