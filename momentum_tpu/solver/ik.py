"""High-level IK entry point: one fused solve, vmappable for batch IK.

This is the TPU replacement for the reference's per-problem solver objects
(tensor_ik.cpp:95-190 runs one C++ solver per batch element on CPU threads;
here the whole batch is one vmapped XLA computation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from momentum_tpu.solver.gauss_newton import (
    SolveResult,
    SolverOptions,
    solve_gauss_newton,
    solve_levenberg_marquardt,
)
from momentum_tpu.solver.skeleton_solver_function import SkeletonSolverFunction

__all__ = ["solve_ik", "get_solve_counters", "reset_solve_counters"]

# Global solve counters (tensor_ik.cpp:178-180 nTotalSolveIK /
# nTotalSolveIKIter). Host-side: incremented when solve_ik is CALLED —
# inside jit that is once per trace, so treat these as observability hints,
# not exact execution counts (XLA replays traces without Python).
_counters = {"n_total_solve_ik": 0, "n_total_solve_ik_iter": 0}


def get_solve_counters() -> dict:
    return dict(_counters)


def reset_solve_counters() -> None:
    _counters["n_total_solve_ik"] = 0
    _counters["n_total_solve_ik_iter"] = 0


def solve_ik(
    solver_fn: SkeletonSolverFunction,
    x0: jnp.ndarray,
    enabled_mask: Optional[jnp.ndarray] = None,
    options: SolverOptions = SolverOptions(),
    method: str = "gauss_newton",
) -> SolveResult:
    """Solve one IK problem. jit/vmap/grad-safe.

    For a batch, vmap over (solver_fn, x0) with the appropriate in_axes pytree
    (constraint targets batched, character arrays broadcast). NaN results are
    reverted to x0, mirroring tensor_ik.cpp:168-175.
    """
    import numpy as _np

    batch = int(_np.prod(x0.shape[:-1])) if x0.ndim > 1 else 1
    _counters["n_total_solve_ik"] += batch
    if isinstance(options.max_iterations, int):
        # max_iterations may be a traced scalar (dynamic-iteration solves,
        # e.g. the compacted-refinement bench); don't leak tracers into the
        # host-side counters
        _counters["n_total_solve_ik_iter"] += batch * options.max_iterations
    if method == "gradient_descent":
        from momentum_tpu.solver.gauss_newton import solve_gradient_descent

        solve = solve_gradient_descent
    elif method == "gauss_newton":
        solve = solve_gauss_newton
    elif method in ("levenberg_marquardt", "trust_region"):
        solve = solve_levenberg_marquardt
    else:
        raise ValueError(f"unknown method {method!r}")
    jac_fn = solver_fn.residual_and_jacobian if solver_fn.fully_analytic else None
    # Structured modules (pose prior / model-space limits) short-circuit the
    # dense Jacobian via the normal-equation protocol; only on the Cholesky
    # path (QR needs actual rows).
    normal_fn = None
    error_fn = solver_fn.error
    if (method != "gradient_descent" and options.linear_solver == "cholesky"
            and solver_fn.has_structured_modules):
        normal_fn = solver_fn.normal_equations
        if options.energy_from_residual:
            error_fn = solver_fn.residual_sq
    result = solve(solver_fn.residual, error_fn, x0, enabled_mask, options,
                   jacobian_fn=jac_fn, normal_fn=normal_fn)
    bad = ~jnp.all(jnp.isfinite(result.params), axis=-1, keepdims=True)
    params = jnp.where(bad, x0, result.params)
    return result._replace(params=params)
