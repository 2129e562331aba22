"""The driver-bench IK workload, shared between bench.py and __graft_entry__.

One builder for the full-body marker-IK solve stage (51-joint/157-param rig,
80 position constraints, warm-started batch-native LM — the
marker_tracker.cpp:754 per-frame tracking scenario) so that a driver timing
of entry() measures the EXACT configuration bench.py records: fused analytic
Jacobians, LM k_full full-batch iterations + r_refine compacted tail
iterations on the worst-K elements (solver/compaction.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

__all__ = [
    "build_fullbody_ik_problem",
    "make_solve_stage",
    "make_solve_batch",
    "DEFAULT_REFINE",
]

# production compaction schedule (round-4 sweep, docs/BENCHMARKS.md):
# 5 full-batch LM iterations + 6 compacted iterations on the worst K=128
# of B=2048 → 16.5k solves/s @ 0.9971 conv@1e-5 on v5e.
DEFAULT_REFINE = (5, 6, 128)
DEFAULT_BATCH = 2048


def build_fullbody_ik_problem(batch: int, seed: int = 0, noise: float = 0.05,
                              return_states: bool = False):
    """(char, ef0, targets, x0[, states]): the bench problem at any batch.

    Targets are exact locator positions of uniform-random ground-truth poses;
    x0 is the previous-frame warm start (truth + `noise` gaussian).
    return_states additionally yields the ground-truth skeleton states (the
    full-stack bench derives orientation targets from them)."""
    import jax
    import jax.numpy as jnp

    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    rng = np.random.default_rng(seed)
    gt = jnp.asarray(
        rng.uniform(-0.3, 0.3, (batch, char.num_model_parameters)), jnp.float32)
    # jit the target synthesis: eagerly-dispatched vmapped FK costs minutes
    # over the 25-30 ms/op axon tunnel at B=2048
    states = jax.jit(jax.vmap(char.skeleton_states))(gt)
    targets = jax.jit(jax.vmap(char.locators.world_positions))(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent),
        np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)),
    )
    x0 = gt + jnp.asarray(rng.normal(0, noise, gt.shape), jnp.float32)
    if return_states:
        return char, ef0, targets, x0, states
    return char, ef0, targets, x0


def make_solve_stage(char, ef0, *, method: str = "lm", ne_mode: str = "0",
                     prefer_fused: bool = True, regularization: float = 1e-5,
                     lambda_init: float = 0.01, lambda_down: float = 0.1):
    """The compaction-compatible solve stage
    `(targets, x0, iters, lam0) -> SolveResult` both bench.py and entry() jit.

    ne_mode: "0" = fused dense-Jacobian path (production default), "1" =
    closed-form normal equations, "bf16" = NE with bf16-MXU/f32-accumulate
    (measured convergence dead ends — kept for A/B benches only)."""
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
    from momentum_tpu.solver.gauss_newton import (
        solve_gauss_newton, solve_levenberg_marquardt)

    opts = SolverOptions(regularization=regularization,
                         energy_from_residual=True, lambda_init=lambda_init,
                         lambda_down=lambda_down)

    def _solve_stage(targets, x0, iters, lam0):
        ef = dataclasses.replace(ef0, target=targets)
        fn = SkeletonSolverFunction(char, (ef,), prefer_fused=prefer_fused,
                                    ne_bf16=(ne_mode == "bf16"))
        o = dataclasses.replace(opts, max_iterations=iters)
        normal_fn = fn.normal_equations if ne_mode != "0" else None
        jac_fn = None if ne_mode != "0" else fn.residual_and_jacobian
        err_fn = fn.residual_sq if ne_mode != "0" else fn.error
        if method == "gn":
            return solve_gauss_newton(fn.residual, err_fn, x0, options=o,
                                      jacobian_fn=jac_fn, normal_fn=normal_fn)
        return solve_levenberg_marquardt(fn.residual, err_fn, x0, options=o,
                                         jacobian_fn=jac_fn,
                                         normal_fn=normal_fn, lambda0=lam0)

    return _solve_stage


def make_solve_batch(char, ef0, batch: int,
                     refine: Optional[tuple] = DEFAULT_REFINE,
                     iters: int = 6, **stage_kw):
    """The full production solve step `(targets, x0) -> SolveResult`
    (compacted-tail LM; jit it yourself). `refine` capacities quoted at the
    production B=2048 are scaled proportionally for smaller batches (the
    K ≥ 1.3× unconverged-count rule is batch-relative)."""
    stage = make_solve_stage(char, ef0, **stage_kw)
    if refine is None:
        def solve_batch(targets, x0):
            return stage(targets, x0, iters, None)
        return solve_batch

    from momentum_tpu.solver import solve_compacted

    k_full, r_refine, cap = refine
    if batch < DEFAULT_BATCH:
        cap = max(8, cap * batch // DEFAULT_BATCH)
    cap = min(cap, batch)

    def solve_batch(targets, x0):
        return solve_compacted(stage, targets, x0, capacity=cap,
                               k_full=k_full, r_refine=r_refine)

    return solve_batch
