"""bf16 full-batch LM iterations + f32 full-batch tail (VERDICT r3 item #6).

Round-3 data (docs/BENCHMARKS.md, NE-mode table): pure-bf16 NE assembly buys
+8% main / +15% full stack but stalls at median energy ~3e-5 (conv@1e-5
0.98 -> 0.24). The reference's precedent is a precision SPLIT
(sequence_cholesky_solver.h:31-33: f32 residuals, f64 normal equations); the
inverse shape here is: run the FIRST k LM iterations with bf16-MXU normal
equations (cheap descent while far from the optimum), then finish with r f32
iterations over the FULL batch (not top-K) carrying the per-element lambda
state, so the tail has full-precision curvature when it matters.

Sweeps (k_bf16, r_f32) x optional compacted tail; gates on conv@1e-5 ≥ the
LM-6 baseline 0.9844 and reports solves/s per config.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

os.environ.setdefault("MOMENTUM_TPU_PREFER_FUSED", "1")

import jax
import jax.numpy as jnp

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt
from momentum_tpu.testing.fixtures import create_fullbody_character


def main():
    batch = int(os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))
    char = create_fullbody_character()
    rng = np.random.default_rng(0)
    gt = jnp.asarray(
        rng.uniform(-0.3, 0.3, (batch, char.num_model_parameters)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent),
        np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    x0 = gt + jnp.asarray(rng.normal(0, 0.05, gt.shape), jnp.float32)
    ef = dataclasses.replace(ef0, target=targets)

    fn_bf16 = SkeletonSolverFunction(char, (ef,), prefer_fused=True,
                                     ne_bf16=True)
    fn_f32 = SkeletonSolverFunction(char, (ef,), prefer_fused=True)

    def stage_bf16(x, iters, lam0):
        opts = SolverOptions(max_iterations=iters, regularization=1e-5,
                             energy_from_residual=True)
        return solve_levenberg_marquardt(
            fn_bf16.residual, fn_bf16.residual_sq, x, options=opts,
            normal_fn=fn_bf16.normal_equations, lambda0=lam0)

    def stage_f32(x, iters, lam0):
        opts = SolverOptions(max_iterations=iters, regularization=1e-5,
                             energy_from_residual=True)
        return solve_levenberg_marquardt(
            fn_f32.residual, fn_f32.error, x, options=opts,
            jacobian_fn=fn_f32.residual_and_jacobian, lambda0=lam0)

    from momentum_tpu.solver import solve_compacted

    # k/r passed as TRACED scalars so ONE compile serves the whole sweep
    # (verify-skill learning: tunnel compiles are the bottleneck)
    @jax.jit
    def run_split(targets_, x, k_bf16, r_f32):
        del targets_
        r1 = stage_bf16(x, k_bf16, None)
        return stage_f32(r1.params, r_f32, r1.lambda_final)

    def make_split(k_bf16, r_f32):
        k = jnp.asarray(k_bf16, jnp.int32)
        r = jnp.asarray(r_f32, jnp.int32)
        return lambda targets_, x: run_split(targets_, x, k, r)

    def bench(run, label):
        res = run(targets, x0)
        jax.block_until_ready(res.params)
        float(jnp.sum(res.params))
        e = np.asarray(res.error)
        n_rep = 10
        t0 = time.perf_counter()
        for _ in range(n_rep):
            res = run(targets, x0)
        float(jnp.sum(res.params))
        dt = (time.perf_counter() - t0) / n_rep
        print(f"{label:28s} {batch / dt:9.0f} solves/s  "
              f"conv@1e-5 {np.mean(e < 1e-5):.4f}  "
              f"median {np.median(e):.2e}  "
              f"div {np.mean(~np.isfinite(e)):.3f}", flush=True)

    # baseline for this session
    @jax.jit
    def lm6(targets_, x):
        return stage_f32(x, 6, None)

    bench(lm6, "LM-6 f32 (baseline)")
    for k_bf16, r_f32 in ((2, 4), (3, 3), (4, 2), (2, 3), (3, 2)):
        bench(make_split(k_bf16, r_f32), f"bf16-{k_bf16} + f32-{r_f32} full")


if __name__ == "__main__":
    main()
