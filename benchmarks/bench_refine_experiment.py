"""Experiment: compacted refinement of the unconverged LM tail.

Idea (TPU-native "continuous batching" for batched IK): after k full-batch
LM iterations most elements have converged; gather the worst-K elements by
energy, run the remaining iterations on the compacted (K,)-batch only, and
scatter the refined results back. Cost ≈ k + r·(K/B) iterations instead of
k + r, at (measured) identical convergence as long as K covers every
still-unconverged element.

Iteration counts and λ₀ are passed as TRACED scalars so the whole (k, r, λ)
sweep shares one compile per capacity K (compiles over the tunnel are
minutes and not cached across processes).

Usage: python benchmarks/bench_refine_experiment.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:  # runnable from any cwd without PYTHONPATH
    _sys.path.insert(0, _repo)

import dataclasses
import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt
from momentum_tpu.testing.fixtures import create_fullbody_character

BATCH = int(os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))


def main():
    char = create_fullbody_character()
    rng = np.random.default_rng(0)
    gt = jnp.asarray(
        rng.uniform(-0.3, 0.3, (BATCH, char.num_model_parameters)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent),
        np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)),
    )
    x0 = gt + jnp.asarray(rng.normal(0, 0.05, gt.shape), jnp.float32)

    base_opts = SolverOptions(
        max_iterations=6, regularization=1e-5, energy_from_residual=True,
        lambda_init=0.01, lambda_down=0.1)

    def _solve(tg, x, iters, lam0):
        ef = dataclasses.replace(ef0, target=tg)
        fn = SkeletonSolverFunction(char, (ef,), prefer_fused=True)
        opts = dataclasses.replace(
            base_opts, max_iterations=iters, lambda_init=lam0)
        return solve_levenberg_marquardt(
            fn.residual, fn.error, x, options=opts,
            jacobian_fn=fn.residual_and_jacobian)

    from momentum_tpu.solver import solve_compacted

    def solve_fn(tg, x, iters, lam0):
        ef = dataclasses.replace(ef0, target=tg)
        fn = SkeletonSolverFunction(char, (ef,), prefer_fused=True)
        opts = dataclasses.replace(base_opts, max_iterations=iters)
        return solve_levenberg_marquardt(
            fn.residual, fn.error, x, options=opts,
            jacobian_fn=fn.residual_and_jacobian, lambda0=lam0)

    @functools.partial(jax.jit, static_argnames=("capacity",))
    def solve_refined(tg, x, k_full, r_refine, lam_refine, capacity: int):
        del lam_refine  # λ now carried through SolveResult.lambda_final
        res = solve_compacted(solve_fn, tg, x, capacity=capacity,
                              k_full=k_full, r_refine=r_refine)
        return res.params, res.error

    def sync(t):
        float(jnp.sum(t))

    def run(name, k, r, lam, capacity, n_rep=10):
        p, e = solve_refined(targets, x0, jnp.int32(k), jnp.int32(r),
                             jnp.float32(lam), capacity)
        sync(p)
        t0 = time.perf_counter()
        for _ in range(n_rep):
            p, e = solve_refined(targets, x0, jnp.int32(k), jnp.int32(r),
                                 jnp.float32(lam), capacity)
        sync(p)
        dt = (time.perf_counter() - t0) / n_rep
        e = np.asarray(e)
        print(f"{name:34s} {BATCH/dt:9.0f} solves/s  "
              f"conv@1e-5 {np.mean(e < 1e-5):.4f}  "
              f"median {np.median(e):.2e}  "
              f"nan {np.mean(~np.isfinite(e)):.4f}", flush=True)

    t0 = time.perf_counter()
    run("baseline LM-6 (K=0)", 6, 0, 0.01, 0, n_rep=10)
    print(f"  [stage-1 compile+first timing took {time.perf_counter()-t0:.0f}s]",
          flush=True)
    import sys

    caps = tuple(int(a) for a in sys.argv[1:]) or (128, 256, 1024)
    for cap in caps:
        # capacities below the unconverged-at-4 count (~760) only make
        # sense with k >= 5; wide capacities sweep k=4 too
        krs = ((5, 2), (5, 4), (5, 6), (6, 2), (6, 4)) if cap < 512 \
            else ((4, 2), (4, 4), (4, 6), (5, 2), (5, 4))
        for k, r in krs:
            run(f"k={k} r={r} K={cap} (lam carry)", k, r, 0.01, cap)


if __name__ == "__main__":
    main()
