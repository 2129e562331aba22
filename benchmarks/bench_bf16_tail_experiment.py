"""Experiment: bf16 full-batch LM iterations + f32 full-batch tail.

VERDICT r3 item #6 — the one untried NE-precision shape. Prior measured
facts (docs/BENCHMARKS.md "Normal-equation assembly modes"):

  - bf16-MXU NE (f32 accumulate) buys +8% main / +15% full-stack per
    iteration but STALLS at median energy ~3.2e-5 → conv@1e-5 collapses
    to 0.24 when ALL iterations run bf16.
  - The reference's precedent is a precision split, the other way around
    (f32 assembly + f64 factorization, sequence_cholesky_solver.h:31-33).

Hypothesis: spend the cheap bf16 iterations on the descent phase (where
gradient directions don't need 24-bit mantissas), then finish with f32
full-batch iterations from the bf16 iterate with λ carried. If the bf16
stall point (~3e-5) is inside the f32 basin — plausible, it's within 3×
of the 1e-5 gate — a (k bf16 + m f32) schedule could beat the all-f32
production schedule at equal convergence.

Also sweeps the combined shape: k bf16 + m f32 full-batch + r compacted
f32 refinement on the worst-K (solver/compaction.py), i.e. the production
5,6,128 schedule with its leading full-batch iterations downgraded to bf16.

Iteration counts are TRACED scalars: one compile per capacity.

Usage: python benchmarks/bench_bf16_tail_experiment.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import dataclasses
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver import solve_compacted
from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt
from momentum_tpu.testing.fixtures import create_fullbody_character

BATCH = int(_os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))


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

    def make_stage(bf16: bool):
        def stage(tg, x, iters, lam0):
            ef = dataclasses.replace(ef0, target=tg)
            fn = SkeletonSolverFunction(char, (ef,), prefer_fused=True,
                                        ne_bf16=bf16)
            opts = dataclasses.replace(base_opts, max_iterations=iters)
            if bf16:
                # same wiring as bench.py's ne_mode="bf16": closed-form
                # normal equations on the bf16 MXU path, f32 accumulate
                return solve_levenberg_marquardt(
                    fn.residual, fn.residual_sq, x, options=opts,
                    normal_fn=fn.normal_equations, lambda0=lam0)
            return solve_levenberg_marquardt(
                fn.residual, fn.error, x, options=opts,
                jacobian_fn=fn.residual_and_jacobian, lambda0=lam0)
        return stage

    stage_bf16 = make_stage(True)
    stage_f32 = make_stage(False)

    @functools.partial(jax.jit, static_argnames=("capacity", "use_bf16"))
    def solve_mixed(tg, x, k_lead, m_f32, r_ref, capacity: int,
                    use_bf16: bool):
        # The whole schedule runs through the PRODUCTION compaction path
        # (solver/compaction.py solve_compacted — 3.0e38 sentinel, λ carry,
        # converged bookkeeping) so the PROD baseline row literally executes
        # bench.py's code; only the full-batch lead is swapped per schedule
        # (solve_compacted passes lam0=None on the lead stage and the carried
        # per-element λ on the refinement stage — a static branch here).
        def stage(tg, x, iters, lam0):
            if lam0 is None:  # full-batch lead
                if use_bf16:
                    res = stage_bf16(tg, x, k_lead, None)
                    return stage_f32(tg, res.params, m_f32, res.lambda_final)
                return stage_f32(tg, x, k_lead + m_f32, None)
            return stage_f32(tg, x, iters, lam0)

        res = solve_compacted(stage, tg, x, capacity=capacity,
                              k_full=0, r_refine=r_ref)
        return res.params, res.error

    def sync(t):
        float(jnp.sum(t))

    def run(name, k, m, r, cap, bf16=True, n_rep=10):
        args = (targets, x0, jnp.int32(k), jnp.int32(m), jnp.int32(r))
        p, e = solve_mixed(*args, capacity=cap, use_bf16=bf16)
        sync(p)
        t0 = time.perf_counter()
        for _ in range(n_rep):
            p, e = solve_mixed(*args, capacity=cap, use_bf16=bf16)
        sync(p)
        dt = (time.perf_counter() - t0) / n_rep
        e = np.asarray(e)
        print(f"{name:38s} {BATCH/dt:9.0f} solves/s  "
              f"conv@1e-5 {np.mean(e < 1e-5):.4f}  "
              f"median {np.median(e):.2e}  "
              f"nan {np.mean(~np.isfinite(e)):.4f}", flush=True)

    t0 = time.perf_counter()
    # production reference point: all-f32 5 full + 6 compacted @128
    # (capacity scaled below the production 128 only for small smoke batches)
    cap = min(128, BATCH // 2)
    run(f"PROD f32 5 + 6@{cap}", 5, 0, 6, cap, bf16=False)
    print(f"  [first compile took {time.perf_counter()-t0:.0f}s]", flush=True)
    if _os.environ.get("MOMENTUM_TPU_BENCH_SMOKE"):
        run("smoke mix bf16-3 + f32-2 + 6@cap", 3, 2, 6, cap)
        return

    # pure split, no compaction: k bf16 + m f32, full batch both
    for k, m in ((3, 2), (3, 3), (4, 2), (4, 3), (5, 2)):
        run(f"split bf16-{k} + f32-{m} (K=0)", k, m, 0, 0)

    # split + compacted f32 tail (the production schedule with bf16 lead)
    for k, m in ((2, 3), (3, 2), (3, 3), (4, 1), (4, 2), (5, 1)):
        run(f"mix bf16-{k} + f32-{m} + 6@{cap}", k, m, 6, cap)


if __name__ == "__main__":
    main()
