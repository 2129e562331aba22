"""A/B: stacked-factor fused Jacobian vs the 4-contraction original.

Measures the residual_and_jacobian stage (stage B of the round-5 LM budget)
and the end-to-end LM-6 solve under both MOMENTUM_TPU_FUSED_STACKED settings.
The env knob is read at TRACE time, so each arm constructs its own jitted
callable and flips the env before its first call.

Usage (TPU): timeout 3000 python benchmarks/bench_ne_stacked.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from momentum_tpu.solver import SkeletonSolverFunction
from momentum_tpu.testing.workloads import (
    build_fullbody_ik_problem, make_solve_stage)

B = int(_os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))
N = int(_os.environ.get("MOMENTUM_TPU_BUDGET_CHAIN", 20))
EPS = 1e-37


def main():
    char, ef0, targets, x0 = build_fullbody_ik_problem(B)
    ef = dataclasses.replace(ef0, target=targets)
    fn = SkeletonSolverFunction(char, (ef,), prefer_fused=True)
    print(f"NE stacked A/B @ B={B}, chain N={N}, "
          f"backend={jax.default_backend()}", flush=True)

    results = {}
    for arm in ("0", "1"):
        _os.environ["MOMENTUM_TPU_FUSED_STACKED"] = arm

        @jax.jit
        def stage_rj(x, _arm=arm):
            def body(i, x):
                r, j = fn.residual_and_jacobian(x)
                return x + EPS * (jnp.sum(r) + jnp.sum(j[..., 0, :]))
            return jax.lax.fori_loop(0, N, body, x)

        out = stage_rj(x0)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(3):
            out = stage_rj(x0)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / (3 * N)
        results[arm] = dt
        print(f"  B residual+Jacobian [stacked={arm}] {dt*1e3:8.3f} ms/iter",
              flush=True)

    # end-to-end production solve under each arm
    for arm in ("0", "1"):
        _os.environ["MOMENTUM_TPU_FUSED_STACKED"] = arm
        stage = make_solve_stage(char, ef0, method="lm")

        @jax.jit
        def solve6(tg, x, _arm=arm):
            return stage(tg, x, 6, None)

        res = solve6(targets, x0)
        float(jnp.sum(res.params))
        t0 = time.perf_counter()
        for _ in range(10):
            res = solve6(targets, x0)
        float(jnp.sum(res.params))
        dt = (time.perf_counter() - t0) / 10
        conv = float(jnp.mean(res.error < 1e-5))
        print(f"  LM-6 end-to-end [stacked={arm}] {B/dt:9.0f} solves/s  "
              f"conv@1e-5 {conv:.4f}", flush=True)


if __name__ == "__main__":
    main()
