"""Per-stage device-time budget of one LM iteration at the bench shape.

VERDICT r4 #1: the solver runs at ~6.6% of its own roofline and the ~20 ms
per LM iteration at B=2048 was asserted "overhead-bound" without a per-stage
attribution. This script measures each stage of the LM body in isolation —
as CHAINED device iterations inside one jit (N data-dependent reps per
dispatch), so the ~25-30 ms tunnel dispatch round trip and any
block_until_ready unreliability cannot contaminate the numbers
(docs/BENCHMARKS.md "Timing methodology").

Stages of one LM iteration (solver/gauss_newton.py body):
  A  residual only              fn.residual(x)        — trial-energy eval
  A' FK only                    fn.context(x)         — the skeleton pass
  B  residual + fused Jacobian  fn.residual_and_jacobian(x)
  C  JtJ + Jtr                  einsums from (B, R, P)
  D  damp + factor + solve      psd_solve(JtJ + damp, Jtr)
  E  full LM iteration slope    _solve_stage at k vs 2k traced iterations
The ledger is  E_slope  vs  A + B + C + D (+ bookkeeping = remainder).

Each stage chains via a denormal-scale perturbation (x + 1e-37·f(out)) —
a real data dependency XLA cannot fold, numerically a no-op.

Usage (TPU): timeout 1800 python benchmarks/bench_lm_stage_budget.py
Env: MOMENTUM_TPU_BENCH_BATCH (2048), MOMENTUM_TPU_BUDGET_CHAIN (20 reps).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from momentum_tpu.math.linalg import psd_solve
from momentum_tpu.solver import SkeletonSolverFunction
from momentum_tpu.testing.workloads import (
    build_fullbody_ik_problem, make_solve_stage)

B = int(_os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))
N = int(_os.environ.get("MOMENTUM_TPU_BUDGET_CHAIN", 20))
EPS = 1e-37  # denormal-scale: keeps a data dependency, changes nothing


def _sync(x):
    float(jnp.sum(x))


def timeit(fn, *args, reps=3):
    """Seconds per CHAIN STEP: each dispatch runs N chained device
    iterations; reps dispatches amortize the single terminal sync."""
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / (reps * N)


def main():
    char, ef0, targets, x0 = build_fullbody_ik_problem(B)
    ef = dataclasses.replace(ef0, target=targets)
    fn = SkeletonSolverFunction(char, (ef,), prefer_fused=True)
    p = char.num_model_parameters
    rows = 3 * char.locators.num_locators
    print(f"stage budget @ B={B}, R={rows}, P={p}, chain N={N}, "
          f"backend={jax.default_backend()}", flush=True)

    ledger = {}

    def report(key, dt, note=""):
        ledger[key] = dt * 1e3
        print(f"  {key:34s} {dt*1e3:8.3f} ms/iter  {note}", flush=True)

    # ---- A': FK only ----
    @jax.jit
    def stage_fk(x):
        def body(i, x):
            ctx = fn.context(x)
            return x + EPS * jnp.sum(ctx.skel_states[..., 0])
        return jax.lax.fori_loop(0, N, body, x)

    report("A' FK (context)", timeit(stage_fk, x0))

    # ---- A: residual (FK + rows) ----
    @jax.jit
    def stage_residual(x):
        def body(i, x):
            r = fn.residual(x)
            return x + EPS * jnp.sum(r)
        return jax.lax.fori_loop(0, N, body, x)

    report("A  residual (trial energy)", timeit(stage_residual, x0))

    # ---- B: residual + fused analytic Jacobian ----
    @jax.jit
    def stage_rj(x):
        def body(i, x):
            r, j = fn.residual_and_jacobian(x)
            return x + EPS * (jnp.sum(r) + jnp.sum(j[..., 0, :]))
        return jax.lax.fori_loop(0, N, body, x)

    report("B  residual+Jacobian", timeit(stage_rj, x0))

    # fixed J for the downstream stages
    r0, j0 = jax.jit(fn.residual_and_jacobian)(x0)
    r0.block_until_ready()

    # ---- C: JtJ + Jtr ----
    @jax.jit
    def stage_ne(j, r):
        def body(i, carry):
            j, r = carry
            jtj = jnp.einsum("...rp,...rq->...pq", j, j)
            jtr = jnp.einsum("...rp,...r->...p", j, r)
            return (j + EPS * jtj[:, :1, :], r + EPS * jtr[:, :1])
        return jax.lax.fori_loop(0, N, body, (j, r))

    report("C  JtJ + Jtr einsums", timeit(stage_ne, j0, r0))

    jtj0 = jnp.einsum("...rp,...rq->...pq", j0, j0)
    jtr0 = jnp.einsum("...rp,...r->...p", j0, r0)
    jtj0.block_until_ready()

    # ---- D: damp + factor + solve ----
    lam = jnp.full((B,), 0.01, jnp.float32)

    @jax.jit
    def stage_solve(jtj, jtr):
        eye = jnp.eye(p, dtype=jtj.dtype)

        def body(i, carry):
            jtj, jtr = carry
            diag = jnp.diagonal(jtj, axis1=-2, axis2=-1)
            damp = lam[:, None] * jnp.maximum(diag, 1e-12) + 1e-5
            a = jtj + damp[..., None] * eye
            delta = psd_solve(a, jtr)
            return (jtj + EPS * delta[:, None, :], jtr + EPS * delta)
        return jax.lax.fori_loop(0, N, body, (jtj, jtr))

    report("D  damp+factor+solve (psd_solve)", timeit(stage_solve, jtj0, jtr0))

    # ---- D1/D2: factor vs substitution split ----
    from momentum_tpu.math.linalg import blocked_cholesky, blocked_cholesky_solve

    pad = (-p) % 32
    npad = p + pad

    def _pad_a(a):
        out = jnp.zeros(a.shape[:-2] + (npad, npad), a.dtype)
        out = out.at[..., :p, :p].set(a)
        idx = jnp.arange(p, npad)
        return out.at[..., idx, idx].set(1.0)

    a0 = _pad_a(jtj0 + 1e-2 * jnp.eye(p, dtype=jtj0.dtype))
    a0.block_until_ready()

    @jax.jit
    def stage_factor(a):
        def body(i, a):
            _, (linvs, cols) = blocked_cholesky(a)
            # depend on the LAST panel so no factor stage is dead code
            # (cols[0] alone lets XLA DCE panels 1..nb-1)
            return a + EPS * (cols[-1][:, :1, :1] + linvs[-1][:, :1, :1])
        return jax.lax.fori_loop(0, N, body, a)

    report("D1 blocked_cholesky factor only (XLA)", timeit(stage_factor, a0))

    _, factors0 = jax.jit(lambda a: blocked_cholesky(a))(a0)
    jax.tree_util.tree_leaves(factors0)[0].block_until_ready()
    b0 = jnp.zeros((B, npad, 1), jnp.float32).at[:, :p, 0].set(jtr0)

    @jax.jit
    def stage_subst(b):
        def body(i, b):
            x = blocked_cholesky_solve(None, factors0, b)
            return b + EPS * x
        return jax.lax.fori_loop(0, N, body, b)

    report("D2 blocked substitutions only", timeit(stage_subst, b0))

    # ---- E: full LM iteration slope (k vs 2k iterations, k traced-safe) ----
    stage = make_solve_stage(char, ef0, method="lm")

    @jax.jit
    def lm_k(tg, x, iters):
        return stage(tg, x, iters, None).params

    t3 = None
    for k in (3, 6):
        out = lm_k(targets, x0, k)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(6):
            out = lm_k(targets, x0, k)
        _sync(out)
        tk = (time.perf_counter() - t0) / 6
        print(f"  LM-{k} total: {tk*1e3:.2f} ms", flush=True)
        if t3 is None:
            t3 = tk
        else:
            report("E  full LM iteration (slope 3→6)", (tk - t3) / 3,
                   "includes B+C+D+A + bookkeeping")

    modeled = sum(ledger.get(k, 0.0) for k in (
        "A  residual (trial energy)", "B  residual+Jacobian",
        "C  JtJ + Jtr einsums", "D  damp+factor+solve (psd_solve)"))
    slope = ledger.get("E  full LM iteration (slope 3→6)", float("nan"))
    print(f"\n  modeled A+B+C+D = {modeled:.2f} ms; measured slope = "
          f"{slope:.2f} ms; bookkeeping remainder = {slope-modeled:.2f} ms",
          flush=True)
    print(json.dumps({"ledger_ms_per_iter": ledger, "batch": B,
                      "backend": jax.default_backend()}), flush=True)

    # optional: full device trace of the production solve for the record
    if _os.environ.get("MOMENTUM_TPU_TRACE"):
        from momentum_tpu.testing.workloads import make_solve_batch
        from momentum_tpu.utils.profiling import start_trace, stop_trace

        solve_batch = jax.jit(make_solve_batch(char, ef0, B))
        res = solve_batch(targets, x0)
        _sync(res.params)
        d = start_trace()
        for _ in range(3):
            res = solve_batch(targets, x0)
        _sync(res.params)
        stop_trace()
        print(f"trace written to {d}", flush=True)


if __name__ == "__main__":
    main()
