"""Characterize the main-metric convergence tail (VERDICT r3 item #2).

The driver metric (bench.py, BASELINE config 3) converges 98.44% of B=2048
warm-started full-body LM solves below 1e-5 at 6 iterations. This experiment
answers: is the remaining ~1.6% (a) slow-but-convergent — fixable with more
iterations on the compacted tail, (b) basin failures — fixable with restarts,
or (c) genuinely stuck (gimbal / marker-geometry-limited)?

Protocol (all on the real chip; iteration counts passed as traced scalars so
the whole sweep shares two compiles — one per batch shape):
  1. LM-6 baseline: find the unconverged set U.
  2. LM-30 from the same x0: which of U converge given unlimited budget?
  3. For the survivors of (2): restart from a jitter of the stalled iterate
     and from near-truth inits; do they move?
  4. Conditioning diagnostics on the persistent set.

Reference semantics being matched: solver.cpp:86-121 convergence criterion;
tensor_ik.cpp:127 per-thread early exit (what compaction emulates).
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

os.environ.setdefault("MOMENTUM_TPU_PREFER_FUSED", "1")

import jax
import jax.numpy as jnp

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.testing.fixtures import create_fullbody_character

CAP = 64  # static padded size for the persistent set


def main():
    batch = int(os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))
    char = create_fullbody_character()
    P = char.num_model_parameters
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (batch, P)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent),
        np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    x0 = gt + jnp.asarray(rng.normal(0, 0.05, gt.shape), jnp.float32)

    from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt

    @jax.jit
    def solve(tg, x, iters):
        ef = dataclasses.replace(ef0, target=tg)
        fn = SkeletonSolverFunction(char, (ef,), prefer_fused=True)
        opts = SolverOptions(max_iterations=iters, regularization=1e-5,
                             energy_from_residual=True, lambda_init=0.01,
                             lambda_down=0.1)
        return solve_levenberg_marquardt(fn.residual, fn.error, x,
                                         options=opts,
                                         jacobian_fn=fn.residual_and_jacobian)

    # 1. LM-6 baseline
    r6 = solve(targets, x0, jnp.int32(6))
    e6 = np.asarray(r6.error)
    unconv = np.nonzero(e6 >= 1e-5)[0]
    print(f"LM-6: conv {np.mean(e6 < 1e-5):.4f}, unconverged {len(unconv)}, "
          f"median(all) {np.median(e6):.2e}", flush=True)
    print(f"  tail energies lo {np.sort(e6[unconv])[:4]}", flush=True)
    print(f"  tail energies hi {np.sort(e6[unconv])[-4:]}", flush=True)

    # 2. unlimited budget from the same init (same compile: traced iters)
    r30 = solve(targets, x0, jnp.int32(30))
    e30 = np.asarray(r30.error)
    still = np.nonzero(e30[unconv] >= 1e-5)[0]
    print(f"LM-30 same init: {len(unconv) - len(still)} of {len(unconv)} "
          f"LM-6 failures converge, {len(still)} persist; overall conv "
          f"{np.mean(e30 < 1e-5):.4f}", flush=True)
    for it in (8, 10, 14, 20):
        r = solve(targets, x0, jnp.int32(it))
        e = np.asarray(r.error)
        print(f"  LM-{it}: conv {np.mean(e < 1e-5):.4f} "
              f"({np.sum(e >= 1e-5)} unconverged)", flush=True)
    persistent = unconv[still]
    if len(persistent) == 0:
        print("TAIL IS SLOW-BUT-CONVERGENT: iterations alone close it.")
        return
    if len(persistent) > CAP:
        print(f"NOTE: truncating persistent set {len(persistent)} -> {CAP}")
        persistent = persistent[:CAP]

    # pad the persistent set to CAP (repeat the first element; dummies are
    # excluded from statistics via the `real` mask)
    n_p = len(persistent)
    pad_idx = np.concatenate([persistent,
                              np.full(CAP - n_p, persistent[0])])
    real = np.arange(CAP) < n_p
    tg_p = targets[pad_idx]

    def stats(label, e, x=None):
        e = np.asarray(e)[real]
        msg = (f"  {label}: {np.sum(e < 1e-5)}/{n_p} converge "
               f"(median {np.median(e):.2e}, max {e.max():.2e})")
        print(msg, flush=True)

    # 3a. jitter the stalled iterate + LM-30
    rng2 = np.random.default_rng(7)
    xp_stall = r30.params[pad_idx]
    for scale in (0.01, 0.05, 0.2):
        xj = xp_stall + jnp.asarray(
            rng2.normal(0, scale, (CAP, P)), jnp.float32)
        rj = solve(tg_p, xj, jnp.int32(30))
        stats(f"jitter {scale} + LM-30", rj.error)

    # 3b. near-truth inits (basin test)
    for noise in (0.01, 0.002):
        xs = gt[pad_idx] + jnp.asarray(
            rng2.normal(0, noise, (CAP, P)), jnp.float32)
        rs = solve(tg_p, xs, jnp.int32(30))
        stats(f"init noise {noise} + LM-30", rs.error)

    # 3c. exact truth init: residual is 0 by construction — sanity only
    rt = solve(tg_p, gt[pad_idx], jnp.int32(2))
    stats("truth init + LM-2 (sanity)", rt.error)

    # 4. conditioning diagnostics
    @jax.jit
    def jtj_cond(x, tg):
        efx = dataclasses.replace(ef0, target=tg)
        fnx = SkeletonSolverFunction(char, (efx,), prefer_fused=True)
        _, J = fnx.residual_and_jacobian(x)
        jtj = jnp.einsum("bip,biq->bpq", J, J)
        s = jnp.linalg.svd(jtj, compute_uv=False)
        return s[..., 0] / jnp.maximum(s[..., -1], 1e-30)

    cond_truth = np.asarray(jtj_cond(gt[pad_idx], tg_p))[real]
    cond_stall = np.asarray(jtj_cond(xp_stall, tg_p))[real]
    ok_idx = np.nonzero(e30 < 1e-5)[0][:CAP]
    cond_ok = np.asarray(jtj_cond(gt[ok_idx], targets[ok_idx]))
    dist = np.asarray(jnp.linalg.norm(
        r30.params[persistent] - gt[persistent], axis=-1))
    print(f"  cond(JtJ) truth:  median {np.median(cond_truth):.2e} "
          f"max {cond_truth.max():.2e}", flush=True)
    print(f"  cond(JtJ) stall:  median {np.median(cond_stall):.2e} "
          f"max {cond_stall.max():.2e}", flush=True)
    print(f"  cond(JtJ) converged control: median {np.median(cond_ok):.2e}",
          flush=True)
    print(f"  |x_stall - gt|: median {np.median(dist):.3f} max {dist.max():.3f}"
          f" (init noise radius ~{0.05 * np.sqrt(P):.2f})", flush=True)
    print(f"  stall energies: {np.sort(np.asarray(e30[persistent]))[:10]} ...",
          flush=True)


if __name__ == "__main__":
    main()
