"""Experiment: compacted tail refinement on the FULL residual stack.

The full-stack metric (position + orientation + limit + pose-prior, GN) is
gated on marker-position energy conv@1e-5. GN-3 converges 1.00; GN-2 only
~0.67 — so refine the GN-2 tail: gather the worst-K elements BY MARKER
ENERGY (the gate's metric) and give them the third iteration compacted.
GN is memoryless, so k full + r compacted iterations reproduce GN-(k+r)
exactly for every refined element.

Usage: python benchmarks/bench_fullstack_refine_experiment.py (repo root)
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

from momentum_tpu.errors import (
    LimitErrorFunction, OrientationErrorFunction, PosePriorErrorFunction,
    PositionErrorFunction)
from momentum_tpu.errors.pose_prior import Mppca
from momentum_tpu.math import skel_state as _ss
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver.ik import solve_ik
from momentum_tpu.testing.fixtures import create_fullbody_character

BATCH = int(os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))


def main():
    char = create_fullbody_character()
    p = char.num_model_parameters
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (BATCH, p)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    _, q_t, _ = _ss.split(states)
    x0 = gt + jnp.asarray(rng.normal(0, 0.05, gt.shape), jnp.float32)

    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    ori0 = OrientationErrorFunction.create(
        np.arange(char.skeleton.num_joints, dtype=np.int32),
        np.tile(np.asarray([0, 0, 0, 1], np.float32),
                (char.skeleton.num_joints, 1)))
    lim = LimitErrorFunction.create()
    mu = np.zeros((2, p), np.float32)
    w = [np.full((p, 4), 0.01, np.float32)] * 2
    prior = Mppca.from_components(
        pi=np.asarray([0.6, 0.4]), mu=mu, w_list=w,
        sigma2=np.asarray([1.0, 2.0]), names=char.parameter_transform.names)
    pp = PosePriorErrorFunction.create(prior, char.parameter_transform.names)
    base_opts = SolverOptions(max_iterations=3, regularization=1e-5,
                              energy_from_residual=True)

    def solve_fn(tg_qt, x, iters):
        tg, qt = tg_qt
        ef_pos = dataclasses.replace(ef0, target=tg)
        ef_ori = dataclasses.replace(ori0, target=qt)
        fn = SkeletonSolverFunction(char, (ef_pos, ef_ori, lim, pp),
                                    prefer_fused=True)
        opts = dataclasses.replace(base_opts, max_iterations=iters)
        return solve_ik(fn, x, None, opts, method="gauss_newton")

    def pos_energy(tg, params):
        fn_pos = SkeletonSolverFunction(
            char, (dataclasses.replace(ef0, target=tg),))
        return fn_pos.error(params)

    @functools.partial(jax.jit, static_argnames=("capacity",))
    def solve_refined(tg, qt, x, k_full, r_refine, capacity: int):
        res1 = solve_fn((tg, qt), x, k_full)
        e1 = pos_energy(tg, res1.params)
        if capacity == 0:
            return res1.params, e1
        key = jnp.nan_to_num(e1, nan=jnp.float32(3e38), posinf=jnp.float32(3e38))
        _, idx = jax.lax.top_k(key, capacity)
        res2 = solve_fn((tg[idx], qt[idx]), res1.params[idx], r_refine)
        params = res1.params.at[idx].set(res2.params)
        e = e1.at[idx].set(pos_energy(tg[idx], res2.params))
        return params, e

    def sync(t):
        float(jnp.sum(t))

    def run(name, k, r, capacity, n_rep=10):
        prm, e = solve_refined(targets, q_t, x0, jnp.int32(k), jnp.int32(r),
                               capacity)
        sync(prm)
        t0 = time.perf_counter()
        for _ in range(n_rep):
            prm, e = solve_refined(targets, q_t, x0, jnp.int32(k),
                                   jnp.int32(r), capacity)
        sync(prm)
        dt = (time.perf_counter() - t0) / n_rep
        e = np.asarray(e)
        print(f"{name:34s} {BATCH/dt:9.0f} solves/s  "
              f"marker conv@1e-5 {np.mean(e < 1e-5):.4f}  "
              f"median {np.median(e):.2e}  "
              f"nan {np.mean(~np.isfinite(e)):.4f}", flush=True)

    run("baseline GN-3 (K=0)", 3, 0, 0)
    run("baseline GN-2 (K=0, gate-fails)", 2, 0, 0)
    for cap in (768, 1024):
        for r in (1, 2):
            run(f"k=2 r={r} K={cap}", 2, r, cap)
    run("k=3 r=1 K=256 (above-GN-3 conv)", 3, 1, 256)
    run("k=3 r=2 K=256", 3, 2, 256)


if __name__ == "__main__":
    main()
