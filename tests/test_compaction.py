"""Compacted tail refinement (solver/compaction.py): after k full-batch LM
iterations, refine only the worst-K elements. With λ carried through
SolveResult.lambda_final → lambda0 and capacity covering the whole batch,
the two-stage solve must EXACTLY reproduce the single (k+r)-iteration solve
(same iterate sequence per element)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.solver import (
    SkeletonSolverFunction,
    SolverOptions,
    gather_batch,
    scatter_batch,
    solve_compacted,
)
from momentum_tpu.solver.gauss_newton import solve_levenberg_marquardt
from momentum_tpu.testing.fixtures import create_test_character

B = 32


@pytest.fixture(scope="module")
def problem():
    char = create_test_character(5)
    rng = np.random.default_rng(3)
    gt = jnp.asarray(
        rng.uniform(-0.4, 0.4, (B, char.num_model_parameters)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent),
        np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    ef = dataclasses.replace(ef0, target=targets)
    x0 = gt + jnp.asarray(rng.normal(0, 0.08, gt.shape), jnp.float32)
    base = SolverOptions(max_iterations=6, regularization=1e-5,
                         energy_from_residual=True, lambda_init=0.01,
                         lambda_down=0.1)

    def solve_fn(ef_in, x, iters, lam0):
        fn = SkeletonSolverFunction(char, (ef_in,), prefer_fused=True)
        opts = dataclasses.replace(base, max_iterations=iters)
        return solve_levenberg_marquardt(
            fn.residual, fn.error, x, options=opts,
            jacobian_fn=fn.residual_and_jacobian, lambda0=lam0)

    return char, ef, x0, solve_fn


def test_full_capacity_matches_uncompacted(problem):
    _, ef, x0, solve_fn = problem
    full = solve_fn(ef, x0, 6, None)
    comp = solve_compacted(solve_fn, ef, x0, capacity=B, k_full=3, r_refine=3)
    np.testing.assert_array_equal(np.asarray(comp.params),
                                  np.asarray(full.params))
    np.testing.assert_array_equal(np.asarray(comp.error),
                                  np.asarray(full.error))


def test_partial_capacity_refines_worst(problem):
    _, ef, x0, solve_fn = problem
    stage1 = solve_fn(ef, x0, 3, None)
    comp = solve_compacted(solve_fn, ef, x0, capacity=8, k_full=3, r_refine=3)
    full = solve_fn(ef, x0, 6, None)
    worst = np.argsort(-np.asarray(stage1.error))[:8]
    # refined elements match the full 6-iteration solve exactly
    np.testing.assert_array_equal(np.asarray(comp.params)[worst],
                                  np.asarray(full.params)[worst])
    # unrefined elements keep their 3-iteration result
    rest = np.setdiff1d(np.arange(B), worst)
    np.testing.assert_array_equal(np.asarray(comp.params)[rest],
                                  np.asarray(stage1.params)[rest])
    # energy never increases vs stage 1
    assert np.all(np.asarray(comp.error) <= np.asarray(stage1.error) + 1e-12)


def test_zero_capacity_is_stage1(problem):
    _, ef, x0, solve_fn = problem
    comp = solve_compacted(solve_fn, ef, x0, capacity=0, k_full=4, r_refine=2)
    stage1 = solve_fn(ef, x0, 4, None)
    np.testing.assert_array_equal(np.asarray(comp.params),
                                  np.asarray(stage1.params))


def test_capacity_exceeding_batch_raises(problem):
    _, ef, x0, solve_fn = problem
    with pytest.raises(ValueError):
        solve_compacted(solve_fn, ef, x0, capacity=B + 1, k_full=1, r_refine=1)


def test_runs_under_jit(problem):
    _, ef, x0, solve_fn = problem

    @jax.jit
    def run(ef_in, x):
        return solve_compacted(solve_fn, ef_in, x, capacity=8,
                               k_full=3, r_refine=3)

    eager = solve_compacted(solve_fn, ef, x0, capacity=8, k_full=3, r_refine=3)
    jitted = run(ef, x0)
    # jit fuses differently from op-by-op eager; f32 reassociation drifts a
    # few ulp per iteration — assert agreement, not bit-equality
    np.testing.assert_allclose(np.asarray(jitted.params),
                               np.asarray(eager.params), atol=1e-4)


def test_gather_scatter_roundtrip():
    tree = {"batched": jnp.arange(24.0).reshape(6, 4),
            "shared": jnp.arange(3.0)}
    idx = jnp.asarray([4, 1, 0])
    sub = gather_batch(tree, idx, 6)
    assert sub["batched"].shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(sub["shared"]),
                                  np.asarray(tree["shared"]))
    sub2 = {"batched": sub["batched"] + 100.0, "shared": sub["shared"]}
    out = scatter_batch(tree, sub2, idx, 3)
    np.testing.assert_array_equal(
        np.asarray(out["batched"][jnp.asarray([4, 1, 0])]),
        np.asarray(sub2["batched"]))
    np.testing.assert_array_equal(np.asarray(out["batched"][2]),
                                  np.asarray(tree["batched"][2]))
