"""Differentiable-IK (IFT) tests — reference pattern: tensor_ik_test.cpp
gradcheck of solve_ik backward w.r.t. constraint targets and weights."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.errors import PositionErrorFunction, ModelParametersErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver.diff_ik import gradient_rmse, solve_ik_ift
from momentum_tpu.testing.fixtures import create_test_character

OPTS = SolverOptions(max_iterations=40, regularization=1e-6)


@pytest.fixture(scope="module")
def setup():
    char = create_test_character(4)
    rng = np.random.default_rng(12345)
    theta_star = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
    targets = char.locators.world_positions(char.skeleton_states(theta_star))
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)),
    )
    # small pose regularizer keeps the optimum unique (full-rank H)
    reg = ModelParametersErrorFunction.create(
        np.zeros(char.num_model_parameters), weight=1e-3)
    return char, ef0, reg, targets


def _solve_from_targets(char, ef0, reg, targets):
    ef = dataclasses.replace(ef0, target=targets)
    fn = SkeletonSolverFunction(char, (ef, reg))
    x0 = jnp.zeros(char.num_model_parameters)
    return solve_ik_ift(fn, x0, None, OPTS)


def test_solve_reaches_optimum(setup):
    char, ef0, reg, targets = setup
    theta = _solve_from_targets(char, ef0, reg, targets)
    ef = dataclasses.replace(ef0, target=targets)
    fn = SkeletonSolverFunction(char, (ef, reg))
    assert float(gradient_rmse(fn, theta)) < 1e-4


def test_gradient_wrt_targets_matches_fd(setup):
    char, ef0, reg, targets = setup
    w = jnp.asarray(np.random.default_rng(3).normal(size=char.num_model_parameters),
                    jnp.float32)

    def loss(t):
        theta = _solve_from_targets(char, ef0, reg, t)
        return jnp.sum(w * theta)

    g = jax.jit(jax.grad(loss))(targets)
    g = np.asarray(g)

    eps = 1e-3
    t_np = np.asarray(targets, np.float64)
    # spot check a handful of entries
    rng = np.random.default_rng(7)
    flat_idx = rng.choice(t_np.size, size=6, replace=False)
    for fi in flat_idx:
        i, j = divmod(fi, 3)
        tp, tm = t_np.copy(), t_np.copy()
        tp[i, j] += eps
        tm[i, j] -= eps
        lp = float(loss(jnp.asarray(tp, jnp.float32)))
        lm = float(loss(jnp.asarray(tm, jnp.float32)))
        fd = (lp - lm) / (2 * eps)
        assert abs(g[i, j] - fd) < 5e-2 * max(1.0, abs(fd)), (
            f"target grad mismatch at {(i, j)}: ift={g[i, j]:.5f} fd={fd:.5f}")


def test_gradient_wrt_weight_matches_fd(setup):
    char, ef0, reg, targets = setup
    w = jnp.asarray(np.random.default_rng(5).normal(size=char.num_model_parameters),
                    jnp.float32)

    def loss(cw):
        ef = dataclasses.replace(ef0, target=targets, cweight=cw)
        fn = SkeletonSolverFunction(char, (ef, reg))
        theta = solve_ik_ift(fn, jnp.zeros(char.num_model_parameters), None, OPTS)
        return jnp.sum(w * theta)

    cw0 = np.ones(char.locators.num_locators, np.float32)
    g = np.asarray(jax.grad(loss)(jnp.asarray(cw0)))

    eps = 1e-3
    for i in range(min(3, len(cw0))):
        cp, cm = cw0.copy(), cw0.copy()
        cp[i] += eps
        cm[i] -= eps
        fd = (float(loss(jnp.asarray(cp))) - float(loss(jnp.asarray(cm)))) / (2 * eps)
        assert abs(g[i] - fd) < 5e-2 * max(1.0, abs(fd)), (
            f"weight grad mismatch at {i}: ift={g[i]:.5f} fd={fd:.5f}")


def test_disabled_params_pass_through_gradient(setup):
    char, ef0, reg, targets = setup
    p = char.num_model_parameters
    mask = np.ones(p, np.float32)
    mask[0] = 0.0

    def loss(x0):
        ef = dataclasses.replace(ef0, target=targets)
        fn = SkeletonSolverFunction(char, (ef, reg))
        theta = solve_ik_ift(fn, x0, jnp.asarray(mask), OPTS)
        return theta[0] * 3.0  # depends only on the frozen param

    g = np.asarray(jax.grad(loss)(jnp.full(p, 0.1, jnp.float32)))
    np.testing.assert_allclose(g[0], 3.0, atol=1e-6)
    np.testing.assert_allclose(g[1:], 0.0, atol=1e-6)
