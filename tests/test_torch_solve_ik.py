"""Torch-autograd IK wrapper (reference: pymomentum tensor_ik solve_ik)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.solver import SkeletonSolverFunction
from momentum_tpu.solver.diff_ik import solve_ik_ift
from momentum_tpu.solver.gauss_newton import SolverOptions
from momentum_tpu.testing.fixtures import create_test_character
from momentum_tpu.torch_interop import (
    InverseParameterTransformModule,
    solve_ik_torch,
)


def _setup():
    char = create_test_character(4)
    gt = jnp.zeros(char.num_model_parameters).at[0].set(0.4).at[3].set(0.2)
    targets = np.asarray(
        char.locators.world_positions(char.skeleton_states(gt)))
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros_like(targets))
    return char, gt, targets, ef0


def test_solve_ik_torch_matches_jax_grads():
    char, gt, targets, ef0 = _setup()
    opts = SolverOptions(max_iterations=20)

    def build(inputs):
        return SkeletonSolverFunction(
            char, (dataclasses.replace(ef0, target=inputs["targets"]),))

    x0 = torch.zeros(char.num_model_parameters)
    t_targets = torch.tensor(targets, requires_grad=True)
    theta = solve_ik_torch(build, x0, {"targets": t_targets}, options=opts)
    # solver found the ground truth
    np.testing.assert_allclose(theta.detach().numpy(), np.asarray(gt),
                               atol=5e-3)
    (theta ** 2).sum().backward()

    # the same gradient computed natively in jax
    def jax_loss(tg):
        fn = SkeletonSolverFunction(
            char, (dataclasses.replace(ef0, target=tg),))
        th = solve_ik_ift(fn, jnp.zeros(char.num_model_parameters), None,
                          opts)
        return jnp.sum(th ** 2)

    g_jax = np.asarray(jax.grad(jax_loss)(jnp.asarray(targets)))
    np.testing.assert_allclose(t_targets.grad.numpy(), g_jax,
                               rtol=1e-4, atol=1e-6)


def test_inverse_parameter_transform_module():
    char, gt, _, _ = _setup()
    ipt = InverseParameterTransformModule(char)
    jp = torch.tensor(np.asarray(char.joint_parameters(gt)))
    back = ipt(jp)
    np.testing.assert_allclose(back.detach().numpy(), np.asarray(gt),
                               atol=1e-4)
    # differentiable
    jp2 = jp.clone().requires_grad_(True)
    ipt(jp2).sum().backward()
    assert torch.isfinite(jp2.grad).all()
