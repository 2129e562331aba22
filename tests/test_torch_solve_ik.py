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


class TestSolverModuleSurface:
    """pymomentum.solver module-level functions (solver_pybind.cpp:158-520):
    residual/gradient/jacobian/transform_pose + statistics counters."""

    def _build(self):
        import dataclasses

        import numpy as np

        from momentum_tpu.errors import PositionErrorFunction
        from momentum_tpu.solver import SkeletonSolverFunction
        from momentum_tpu.testing.fixtures import create_test_character

        char = create_test_character(3)
        ef0 = PositionErrorFunction.create(
            np.asarray(char.locators.parent),
            np.asarray(char.locators.offset),
            np.zeros((char.locators.num_locators, 3)))

        def build(inputs):
            return SkeletonSolverFunction(
                char, (dataclasses.replace(ef0, target=inputs["targets"]),))

        return char, build

    def test_residual_gradient_jacobian_consistent(self):
        import numpy as np
        import torch

        import momentum_tpu.torch_interop as ti

        char, build = self._build()
        tgt = torch.full((char.locators.num_locators, 3), 0.1)
        x = torch.zeros(char.num_model_parameters)
        rows = ti.residual(build, x, {"targets": tgt})
        rows2, jac = ti.jacobian(build, x, {"targets": tgt})
        np.testing.assert_allclose(rows.numpy(), rows2.numpy(), atol=1e-6)
        # dE/dθ == 2 Jᵀ r
        g = ti.gradient(build, x, {"targets": tgt})
        np.testing.assert_allclose(
            g.numpy(), 2.0 * jac.numpy().T @ rows.numpy(), atol=1e-4)

    def test_transform_pose_identity(self):
        import numpy as np
        import torch

        import momentum_tpu.torch_interop as ti

        char, _ = self._build()
        x = torch.zeros(char.num_model_parameters)
        out = ti.transform_pose(char, x, torch.from_numpy(
            np.eye(4, dtype=np.float32)))
        np.testing.assert_allclose(out.numpy(), x.numpy(), atol=1e-5)

    def test_statistics_and_aliases(self):
        import momentum_tpu.torch_interop as ti

        assert ti.solve_ik is ti.solve_ik_torch
        ti.reset_gradient_statistics()
        assert ti.get_gradient_statistics()["n_gradient"] == 0
        ti.reset_solve_ik_statistics()
        assert ti.get_solve_ik_statistics()["n_total_solve_ik"] == 0
        ti.set_num_threads(8)  # no-op, must not raise
