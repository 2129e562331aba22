"""End-to-end miniatures of the five BASELINE.json configs (CPU-runnable;
the TPU bench covers config 3 at scale)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import momentum_tpu.errors as E
from momentum_tpu.character.blend_shape import BlendShape
from momentum_tpu.character.utility import add_blend_shape_parameters
from momentum_tpu.solver import (
    SkeletonSolverFunction,
    SolverOptions,
    solve_gauss_newton,
    solve_levenberg_marquardt,
)
from momentum_tpu.testing.fixtures import create_test_character


def _rng():
    return np.random.default_rng(12345)


def test_config1_single_frame_position_gn():
    """Config 1: bundled-style test character, position GN IK, one frame."""
    char = create_test_character(4)
    rng = _rng()
    theta_star = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                             jnp.float32)
    targets = char.locators.world_positions(char.skeleton_states(theta_star))
    ef = E.PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets))
    fn = SkeletonSolverFunction(char, (ef,))
    res = solve_gauss_newton(fn.residual, fn.error,
                             jnp.zeros(char.num_model_parameters),
                             options=SolverOptions(max_iterations=40,
                                                   regularization=1e-5))
    assert float(fn.error(res.params)) < 1e-8


def test_config2_full_residual_lm():
    """Config 2: position+orientation+limit+pose-prior residuals, LM."""
    char = create_test_character(4)
    rng = _rng()
    p = char.num_model_parameters
    theta_star = jnp.asarray(
        np.clip(rng.uniform(-0.25, 0.25, p), -0.09, 0.09), jnp.float32)
    states = char.skeleton_states(theta_star)
    pos = E.PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(char.locators.world_positions(states)))
    from momentum_tpu.math import skel_state as ss
    _, q, _ = ss.split(states)
    ori = E.OrientationErrorFunction.create([char.num_joints - 1],
                                            [np.asarray(q[-1])], weight=0.5)
    lim = E.LimitErrorFunction.create()
    prior = E.Mppca.from_components(
        np.ones(2) / 2, np.tile(np.asarray(theta_star), (2, 1)),
        [rng.normal(size=(p, 2)) * 0.5 for _ in range(2)],
        [0.3, 0.4], names=tuple(char.parameter_transform.names))
    pp = E.PosePriorErrorFunction.create(prior, char.parameter_transform.names,
                                         weight=0.1)
    fn = SkeletonSolverFunction(char, (pos, ori, lim, pp))
    assert fn.fully_analytic
    res = solve_levenberg_marquardt(
        fn.residual, fn.error, jnp.zeros(p),
        options=SolverOptions(max_iterations=60, regularization=1e-6),
        jacobian_fn=fn.residual_and_jacobian)
    # marker residual at the optimum is small (prior pulls slightly off GT)
    pos_fn = SkeletonSolverFunction(char, (pos,))
    assert float(pos_fn.error(res.params)) < 1e-4


def test_config4_shape_and_pose_fitting():
    """Config 4: LBS + blend shapes with vertex residuals, shape+pose jointly."""
    rng = _rng()
    base = create_test_character(4)
    v = base.mesh.num_vertices
    k = 3
    bs = BlendShape(
        base_shape=base.mesh.vertices,
        shape_vectors=jnp.asarray(rng.normal(size=(k, v, 3)) * 0.05, jnp.float32))
    char = add_blend_shape_parameters(base, bs)
    p = char.num_model_parameters

    gt = np.zeros(p, np.float32)
    gt[:base.num_model_parameters] = np.clip(
        rng.uniform(-0.2, 0.2, base.num_model_parameters), -0.09, 0.09)
    gt[base.num_model_parameters:] = rng.uniform(-0.8, 0.8, k)
    gt = jnp.asarray(gt)

    # ground-truth posed mesh via the solver-function context
    probe = SkeletonSolverFunction(
        char, (E.VertexPositionErrorFunction.create([0], np.zeros((1, 3))),))
    target_vertices = probe.context(gt).mesh_vertices

    idx = rng.choice(v, 40, replace=False)
    ef = E.VertexPositionErrorFunction.create(idx, np.asarray(target_vertices)[idx])
    reg = E.ModelParametersErrorFunction.create(np.zeros(p), weight=1e-4)
    fn = SkeletonSolverFunction(char, (ef, reg))
    res = solve_levenberg_marquardt(
        fn.residual, fn.error, jnp.zeros(p),
        options=SolverOptions(max_iterations=60, regularization=1e-6))
    final = probe.context(res.params).mesh_vertices
    err = float(jnp.max(jnp.linalg.norm(final[idx] - target_vertices[idx], axis=-1)))
    assert err < 5e-3


def test_config3_fullbody_warm_started_tracking():
    """Config 3 shape at full-body scale: 51 joints / 157 params / 80 markers,
    warm-started batched LM — the bench.py workload, verified to converge."""
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    assert char.num_joints >= 50
    assert char.num_model_parameters >= 150
    rng = _rng()
    b = 16
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (b, char.num_model_parameters)),
                     jnp.float32)
    targets = jax.vmap(char.locators.world_positions)(
        jax.vmap(char.skeleton_states)(gt))
    ef0 = E.PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    ef = dataclasses.replace(ef0, target=targets)
    fn = SkeletonSolverFunction(char, (ef,))
    x0 = gt + jnp.asarray(rng.normal(0, 0.05, gt.shape), jnp.float32)
    res = solve_levenberg_marquardt(
        fn.residual, fn.error, x0,
        options=SolverOptions(max_iterations=6, regularization=1e-5,
                              energy_from_residual=True),
        jacobian_fn=fn.residual_and_jacobian)
    e = np.asarray(res.error)
    assert np.median(e) < 1e-6
    assert (e < 1e-5).mean() > 0.9
