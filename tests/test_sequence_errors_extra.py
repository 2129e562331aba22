"""Tests for the j2j / vertex / SDF sequence error functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.sequence import (
    JointToJointSequenceErrorFunction,
    SequenceSolverFunction,
    VertexSequenceErrorFunction,
    solve_sequence,
    stack_frames,
)
from momentum_tpu.solver import SolverOptions
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture(scope="module")
def char():
    return create_test_character(4)


def _rng():
    return np.random.default_rng(12345)


def _tracking_fn(char, f, rng, seq_errors):
    p = char.num_model_parameters
    t = np.linspace(0, 1, f)[:, None]
    thetas = (0.2 * np.sin(2 * np.pi * t + rng.uniform(0, 6, p))).astype(np.float32)
    thetas = jnp.asarray(thetas)
    states = jax.vmap(char.skeleton_states)(thetas)
    targets = jax.vmap(char.locators.world_positions)(states)
    efs = stack_frames([
        PositionErrorFunction.create(
            np.asarray(char.locators.parent), np.asarray(char.locators.offset),
            np.asarray(targets[i])) for i in range(f)
    ])
    return SequenceSolverFunction.create(
        char, f, per_frame_errors=(efs,), sequence_errors=seq_errors)


def test_j2j_sequence_error_solves(char):
    rng = _rng()
    sef = JointToJointSequenceErrorFunction.create(
        [char.num_joints - 1], [0], np.zeros((1, 3)), np.zeros((1, 3)), weight=1e-3)
    fn = _tracking_fn(char, 5, rng, (sef,))
    res = solve_sequence(fn, jnp.zeros((5, fn.num_per_frame)),
                         jnp.zeros((fn.num_universal,)),
                         SolverOptions(max_iterations=20, regularization=1e-5))
    assert float(res.error) < 1e-2


def test_j2j_sequence_zero_for_constant_relative_pose(char):
    """If both frames share the pose, the relative placement diff is zero."""
    sef = JointToJointSequenceErrorFunction.create(
        [char.num_joints - 1], [0], np.zeros((1, 3)), np.zeros((1, 3)))
    fn = _tracking_fn(char, 2, _rng(), (sef,))
    theta = jnp.asarray(_rng().uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
    thetas = jnp.stack([theta, theta])
    ctxs = fn.frame_contexts(thetas)
    r = sef.residual(char, ctxs)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)


def test_vertex_sequence_error_zero_for_static(char):
    rng = _rng()
    sef = VertexSequenceErrorFunction.create(
        rng.integers(0, char.mesh.num_vertices, 5))
    fn = _tracking_fn(char, 2, rng, (sef,))
    theta = jnp.asarray(rng.uniform(-0.2, 0.2, char.num_model_parameters), jnp.float32)
    ctxs = fn.frame_contexts(jnp.stack([theta, theta]))
    r = sef.residual(char, ctxs)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)
