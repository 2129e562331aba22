"""Sharded batch IK over the virtual CPU mesh (reference: §2.9 — the
dispenso batch parallel_for mapped to a jax mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.errors import PositionErrorFunction
from momentum_tpu.parallel import default_mesh, solve_ik_sharded
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver.ik import solve_ik
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture(scope="module")
def problem():
    char = create_test_character(6)
    rng = np.random.default_rng(0)
    b = 16
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, (b, char.num_model_parameters)),
                     jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    ef = dataclasses.replace(ef, target=targets)
    fn = SkeletonSolverFunction(char, (ef,))
    x0 = gt + 0.05 * jnp.asarray(
        rng.normal(0, 1, gt.shape), jnp.float32)
    return fn, x0, gt


def test_sharded_matches_single_device(problem):
    fn, x0, gt = problem
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    opts = SolverOptions(max_iterations=10, regularization=1e-6,
                         energy_from_residual=True)
    mesh = default_mesh(8)
    res_sharded = solve_ik_sharded(fn, x0, mesh, options=opts)
    res_single = solve_ik(fn, x0, None, opts, "levenberg_marquardt")
    np.testing.assert_allclose(np.asarray(res_sharded.params),
                               np.asarray(res_single.params), atol=1e-5)
    # each shard actually lives on its device
    shard_devs = {s.device for s in res_sharded.params.addressable_shards}
    assert len(shard_devs) == 8
    # and the solves recovered the ground truth
    np.testing.assert_allclose(np.asarray(res_sharded.params),
                               np.asarray(gt), atol=1e-2)


def test_batch_not_divisible_raises(problem):
    fn, x0, _ = problem
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = default_mesh(8)
    with pytest.raises(ValueError):
        solve_ik_sharded(fn, x0[:10], mesh)


def test_track_poses_sharded_matches_unsharded():
    """Frame-sharded tracking equals the single-device batched tracker."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from momentum_tpu.parallel import track_poses_sharded
    from momentum_tpu.tracking import MarkerSequence
    from momentum_tpu.tracking.config import TrackingConfig
    from momentum_tpu.tracking.tracker import track_poses_batched

    char = create_test_character(4)
    rng = np.random.default_rng(12345)
    frames = 8 * 2  # divisible by the 8-device mesh
    gt = jnp.asarray(rng.uniform(-0.2, 0.2,
                                 (frames, char.num_model_parameters)),
                     jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    pos = jax.vmap(char.locators.world_positions)(states)
    markers = MarkerSequence(
        positions=pos,
        occluded=jnp.zeros(pos.shape[:2], bool),
        names=char.locators.names)
    cfg = TrackingConfig(max_iter=10)

    base = track_poses_batched(char, markers, cfg)
    sharded = track_poses_sharded(char, markers, config=cfg)
    np.testing.assert_allclose(np.asarray(sharded.motion),
                               np.asarray(base.motion), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sharded.errors),
                               np.asarray(base.errors), atol=1e-6)

    with pytest.raises(ValueError, match="not divisible"):
        import dataclasses as _dc

        track_poses_sharded(
            char, _dc.replace(markers, positions=markers.positions[:9],
                              occluded=markers.occluded[:9]), config=cfg)
