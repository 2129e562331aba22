"""End-to-end IK target-recovery per error family.

Mirrors the reference's inverse_kinematics_test.cpp: build targets from a
known ground-truth pose (so a zero-residual optimum exists), start the solve
from a perturbed pose, and assert the solver drives the energy (essentially)
to zero. This exercises the full solver + analytic-Jacobian + error-function
integration, complementing the FD-gradient catalog sweep
(tests/test_error_catalog.py)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import momentum_tpu.errors as E
from momentum_tpu.math import quaternion as quat
from momentum_tpu.math import skel_state as ss
from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
from momentum_tpu.solver.ik import solve_ik
from momentum_tpu.testing.fixtures import create_test_character

_RNG_SEED = 12345


def _setup():
    rng = np.random.default_rng(_RNG_SEED)
    char = create_test_character(4)
    gt = jnp.asarray(
        rng.uniform(-0.4, 0.4, char.num_model_parameters), jnp.float32)
    states = char.skeleton_states(gt)
    return rng, char, gt, states


def _world_point(states, j, offset):
    return ss.transform_points(states[j], jnp.asarray(offset, jnp.float32))


def _world_dir(states, j, d):
    _, q, _ = ss.split(states[j])
    return quat.rotate_vector(q, jnp.asarray(d, jnp.float32))


def _families():
    rng, char, gt, states = _setup()
    nj = char.num_joints
    parents = np.asarray([1, 2, nj - 1], np.int32)
    offs = rng.uniform(-0.4, 0.4, (3, 3)).astype(np.float32)
    pts = jnp.stack([_world_point(states, int(j), o)
                     for j, o in zip(parents, offs)])
    dirs_local = rng.normal(size=(3, 3)).astype(np.float32)
    dirs_local /= np.linalg.norm(dirs_local, axis=1, keepdims=True)
    dirs_world = jnp.stack([_world_dir(states, int(j), d)
                            for j, d in zip(parents, dirs_local)])

    out = {}
    out["position"] = E.PositionErrorFunction.create(
        parents, offs, np.asarray(pts))

    _, q_all, _ = ss.split(states)
    out["orientation"] = E.OrientationErrorFunction.create(
        parents, np.asarray(q_all)[parents])

    # aim: target point lies along the local ray at distance 2
    aim_targets = np.asarray(pts + 2.0 * dirs_world)
    out["aim_dir"] = E.AimDirErrorFunction.create(
        parents, offs, dirs_local, aim_targets)

    out["fixed_axis_diff"] = E.FixedAxisDiffErrorFunction.create(
        parents, dirs_local, np.asarray(dirs_world))

    # normal: plane through the gt point → zero residual at gt
    out["normal"] = E.NormalErrorFunction.create(
        parents, offs, dirs_local, np.asarray(pts))

    anchor = rng.uniform(-1.0, 1.0, (3, 3)).astype(np.float32)
    dist = np.linalg.norm(np.asarray(pts) - anchor, axis=1)
    out["distance"] = E.DistanceErrorFunction.create(
        parents, offs, anchor, dist)

    # projection: pinhole-style 3x4 with offset principal axis
    proj = np.zeros((3, 3, 4), np.float32)
    proj[:, 0, 0] = proj[:, 1, 1] = 200.0
    proj[:, 2, 2] = 1.0
    proj[:, 2, 3] = 8.0
    hom = np.einsum("cij,cj->ci", proj[:, :, :3], np.asarray(pts)) \
        + proj[:, :, 3]
    uv = hom[:, :2] / hom[:, 2:3]
    out["projection"] = E.ProjectionErrorFunction.create(
        parents, offs, proj, uv, near_clip=0.01)

    # joint-to-joint position: relative offset in the reference frame
    src, ref = np.asarray([nj - 1, 2], np.int32), np.asarray([0, 1], np.int32)
    so = rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32)
    ro = rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32)
    p_src = jnp.stack([_world_point(states, int(j), o)
                       for j, o in zip(src, so)])
    p_ref = jnp.stack([_world_point(states, int(j), o)
                       for j, o in zip(ref, ro)])
    _, q_ref, _ = ss.split(states[jnp.asarray(ref)])
    rel = quat.rotate_vector(quat.conjugate(q_ref), p_src - p_ref)
    out["joint_to_joint_position"] = E.JointToJointPositionErrorFunction.create(
        src, ref, so, ro, np.asarray(rel))

    out["state"] = E.StateErrorFunction.create(states)

    from momentum_tpu.compat import skin_points_from_model_parameters

    vid = np.arange(0, char.mesh.num_vertices, 7, dtype=np.int32)
    posed = np.asarray(skin_points_from_model_parameters(char, gt))[vid]
    out["vertex_position"] = E.VertexPositionErrorFunction.create(vid, posed)

    from momentum_tpu.camera import Camera, PinholeIntrinsics

    cam = Camera.create(
        PinholeIntrinsics.create(400.0, 400.0, 320.0, 240.0),
        jnp.asarray([0.0, 0.0, 8.0, 0.0, 0.0, 0.0, 1.0, 1.0]))
    cam_uv, _ = cam.project(pts)  # (C, 3): pixel u, v, eye-depth
    out["camera_projection"] = E.CameraProjectionErrorFunction.create(
        cam, parents, offs, np.asarray(cam_uv)[:, :2])

    return char, gt, out


_CHAR, _GT, _FAMILY_MAP = _families()


@pytest.mark.parametrize("family", sorted(_FAMILY_MAP))
def test_ik_recovers_target(family):
    fn = SkeletonSolverFunction(_CHAR, (_FAMILY_MAP[family],))
    # sanity: targets were built from the ground-truth pose
    e_gt = float(fn.error(_GT))
    assert e_gt < 1e-7, f"target construction broken for {family}: {e_gt}"

    rng = np.random.default_rng(99)
    x0 = _GT + jnp.asarray(
        rng.normal(0, 0.08, _GT.shape), jnp.float32)
    e0 = float(fn.error(x0))
    assert e0 > 1e-6  # the perturbation must actually move the energy

    # reference-style GN damping (gauss_newton_solver.h:22 defaults to 0.05;
    # undamped GN overshoots on these few-constraint underdetermined toys)
    opts = SolverOptions(max_iterations=80, regularization=0.01,
                         energy_from_residual=True)
    res = solve_ik(fn, x0, None, opts, method="gauss_newton")
    e_final = float(fn.error(res.params))
    assert np.isfinite(e_final)
    assert e_final < 1e-7, (
        f"{family}: start {e0:.3e} → final {e_final:.3e}")


def test_ik_recovery_combined_stack():
    """All families jointly still recover the ground-truth optimum."""
    fns = tuple(_FAMILY_MAP[k] for k in sorted(_FAMILY_MAP))
    fn = SkeletonSolverFunction(_CHAR, fns)
    assert float(fn.error(_GT)) < 1e-6
    rng = np.random.default_rng(7)
    x0 = _GT + jnp.asarray(rng.normal(0, 0.05, _GT.shape), jnp.float32)
    opts = SolverOptions(max_iterations=50, regularization=1e-7,
                         energy_from_residual=True)
    res = solve_ik(fn, x0, None, opts, method="levenberg_marquardt")
    assert float(fn.error(res.params)) < 1e-7
