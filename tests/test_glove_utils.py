"""Glove utilities (reference: marker_tracking/glove_utils.{h,cpp} +
test/marker_tracking/glove_utils_test.cpp)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.tracking.glove_utils import (
    GloveConfig,
    GloveOffset,
    GloveSequence,
    add_glove_bones,
    add_glove_calibration_parameters,
    bake_glove_offsets_from_params,
    create_glove_character,
    extract_glove_offsets_from_character,
    make_glove_error_functions,
)
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture(scope="module")
def char():
    base = create_test_character(5)
    # rename two joints to wrists so the default config finds them
    names = list(base.skeleton.joint_names)
    names[2] = "l_wrist"
    names[4] = "r_wrist"
    skel = dataclasses.replace(base.skeleton, joint_names=tuple(names))
    return dataclasses.replace(base, skeleton=skel)


def test_add_glove_bones(char):
    out = add_glove_bones(char)
    assert out.skeleton.num_joints == char.skeleton.num_joints + 2
    names = out.skeleton.joint_names
    assert "glove_l_wrist" in names and "glove_r_wrist" in names
    gi = names.index("glove_l_wrist")
    assert int(out.skeleton.joint_parent[gi]) == names.index("l_wrist")
    # parameter transform widened, same model params
    assert out.parameter_transform.num_model_parameters == \
        char.parameter_transform.num_model_parameters
    assert out.parameter_transform.num_joints == out.skeleton.num_joints
    # idempotent
    again = add_glove_bones(out)
    assert again.skeleton.num_joints == out.skeleton.num_joints


def test_add_glove_bones_with_offsets(char):
    off = GloveOffset(translation=np.asarray([0.1, 0.2, 0.3], np.float32),
                      rotation_euler_xyz=np.asarray([0.0, 0.0, np.pi / 2],
                                                    np.float32))
    out = add_glove_bones(char, offsets=(off, GloveOffset()))
    gi = out.skeleton.joint_names.index("glove_l_wrist")
    np.testing.assert_allclose(
        np.asarray(out.skeleton.translation_offset)[gi], [0.1, 0.2, 0.3],
        atol=1e-6)
    q = np.asarray(out.skeleton.pre_rotation)[gi]
    # 90° about z
    np.testing.assert_allclose(np.abs(q), [0, 0, np.sin(np.pi / 4),
                                           np.cos(np.pi / 4)], atol=1e-5)


def test_calibration_parameters_and_extract(char):
    gchar = create_glove_character(char)
    pt = gchar.parameter_transform
    base_p = char.parameter_transform.num_model_parameters
    assert pt.num_model_parameters == base_p + 12
    assert "gloves" in pt.parameter_sets
    assert len(pt.parameter_sets["gloves"]) == 12
    params = np.zeros(pt.num_model_parameters, np.float32)
    i = pt.parameter_index("glove_l_wrist_tx")
    params[i:i + 6] = [0.5, -0.25, 0.1, 0.2, -0.1, 0.3]
    offs = extract_glove_offsets_from_character(gchar, params)
    np.testing.assert_allclose(offs[0].translation, [0.5, -0.25, 0.1],
                               atol=1e-6)
    np.testing.assert_allclose(offs[0].rotation_euler_xyz, [0.2, -0.1, 0.3],
                               atol=1e-6)
    np.testing.assert_allclose(offs[1].translation, 0.0, atol=1e-6)


def test_glove_parameters_drive_fk(char):
    gchar = create_glove_character(char)
    pt = gchar.parameter_transform
    theta = jnp.zeros(pt.num_model_parameters)
    i = pt.parameter_index("glove_l_wrist_ty")
    theta2 = theta.at[i].set(0.7)
    s1 = gchar.skeleton_states(theta)
    s2 = gchar.skeleton_states(theta2)
    gi = gchar.skeleton.joint_names.index("glove_l_wrist")
    d = np.asarray(s2[gi, :3] - s1[gi, :3])
    np.testing.assert_allclose(np.linalg.norm(d), 0.7, atol=1e-5)
    # other joints untouched
    other = np.asarray(s2[:gi, :3] - s1[:gi, :3])
    np.testing.assert_allclose(other, 0.0, atol=1e-6)


def test_bake_offsets_round_trip(char):
    gchar = create_glove_character(char)
    pt = gchar.parameter_transform
    params = np.zeros(pt.num_model_parameters, np.float32)
    i = pt.parameter_index("glove_l_wrist_tx")
    params[i:i + 6] = [0.4, 0.0, -0.2, 0.0, 0.3, 0.0]
    baked = bake_glove_offsets_from_params(char, params, gchar)
    names = baked.skeleton.joint_names
    gi = names.index("glove_l_wrist")
    np.testing.assert_allclose(
        np.asarray(baked.skeleton.translation_offset)[gi], [0.4, 0.0, -0.2],
        atol=1e-6)
    # no glove model parameters on the baked character
    assert baked.parameter_transform.num_model_parameters == \
        char.parameter_transform.num_model_parameters


def test_glove_error_functions_zero_at_truth(char):
    gchar = create_glove_character(char)
    names = gchar.skeleton.joint_names
    # sensors on two finger-ish joints below the left wrist
    fingers = np.asarray([3, names.index("glove_l_wrist")], np.int32)
    fingers = np.asarray([3], np.int32)
    theta = jnp.zeros(gchar.num_model_parameters)
    states = gchar.skeleton_states(theta)
    from momentum_tpu.math import quaternion as quat, skel_state as ss
    gi = names.index("glove_l_wrist")
    t_g, q_g, _ = ss.split(states[gi])
    t_f, q_f, _ = ss.split(states[int(fingers[0])])
    rel_p = quat.rotate_vector(quat.conjugate(q_g), t_f - t_g)
    rel_q = quat.multiply(quat.conjugate(q_g), q_f)
    glove = GloveSequence(
        joint_index=fingers,
        positions=np.asarray(rel_p)[None, None, :],
        orientations=np.asarray(rel_q)[None, None, :],
        valid=np.ones((1, 1), bool),
    )
    pos_ef, ori_ef = make_glove_error_functions(gchar, glove, frame=0)
    from momentum_tpu.solver.skeleton_solver_function import (
        SkeletonSolverFunction,
    )
    fn = SkeletonSolverFunction(gchar, (pos_ef, ori_ef))
    assert float(fn.error(theta)) < 1e-10
    # perturbing the glove bone produces error
    i = gchar.parameter_transform.parameter_index("glove_l_wrist_tx")
    assert float(fn.error(theta.at[i].set(0.3))) > 1e-4


def test_invalid_sensors_are_ignored(char):
    gchar = create_glove_character(char)
    glove = GloveSequence(
        joint_index=np.asarray([3], np.int32),
        positions=np.full((1, 1, 3), 99.0, np.float32),  # absurd target
        orientations=np.tile(np.asarray([0, 0, 0, 1.0], np.float32),
                             (1, 1, 1)),
        valid=np.zeros((1, 1), bool),
    )
    pos_ef, ori_ef = make_glove_error_functions(gchar, glove, frame=0)
    from momentum_tpu.solver.skeleton_solver_function import (
        SkeletonSolverFunction,
    )
    fn = SkeletonSolverFunction(gchar, (pos_ef, ori_ef))
    assert float(fn.error(jnp.zeros(gchar.num_model_parameters))) == 0.0


def test_missing_wrist_skipped():
    base = create_test_character(4)  # no joints named *_wrist
    out = add_glove_bones(base)
    assert out.skeleton.num_joints == base.skeleton.num_joints
    out2 = add_glove_calibration_parameters(out)
    assert out2.parameter_transform.num_model_parameters == \
        base.parameter_transform.num_model_parameters


def test_glove_data_plumbs_into_trackers(char):
    """Glove sensor streams ride the per-frame and sequence trackers
    (marker_tracker.h:165-199 leftGloveData/rightGloveData spans)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from momentum_tpu.math import skel_state as ss
    from momentum_tpu.tracking import (
        MarkerSequence, TrackingConfig, track_poses_per_frame,
        track_sequence)

    full = create_glove_character(char)
    rng = np.random.default_rng(0)
    F = 4
    gt = jnp.asarray(rng.uniform(-0.2, 0.2, (F, full.num_model_parameters)),
                     jnp.float32)
    pos = jax.vmap(full.locators.world_positions)(
        jax.vmap(full.skeleton_states)(gt))
    mk = MarkerSequence(positions=pos,
                        occluded=jnp.zeros(pos.shape[:2], bool),
                        names=tuple(full.locators.names))
    states = jax.vmap(full.skeleton_states)(gt)
    ji = np.asarray([1, 3], np.int32)
    bi = full.skeleton.joint_names.index("glove_l_wrist")
    rel = ss.multiply(ss.inverse(states[:, bi:bi + 1]), states[:, ji])
    glove = GloveSequence(joint_index=ji,
                          positions=np.asarray(rel[..., :3]),
                          orientations=np.asarray(rel[..., 3:7]),
                          valid=np.ones((F, 2), bool))
    cfg = TrackingConfig(max_iter=10, method="levenberg_marquardt")
    r1 = track_poses_per_frame(full, mk, cfg, glove_data=((glove, 0),))
    r2, _ = track_sequence(full, mk, cfg, glove_data=((glove, 0),))
    # glove observations are consistent with the markers → still converges
    assert float(jnp.median(r1.errors)) < 0.2
    assert float(jnp.median(r2.errors)) < 0.2
