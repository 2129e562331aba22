"""Character surgery invariants (simplify / bake / subset / joint-map).

Mirrors the reference's simplify_test.cpp, skeleton_bake_test.cpp and
parameter_transform_test.cpp behavioral checks: surgery must not change the
kinematics of what survives."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from momentum_tpu.character.utility import (
    bake_blend_shape,
    map_parameter_transform_joints,
    simplify,
    simplify_parameter_transform,
    split_parameters,
    subset_parameter_transform,
    scale_character,
    transform_character,
)
from momentum_tpu.math import skel_state as ss
from momentum_tpu.testing.fixtures import create_test_character

SEED = 12345


def _pose(char, rng, scale=0.3):
    return jnp.asarray(
        rng.uniform(-scale, scale, char.num_model_parameters), jnp.float32)


def test_simplify_preserves_kept_joint_kinematics():
    """Kept joints' world transforms are identical after simplify
    (simplify_test.cpp invariant)."""
    char = create_test_character(6)
    rng = np.random.default_rng(SEED)
    # enable only root + the two joint-local parameters that drive joint1/2
    enabled = np.zeros(char.num_model_parameters, bool)
    for i, n in enumerate(char.parameter_transform.names):
        if n.startswith("root_") or n in ("joint1_rx", "shared_rz"):
            enabled[i] = True
    simp = simplify(char, enabled)
    assert simp.skeleton.num_joints < char.skeleton.num_joints

    x = np.asarray(split_parameters(char.parameter_transform,
                                    _pose(char, rng), enabled))
    # map the (masked) params across by name
    name_to_new = {n: i for i, n in enumerate(simp.parameter_transform.names)}
    x_new = np.zeros(simp.num_model_parameters, np.float32)
    for i, n in enumerate(char.parameter_transform.names):
        if n in name_to_new:
            x_new[name_to_new[n]] = float(x[i])
    states_old = char.skeleton_states(jnp.asarray(x))
    states_new = simp.skeleton_states(jnp.asarray(x_new))
    for j_new, name in enumerate(simp.skeleton.joint_names):
        j_old = char.skeleton.joint_names.index(name)
        np.testing.assert_allclose(
            np.asarray(states_new[j_new]), np.asarray(states_old[j_old]),
            atol=1e-5, err_msg=name)


def test_simplify_noop_when_all_enabled():
    char = create_test_character(4)
    simp = simplify(char)
    assert simp.skeleton.num_joints == char.skeleton.num_joints


def test_subset_parameter_transform_apply_matches_masked_full():
    char = create_test_character(5)
    rng = np.random.default_rng(SEED)
    keep = np.zeros(char.num_model_parameters, bool)
    keep[[0, 2, 5, 7]] = True
    sub = subset_parameter_transform(char.parameter_transform, keep)
    assert sub.num_model_parameters == 4
    x_sub = jnp.asarray(rng.normal(0, 0.3, 4), jnp.float32)
    x_full = np.zeros(char.num_model_parameters, np.float32)
    x_full[np.nonzero(keep)[0]] = np.asarray(x_sub)
    np.testing.assert_allclose(
        np.asarray(sub.apply(x_sub)),
        np.asarray(char.parameter_transform.apply(jnp.asarray(x_full))),
        atol=1e-6)


def test_simplify_parameter_transform_remaps_limits():
    char = create_test_character(5)
    keep = np.ones(char.num_model_parameters, bool)
    keep[1] = False  # drop root_ty
    out = simplify_parameter_transform(char, keep)
    assert out.num_model_parameters == char.num_model_parameters - 1
    assert "root_ty" not in out.parameter_transform.names


def test_bake_blend_shape():
    from momentum_tpu.character.blend_shape import BlendShape

    char = create_test_character(4)
    rng = np.random.default_rng(SEED)
    nv = char.mesh.num_vertices
    basis = BlendShape(
        base_shape=char.mesh.vertices,
        shape_vectors=jnp.asarray(rng.normal(0, 0.1, (3, nv, 3)),
                                  jnp.float32))
    char = dataclasses.replace(char, blend_shape=basis)
    coeffs = jnp.asarray(rng.normal(0, 0.5, 3), jnp.float32)
    expected = np.asarray(char.blend_shape.apply(coeffs))
    baked = bake_blend_shape(char, coeffs)
    assert baked.blend_shape is None
    np.testing.assert_allclose(np.asarray(baked.mesh.vertices), expected,
                               atol=1e-6)


def test_map_parameter_transform_joints_permutation():
    """A permuted skeleton with a permuted transform produces permuted
    joint parameters (mapParameterTransformJoints round trip)."""
    char = create_test_character(4)
    rng = np.random.default_rng(SEED)
    nj = char.skeleton.num_joints
    perm = np.asarray([0, 2, 1, 3])  # target index per source joint
    pt2 = map_parameter_transform_joints(char.parameter_transform, nj, perm)
    x = _pose(char, rng)
    jp_old = np.asarray(char.parameter_transform.apply(x)).reshape(nj, 7)
    jp_new = np.asarray(pt2.apply(x)).reshape(nj, 7)
    for sj, tj in enumerate(perm):
        np.testing.assert_allclose(jp_new[tj], jp_old[sj], atol=1e-6)


def test_scale_character_scales_world_positions():
    char = create_test_character(4)
    rng = np.random.default_rng(SEED)
    x = _pose(char, rng)
    scaled = scale_character(char, 2.0)
    # translation params are in world units: scale them along
    x_scaled = np.asarray(x).copy()
    for i, n in enumerate(char.parameter_transform.names):
        if n in ("root_tx", "root_ty", "root_tz"):
            x_scaled[i] *= 2.0
    pos_old = np.asarray(char.locators.world_positions(
        char.skeleton_states(x)))
    pos_new = np.asarray(scaled.locators.world_positions(
        scaled.skeleton_states(jnp.asarray(x_scaled))))
    np.testing.assert_allclose(pos_new, pos_old * 2.0, atol=1e-5)


def test_transform_character_rigid():
    char = create_test_character(4)
    rng = np.random.default_rng(SEED)
    x = _pose(char, rng)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    xf = jnp.asarray([0.5, -1.0, 2.0, *q, 1.0], jnp.float32)
    moved = transform_character(char, xf)
    pos_old = np.asarray(char.locators.world_positions(
        char.skeleton_states(jnp.zeros_like(x))))
    pos_new = np.asarray(moved.locators.world_positions(
        moved.skeleton_states(jnp.zeros_like(x))))
    expected = np.asarray(ss.transform_points(xf, jnp.asarray(pos_old)))
    np.testing.assert_allclose(pos_new, expected, atol=1e-5)


def test_add_rigid_transform_node():
    """New root-level joint with 6 rigid DOF parameters
    (character_utility.cpp:862 addRigidTransformNode)."""
    from momentum_tpu.character.utility import add_rigid_transform_node

    char = create_test_character(4)
    q = np.asarray([0.0, 0.0, np.sin(0.3), np.cos(0.3)], np.float32)
    out, bone, pstart = add_rigid_transform_node(
        char, "camera", translation_offset=(1.0, 2.0, 3.0), pre_rotation=q)
    assert bone == char.skeleton.num_joints
    assert pstart == char.num_model_parameters
    assert out.num_model_parameters == char.num_model_parameters + 6
    assert out.parameter_transform.names[pstart:] == (
        "camera_tx", "camera_ty", "camera_tz",
        "camera_rx", "camera_ry", "camera_rz")
    assert int(np.asarray(out.skeleton.joint_parent)[bone]) < 0

    # new parameters drive ONLY the new joint; original FK is unchanged
    rng = np.random.default_rng(12345)
    x_old = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                        jnp.float32)
    x_new = jnp.concatenate([x_old, jnp.asarray([0.5, 0, 0, 0, 0, 0.7])])
    states_old = char.skeleton_states(x_old)
    states_new = out.skeleton_states(x_new)
    np.testing.assert_allclose(np.asarray(states_new[:bone]),
                               np.asarray(states_old), atol=1e-6)
    # the node's world translation = offset + its tx parameter
    np.testing.assert_allclose(np.asarray(states_new[bone, :3]),
                               [1.5, 2.0, 3.0], atol=1e-6)
