"""Inverse FK round-trip + character utility tests (reference:
test/character/skeleton_state_test.cpp inverse FK round trips,
test/character/character_utility_test.cpp)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.character import fk
from momentum_tpu.character.inverse_fk import joint_parameters_from_skeleton_states
from momentum_tpu.character.utility import (
    active_joints_to_parameters,
    bake_blend_shape,
    parameters_to_active_joints,
    remove_joints,
    resample_motion,
    scale_character,
    subset_parameter_transform,
)
from momentum_tpu.testing.fixtures import create_test_character


@pytest.fixture(scope="module")
def char():
    return create_test_character(5)


def _rng():
    return np.random.default_rng(12345)


class TestInverseFK:
    def test_round_trip(self, char):
        rng = _rng()
        # random joint params away from gimbal lock (|ry| < ~1.2)
        nj = char.num_joints
        jp = rng.uniform(-0.8, 0.8, (nj, 7)).astype(np.float32)
        jp[:, 6] = rng.uniform(-0.5, 0.5, nj)  # log2 scale
        jp_flat = jnp.asarray(jp.reshape(-1))
        states = fk.global_skel_states(char.skeleton, jp_flat)
        jp_rec = joint_parameters_from_skeleton_states(char.skeleton, states)
        np.testing.assert_allclose(np.asarray(jp_rec), jp.reshape(-1), atol=2e-5)

    def test_round_trip_through_fk_again(self, char):
        """Even at gimbal poses the recovered params must reproduce the states."""
        rng = _rng()
        nj = char.num_joints
        jp = rng.uniform(-2.5, 2.5, (nj, 7)).astype(np.float32)
        jp[:, 6] = 0.0
        states = fk.global_skel_states(char.skeleton, jnp.asarray(jp.reshape(-1)))
        jp_rec = joint_parameters_from_skeleton_states(char.skeleton, states)
        states2 = fk.global_skel_states(char.skeleton, jp_rec)
        t1, q1, s1 = np.asarray(states[..., :3]), np.asarray(states[..., 3:7]), np.asarray(states[..., 7])
        t2, q2, s2 = np.asarray(states2[..., :3]), np.asarray(states2[..., 3:7]), np.asarray(states2[..., 7])
        np.testing.assert_allclose(t1, t2, atol=1e-3)
        np.testing.assert_allclose(np.abs(np.sum(q1 * q2, axis=-1)), 1.0, atol=1e-5)
        np.testing.assert_allclose(s1, s2, atol=1e-5)


class TestUtilities:
    def test_scale_character(self, char):
        c2 = scale_character(char, 2.0)
        s1 = char.bind_pose()
        s2 = c2.bind_pose()
        np.testing.assert_allclose(
            np.asarray(s2[..., :3]), 2.0 * np.asarray(s1[..., :3]), atol=1e-5)

    def test_active_joint_maps(self, char):
        p = char.num_model_parameters
        enabled = np.zeros(p, bool)
        enabled[char.parameter_transform.parameter_index("joint1_rx")] = True
        aj = parameters_to_active_joints(char.parameter_transform, enabled)
        assert aj[1] and not aj[0] and not aj[2]
        back = active_joints_to_parameters(char.parameter_transform, aj)
        assert back[char.parameter_transform.parameter_index("joint1_rx")]

    def test_subset_parameter_transform(self, char):
        keep = np.zeros(char.num_model_parameters, bool)
        keep[:6] = True
        pt2 = subset_parameter_transform(char.parameter_transform, keep)
        assert pt2.num_model_parameters == 6
        assert pt2.names == char.parameter_transform.names[:6]

    def test_remove_joints(self, char):
        c2 = remove_joints(char, [3])  # removes 3 and its child 4
        assert c2.num_joints == 3
        assert c2.skeleton.joint_names == char.skeleton.joint_names[:3]
        # FK still works
        theta = jnp.zeros(c2.num_model_parameters)
        states = c2.skeleton_states(theta)
        assert states.shape == (3, 8)

    def test_resample_motion(self):
        poses = np.arange(10, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32)
        out = resample_motion(poses, 30.0, 60.0)
        assert out.shape[0] == 19
        np.testing.assert_allclose(out[1], 0.5 * np.ones(3), atol=1e-6)

    def test_bake_blend_shape(self, char):
        from momentum_tpu.character.blend_shape import BlendShape
        rng = _rng()
        v = char.mesh.num_vertices
        bs = BlendShape(
            base_shape=char.mesh.vertices,
            shape_vectors=jnp.asarray(rng.normal(size=(2, v, 3)), jnp.float32) * 0.1,
        )
        c2 = dataclasses.replace(char, blend_shape=bs)
        coeffs = jnp.asarray([0.5, -0.3], jnp.float32)
        c3 = bake_blend_shape(c2, coeffs)
        assert c3.blend_shape is None
        expected = np.asarray(bs.apply(coeffs))
        np.testing.assert_allclose(np.asarray(c3.mesh.vertices), expected, atol=1e-6)


class TestTransformPose:
    def test_rigid_retarget(self, char):
        from momentum_tpu.character.transform_pose import transform_pose
        from momentum_tpu.math import quaternion as quat, skel_state as ss

        rng = _rng()
        theta = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters), jnp.float32)
        q = quat.from_axis_angle(jnp.asarray([0.2, 0.1, -0.3]))
        xf = ss.join(jnp.asarray([1.0, 2.0, -0.5]), q, jnp.ones(1))
        theta2 = transform_pose(char, theta, xf)
        s2 = char.skeleton_states(theta2)
        expected = ss.multiply(xf, char.skeleton_states(theta))
        np.testing.assert_allclose(np.asarray(s2[..., :3]),
                                   np.asarray(expected[..., :3]), atol=1e-5)
        dots = np.abs(np.sum(np.asarray(s2[..., 3:7]) * np.asarray(expected[..., 3:7]),
                             axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_simplify_family():
    import numpy as np
    from momentum_tpu.character.utility import (
        simplify, simplify_parameter_transform, simplify_skeleton,
    )
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(6)
    p = char.num_model_parameters

    # simplify with all params enabled keeps everything
    full = simplify(char)
    assert full.skeleton.num_joints == 6

    # enable only the root translation params: distal joints drop
    enabled = np.zeros(p, bool)
    enabled[:3] = True
    small = simplify(char, enabled)
    assert small.skeleton.num_joints < 6
    assert small.skeleton.num_joints >= 1
    # parents remain topological
    par = np.asarray(small.skeleton.joint_parent)
    assert all(par[i] < i for i in range(1, len(par)))

    # simplify_skeleton keeps ancestors of active joints
    active = np.zeros(6, bool)
    active[5] = True
    anc = simplify_skeleton(char, active)
    assert anc.skeleton.num_joints == 6  # chain: all are ancestors

    # parameter-transform subset drops columns and remaps limits
    keep = np.zeros(p, bool)
    keep[: p // 2] = True
    sub = simplify_parameter_transform(char, keep)
    assert sub.parameter_transform.num_model_parameters == int(keep.sum())
    import jax.numpy as jnp
    e = sub.skeleton_states(jnp.zeros(int(keep.sum())))
    assert np.isfinite(np.asarray(e)).all()


def test_coordinate_system_conversions():
    import numpy as np
    import jax.numpy as jnp
    from momentum_tpu.math.coordinate_system import (
        CoordinateSystem, MOMENTUM_COORDINATE_SYSTEM, UP_Z, UNIT_METER,
        change_matrix, change_quaternion, change_vector, scale_factor,
    )

    blender = CoordinateSystem(up=UP_Z, unit=UNIT_METER)
    mom = MOMENTUM_COORDINATE_SYSTEM
    assert scale_factor(blender, mom) == 100.0
    # Blender +Z-up forward=+Y; Momentum Y-up forward=-Z. A point 1m up in
    # Blender is 100cm up in Momentum:
    v = change_vector(jnp.asarray([0.0, 0.0, 1.0]), blender, mom)
    np.testing.assert_allclose(np.asarray(v), [0.0, 100.0, 0.0], atol=1e-5)
    # round trip is identity
    back = change_vector(v, mom, blender)
    np.testing.assert_allclose(np.asarray(back), [0, 0, 1.0], atol=1e-6)
    # rotations stay proper rotations
    from momentum_tpu.math import quaternion as quat
    q = quat.from_axis_angle(jnp.asarray([0.0, 0, 0.7]))
    q2 = change_quaternion(q, blender, mom)
    m2 = np.asarray(quat.to_rotation_matrix(q2))
    np.testing.assert_allclose(m2 @ m2.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m2), 1.0, atol=1e-5)
    # same-system conversion is identity
    m = change_matrix(jnp.eye(3), mom, mom)
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)


def test_reduce_mesh():
    import numpy as np
    import jax.numpy as jnp
    from momentum_tpu.character.utility import (
        reduce_mesh_by_faces, reduce_mesh_by_vertices,
    )
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4)
    v = char.mesh.num_vertices
    active = np.zeros(v, bool)
    active[: v // 2] = True
    out = reduce_mesh_by_vertices(char, active)
    assert out.mesh.num_vertices == v // 2
    f = np.asarray(out.mesh.faces)
    assert f.size == 0 or f.max() < v // 2
    assert out.skin_weights.index.shape[0] == v // 2
    # reduced character still skins
    from momentum_tpu.character.skinning import skin_points
    out = out.with_inverse_bind_pose()
    states = out.skeleton_states(jnp.zeros(out.num_model_parameters))
    pts = skin_points(out.skin_weights, states, out.inverse_bind_pose,
                      out.mesh.vertices)
    assert np.isfinite(np.asarray(pts)).all()

    nf = np.asarray(char.mesh.faces).shape[0]
    fa = np.zeros(nf, bool)
    fa[:3] = True
    out2 = reduce_mesh_by_faces(char, fa)
    assert np.asarray(out2.mesh.faces).shape[0] == 3
    used = np.unique(np.asarray(char.mesh.faces)[:3])
    assert out2.mesh.num_vertices == len(used)
