"""FK correctness: numpy golden reference (independent implementation of the
documented semantics, joint_state.cpp:22-66), scan vs binary-lifting
equivalence, derivative axes vs jax.jacfwd."""

import numpy as np
import jax
import jax.numpy as jnp

from momentum_tpu.character import fk, make_skeleton
from momentum_tpu.character.skeleton import PARAMS_PER_JOINT
from momentum_tpu.math import skel_state as ss
from momentum_tpu.testing import create_test_character


# ---------- numpy golden FK ----------

def np_rot(a, ax):
    c, s = np.cos(a), np.sin(a)
    if ax == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if ax == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def np_quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def golden_fk(parents, pre_rot, offsets, joint_params):
    """Returns per-joint 4x4 world matrices. World = Parent · T · Rpre · Rz·Ry·Rx · S."""
    n = len(parents)
    jp = np.asarray(joint_params, np.float64).reshape(n, 7)
    world = []
    for j in range(n):
        t = offsets[j] + jp[j, :3]
        r = np_quat_to_mat(pre_rot[j]) @ np_rot(jp[j, 5], 2) @ np_rot(jp[j, 4], 1) @ np_rot(jp[j, 3], 0)
        s = 2.0 ** jp[j, 6]
        local = np.eye(4)
        local[:3, :3] = r * s
        local[:3, 3] = t
        parent = world[parents[j]] if parents[j] >= 0 else np.eye(4)
        world.append(parent @ local)
    return np.stack(world)


def make_random_chain(rng, n=6):
    parents = [-1] + [rng.integers(0, j) for j in range(1, n)]
    parents = [int(p) for p in parents]
    pre = rng.normal(size=(n, 4))
    pre /= np.linalg.norm(pre, axis=-1, keepdims=True)
    off = rng.normal(size=(n, 3))
    return parents, pre, off


def test_fk_matches_golden_random_tree(rng):
    parents, pre, off = make_random_chain(rng, 8)
    skel = make_skeleton(parents, pre, off)
    jp = rng.normal(size=(8 * PARAMS_PER_JOINT,)) * 0.8
    states = fk.global_skel_states(skel, jnp.asarray(jp, jnp.float32))
    got = np.asarray(ss.to_matrix(states))
    want = golden_fk(parents, pre, off, jp)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_scan_and_lifted_agree(rng):
    parents, pre, off = make_random_chain(rng, 16)
    skel = make_skeleton(parents, pre, off)
    jp = jnp.asarray(rng.normal(size=(4, 16 * PARAMS_PER_JOINT)) * 0.5, jnp.float32)
    a = fk.global_skel_states(skel, jp, method="scan")
    b = fk.global_skel_states(skel, jp, method="lifted")
    np.testing.assert_allclose(np.asarray(ss.to_matrix(a)), np.asarray(ss.to_matrix(b)), atol=1e-5)


def test_fk_jit_vmap(rng):
    char = create_test_character(5)
    n_p = char.num_model_parameters
    mp = jnp.asarray(rng.normal(size=(3, n_p)) * 0.3, jnp.float32)
    f = jax.jit(jax.vmap(char.skeleton_states))
    states = f(mp)
    assert states.shape == (3, 5, 8)
    single = char.skeleton_states(mp[0])
    np.testing.assert_allclose(np.asarray(states[0]), np.asarray(single), atol=1e-6)


def test_locator_positions(rng):
    char = create_test_character(4)
    mp = jnp.zeros(char.num_model_parameters)
    states = char.skeleton_states(mp)
    pos = np.asarray(char.locators.world_positions(states))
    # at rest pose, joint j sits at (0, j, 0); locator = joint pos + offset
    expect = np.asarray(char.locators.offset) + np.stack([np.array([0.0, j, 0.0]) for j in range(4)])
    np.testing.assert_allclose(pos, expect, atol=1e-6)


def test_joint_axes_match_autodiff(rng):
    """translation/rotation/scale derivative axes must match d(world pos)/d(joint param)."""
    parents, pre, off = make_random_chain(rng, 6)
    skel = make_skeleton(parents, pre, off)
    jp0 = jnp.asarray(rng.normal(size=(6 * PARAMS_PER_JOINT,)) * 0.5, jnp.float32)

    # pick a leaf-ish joint and a world point rigidly attached to it
    target_joint = 5
    local_pt = jnp.asarray([0.3, -0.2, 0.5])

    def world_pt(jp):
        states = fk.global_skel_states(skel, jp)
        return ss.transform_points(states[target_joint], local_pt)

    jac = jax.jacfwd(world_pt)(jp0)  # (3, nJ*7)
    states = fk.global_skel_states(skel, jp0)
    trans_axis, rot_axis = fk.joint_axes(skel, jp0, states)
    p = np.asarray(world_pt(jp0))

    parents_np = np.asarray(skel.joint_parent)
    for a in range(6):
        # is `a` an ancestor-or-self of target_joint?
        anc = target_joint
        is_anc = False
        while anc >= 0:
            if anc == a:
                is_anc = True
                break
            anc = parents_np[anc]
        jpos = np.asarray(states[a, :3])
        for i in range(3):
            expect_t = np.asarray(trans_axis[a, :, i]) if is_anc else np.zeros(3)
            np.testing.assert_allclose(np.asarray(jac[:, a * 7 + i]), expect_t, atol=2e-4,
                                       err_msg=f"translation joint {a} axis {i}")
            expect_r = (np.cross(np.asarray(rot_axis[a, :, i]), p - jpos) if is_anc else np.zeros(3))
            np.testing.assert_allclose(np.asarray(jac[:, a * 7 + 3 + i]), expect_r, atol=2e-4,
                                       err_msg=f"rotation joint {a} axis {i}")
        expect_s = (p - jpos) * np.log(2.0) if is_anc else np.zeros(3)
        np.testing.assert_allclose(np.asarray(jac[:, a * 7 + 6]), expect_s, atol=2e-4,
                                   err_msg=f"scale joint {a}")


def test_skinning_matches_rest_pose():
    char = create_test_character(4)
    from momentum_tpu.character import skin_points

    mp = jnp.zeros(char.num_model_parameters)
    states = char.skeleton_states(mp)
    posed = skin_points(char.skin_weights, states, char.inverse_bind_pose, char.mesh.vertices)
    np.testing.assert_allclose(np.asarray(posed), np.asarray(char.mesh.vertices), atol=1e-5)


def test_skinning_rigid_translation():
    char = create_test_character(4)
    from momentum_tpu.character import skin_points

    mp = jnp.zeros(char.num_model_parameters).at[0].set(2.5)  # root_tx
    states = char.skeleton_states(mp)
    posed = skin_points(char.skin_weights, states, char.inverse_bind_pose, char.mesh.vertices)
    np.testing.assert_allclose(
        np.asarray(posed), np.asarray(char.mesh.vertices) + np.array([2.5, 0, 0]), atol=1e-5
    )


def test_skin_points_coo_matches_dense():
    """COO multi-topology skinning equals the dense (V, 8) path
    (trs_backend.py:603 multi_topology_skinning equivalence)."""
    import numpy as np

    from momentum_tpu.character.skinning import skin_points, skin_points_coo
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4).with_inverse_bind_pose()
    rng = np.random.default_rng(12345)
    x = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                    jnp.float32)
    states = char.skeleton_states(x)
    dense = skin_points(char.skin_weights, states, char.inverse_bind_pose,
                        char.mesh.vertices)

    sw_i = np.asarray(char.skin_weights.index)
    sw_w = np.asarray(char.skin_weights.weight)
    v_idx, k_idx = np.nonzero(sw_w > 0)
    coo = skin_points_coo(
        char.mesh.vertices, states, char.inverse_bind_pose,
        jnp.asarray(sw_i[v_idx, k_idx]), jnp.asarray(sw_w[v_idx, k_idx]),
        jnp.asarray(v_idx))
    np.testing.assert_allclose(np.asarray(coo), np.asarray(dense), atol=1e-5)

    # batched, with flattened batch-major indices (two identical topologies)
    b = 3
    xs = jnp.asarray(rng.uniform(-0.3, 0.3,
                                 (b, char.num_model_parameters)), jnp.float32)
    states_b = jax.vmap(char.skeleton_states)(xs)
    dense_b = jax.vmap(lambda s: skin_points(
        char.skin_weights, s, char.inverse_bind_pose,
        char.mesh.vertices))(states_b)
    nj = char.skeleton.num_joints
    nv = char.mesh.num_vertices
    si, swv, vi = [], [], []
    for bi in range(b):
        si.append(sw_i[v_idx, k_idx] + bi * nj)
        swv.append(sw_w[v_idx, k_idx])
        vi.append(v_idx + bi * nv)
    coo_b = skin_points_coo(
        char.mesh.vertices, states_b, char.inverse_bind_pose,
        jnp.asarray(np.concatenate(si)), jnp.asarray(np.concatenate(swv)),
        jnp.asarray(np.concatenate(vi)))
    np.testing.assert_allclose(np.asarray(coo_b), np.asarray(dense_b),
                               atol=1e-5)


def test_inverse_ssd_round_trip():
    """unskin_points inverts skin_points per vertex
    (linear_skinning.h:200-240 applyInverseSSD)."""
    import numpy as np

    from momentum_tpu.character.skinning import skin_points, unskin_points
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(5).with_inverse_bind_pose()
    rng = np.random.default_rng(12345)
    x = jnp.asarray(rng.uniform(-0.4, 0.4, char.num_model_parameters),
                    jnp.float32)
    states = char.skeleton_states(x)
    posed = skin_points(char.skin_weights, states, char.inverse_bind_pose,
                        char.mesh.vertices)
    rest = unskin_points(char.skin_weights, states, char.inverse_bind_pose,
                         posed)
    np.testing.assert_allclose(np.asarray(rest),
                               np.asarray(char.mesh.vertices), atol=2e-5)

    # batched poses
    xs = jnp.asarray(rng.uniform(-0.3, 0.3,
                                 (3, char.num_model_parameters)), jnp.float32)
    states_b = jax.vmap(char.skeleton_states)(xs)
    posed_b = skin_points(char.skin_weights, states_b,
                          char.inverse_bind_pose, char.mesh.vertices)
    rest_b = unskin_points(char.skin_weights, states_b,
                           char.inverse_bind_pose, posed_b)
    np.testing.assert_allclose(
        np.asarray(rest_b),
        np.broadcast_to(np.asarray(char.mesh.vertices), rest_b.shape),
        atol=2e-5)
