"""Per-joint physical mass bodies (reference: character/joint.h:88-114
JointPhysicalProperties, character.h:66 Character::physicalProperties):
pytree, GLB round trip (gltf_builder.cpp:746-752 / gltf_skeleton_io.cpp:151),
URDF <inertial> import (urdf_io.cpp:93-111), scaling policies
(character_utility.cpp:105-130), joint-removal remap (:143-170), and the
COM-error constructor."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from momentum_tpu.character import Character, PhysicalProperties
from momentum_tpu.character.utility import (
    remove_joints,
    scale_character,
    scale_physical_properties,
)
from momentum_tpu.testing.fixtures import create_test_character


def _props(char) -> PhysicalProperties:
    rng = np.random.default_rng(12345)
    nb = 3
    q = rng.normal(0, 1, (nb, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    a = rng.normal(0, 1, (nb, 3, 3)).astype(np.float32)
    inertia = a @ np.transpose(a, (0, 2, 1))  # SPD symmetric
    idx = np.asarray([0, 1, 3], np.int32)
    return PhysicalProperties(
        joint_index=jnp.asarray(idx),
        mass=jnp.asarray([2.0, 1.5, 0.75], jnp.float32),
        center_of_mass_offset=jnp.asarray(
            rng.uniform(-1, 1, (nb, 3)), jnp.float32),
        inertia=jnp.asarray(inertia),
        inertia_rotation=jnp.asarray(q),
        joint_names=tuple(char.skeleton.joint_names[i] for i in idx),
    )


def _char():
    char = create_test_character(5)
    return dataclasses.replace(char, physical_properties=_props(char))


def test_total_mass_and_com_constraint():
    char = _char()
    pp = char.physical_properties
    assert pp.num_bodies == 3
    np.testing.assert_allclose(float(pp.total_mass()), 4.25, rtol=1e-6)
    masses, offsets = pp.com_constraint(char.num_joints)
    assert masses.shape == (char.num_joints,)
    np.testing.assert_allclose(float(jnp.sum(masses)), 4.25, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(offsets)[np.asarray(pp.joint_index)],
        np.asarray(pp.center_of_mass_offset), atol=1e-6)
    # joints without a body carry zero mass
    assert float(masses[2]) == 0.0


def test_glb_round_trip(tmp_path):
    from momentum_tpu.io import load_character_glb, save_character_glb

    char = _char()
    path = tmp_path / "phys.glb"
    save_character_glb(str(path), char)
    loaded, _, _ = load_character_glb(str(path))
    pp0, pp1 = char.physical_properties, loaded.physical_properties
    assert pp1 is not None
    np.testing.assert_array_equal(np.asarray(pp1.joint_index),
                                  np.asarray(pp0.joint_index))
    assert pp1.joint_names == pp0.joint_names
    np.testing.assert_allclose(np.asarray(pp1.mass), np.asarray(pp0.mass),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pp1.center_of_mass_offset),
                               np.asarray(pp0.center_of_mass_offset), rtol=1e-6)
    # inertia is symmetric: 6 stored components reconstruct the matrix
    np.testing.assert_allclose(np.asarray(pp1.inertia),
                               np.asarray(pp0.inertia), rtol=1e-5, atol=1e-6)
    q0 = np.asarray(pp0.inertia_rotation)
    q1 = np.asarray(pp1.inertia_rotation)
    sign = np.sign(np.sum(q0 * q1, axis=1, keepdims=True))
    np.testing.assert_allclose(q1 * sign, q0, atol=1e-6)


@pytest.mark.parametrize("ext", ["usda", "usdc"])
def test_usd_round_trip(tmp_path, ext):
    from momentum_tpu.io import load_usd, load_usda, save_usd, save_usda

    char = _char()
    path = tmp_path / f"phys.{ext}"
    (save_usda if ext == "usda" else save_usd)(str(path), char)
    loaded, _ = (load_usda if ext == "usda" else load_usd)(str(path))
    pp0, pp1 = char.physical_properties, loaded.physical_properties
    assert pp1 is not None and pp1.num_bodies == pp0.num_bodies
    assert pp1.joint_names == pp0.joint_names
    np.testing.assert_allclose(np.asarray(pp1.mass), np.asarray(pp0.mass),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pp1.center_of_mass_offset),
                               np.asarray(pp0.center_of_mass_offset), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pp1.inertia),
                               np.asarray(pp0.inertia), rtol=1e-5, atol=1e-6)


def test_urdf_inertial_import():
    from momentum_tpu.io.urdf import load_urdf

    urdf = """<robot name="r">
      <link name="base">
        <inertial>
          <mass value="3.5"/>
          <origin xyz="0.1 0.2 0.3" rpy="0 0 0"/>
          <inertia ixx="1" ixy="0.1" ixz="0.2" iyy="2" iyz="0.3" izz="3"/>
        </inertial>
      </link>
      <link name="arm"/>
      <joint name="j0" type="revolute">
        <parent link="base"/><child link="arm"/>
        <origin xyz="0 1 0"/><axis xyz="0 0 1"/>
        <limit lower="-1" upper="1"/>
      </joint>
    </robot>"""
    char = load_urdf(urdf)
    pp = char.physical_properties
    assert pp is not None and pp.num_bodies == 1
    assert pp.joint_names == ("base",)
    np.testing.assert_allclose(float(pp.mass[0]), 3.5)
    np.testing.assert_allclose(np.asarray(pp.center_of_mass_offset[0]),
                               [0.1, 0.2, 0.3], rtol=1e-6)
    ine = np.asarray(pp.inertia[0])
    np.testing.assert_allclose(np.diag(ine), [1, 2, 3], rtol=1e-6)
    np.testing.assert_allclose(ine, ine.T, atol=0)
    # identity inertia rotation for rpy 0
    np.testing.assert_allclose(np.asarray(pp.inertia_rotation[0]),
                               [0, 0, 0, 1], atol=1e-7)


@pytest.mark.parametrize("policy,mass_factor,inertia_factor", [
    ("preserve_mass", 1.0, 4.0),
    ("preserve_density", 8.0, 32.0),
])
def test_scaling_policies(policy, mass_factor, inertia_factor):
    char = _char()
    pp0 = char.physical_properties
    s = 2.0
    pp1 = scale_physical_properties(pp0, s, policy)
    np.testing.assert_allclose(np.asarray(pp1.mass),
                               np.asarray(pp0.mass) * mass_factor, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pp1.center_of_mass_offset),
        np.asarray(pp0.center_of_mass_offset) * s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pp1.inertia),
                               np.asarray(pp0.inertia) * inertia_factor,
                               rtol=1e-5)
    # scale_character threads the policy through
    scaled = scale_character(char, s, mass_scale=policy)
    np.testing.assert_allclose(np.asarray(scaled.physical_properties.mass),
                               np.asarray(pp1.mass), rtol=1e-6)


def test_scaling_rejects_unknown_policy():
    with pytest.raises(ValueError):
        scale_physical_properties(_char().physical_properties, 2.0, "nope")


def test_remove_joints_remaps_bodies():
    char = _char()
    # remove joint 1 (and its subtree): bodies on removed joints drop,
    # survivors get remapped indices and keep their names
    names = char.skeleton.joint_names
    out = remove_joints(char, [names[1]])
    pp = out.physical_properties
    # whole subtree of joint 1 goes (topological chain: 2, 3, 4 follow)
    parents = np.asarray(char.skeleton.joint_parent)
    removed = set()
    for j in range(char.num_joints):
        if j == 1 or parents[j] in removed:
            removed.add(j)
    kept_names = [names[i] for i in (0, 1, 3) if i not in removed]
    assert list(pp.joint_names) == kept_names
    for k in range(pp.num_bodies):
        j = int(pp.joint_index[k])
        assert out.skeleton.joint_names[j] == pp.joint_names[k]


def test_com_error_from_physical_properties():
    from momentum_tpu.errors.body import CenterOfMassErrorFunction
    from momentum_tpu.solver.skeleton_solver_function import SkeletonSolverFunction

    char = _char()
    target = jnp.asarray([0.5, 1.0, -0.25], jnp.float32)
    ef = CenterOfMassErrorFunction.from_physical_properties(char, target)
    params = jnp.zeros(char.num_model_parameters, jnp.float32)
    fn = SkeletonSolverFunction(char, (ef,))
    ctx = fn.context(params)
    r = ef.residual(char, ctx)
    assert r.shape == (3,)
    # manual COM: mass-weighted world positions of the body offsets
    pp = char.physical_properties
    from momentum_tpu.math import skel_state as ss

    states = jnp.take(ctx.skel_states, pp.joint_index, axis=0)
    pts = ss.transform_points(states, pp.center_of_mass_offset)
    com = jnp.einsum("bi,b->i", pts, pp.mass) / pp.total_mass()
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(com - target), atol=1e-5)

    with pytest.raises(ValueError):
        CenterOfMassErrorFunction.from_physical_properties(
            create_test_character(3), target)


def test_remove_joints_with_default_joint_names():
    """PhysicalProperties with the default empty joint_names tuple must
    survive remove_joints (the joint_index remap path needs no names)."""
    char = _char()
    pp = dataclasses.replace(char.physical_properties, joint_names=())
    char = dataclasses.replace(char, physical_properties=pp)
    out = remove_joints(char, [char.skeleton.joint_names[1]])
    pp2 = out.physical_properties
    assert pp2.joint_names == ()
    # only the body on the root joint survives (1 and 3 are in the subtree)
    assert pp2.num_bodies == 1
    assert int(pp2.joint_index[0]) == 0
