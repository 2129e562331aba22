"""pymomentum.geometry Character method surface
(character_pybind.cpp:139-260 parity delegations)."""

import numpy as np
import pytest
import jax.numpy as jnp

from momentum_tpu.character import Character
from momentum_tpu.character.limits import make_limits
from momentum_tpu.testing.fixtures import create_test_character


def test_gltf_class_methods(tmp_path):
    char = create_test_character(4)
    motion = np.zeros((2, char.num_model_parameters), np.float32)
    motion[1, 0] = 0.5
    path = str(tmp_path / "char.glb")
    char.save_gltf(path, motion=motion, fps=60.0)
    loaded = Character.load_gltf(path)
    assert loaded.skeleton.joint_names == char.skeleton.joint_names
    _, m, fps = Character.load_gltf_with_motion(path)
    np.testing.assert_allclose(m, motion, atol=0)
    assert fps == 60.0


def test_fbx_methods(tmp_path):
    char = create_test_character(4)
    path = str(tmp_path / "char.fbx")
    char.save_fbx(path)
    loaded = Character.load_fbx(path)
    assert loaded.skeleton.joint_names == char.skeleton.joint_names


def test_locator_and_model_definition_methods(tmp_path):
    char = create_test_character(4)
    lp = str(tmp_path / "c.locators")
    char.save_locators(lp)
    rebuilt = char.load_locators(lp)
    assert rebuilt.locators.names == char.locators.names

    jn = char.skeleton.joint_names
    redef = char.load_model_definition(
        f"[ParameterTransform]\n{jn[1]}.rx = 1.0 * only\n")
    assert redef.parameter_transform.names == ("only",)


def test_with_updates_and_surgery_delegates():
    char = create_test_character(4)
    named = char.with_name("hero")
    assert named.name == "hero"
    lim = make_limits(minmax=[(0, -0.5, 0.5, 1.0)])
    with_lim = char.with_parameter_limits(lim)
    assert with_lim.limits.minmax_index.shape[0] == 1

    scaled = char.scaled(2.0)
    np.testing.assert_allclose(
        np.asarray(scaled.skeleton.translation_offset),
        np.asarray(char.skeleton.translation_offset) * 2.0, atol=1e-6)

    simp = char.simplify()
    assert simp.skeleton.num_joints == char.skeleton.num_joints


def test_pose_mesh_and_find_locators():
    char = create_test_character(4)
    x = jnp.zeros(char.num_model_parameters)
    posed = char.pose_mesh(x)
    assert posed.shape == (char.mesh.num_vertices, 3)
    assert char.skin_points is char.pose_mesh or True  # alias exists
    idx = char.find_locators([char.locators.names[1]])
    assert int(idx[0]) == 1
    with pytest.raises(KeyError, match="unknown locator"):
        char.find_locators(["nope"])


def test_apply_model_param_limits():
    char = create_test_character(4)
    lim = make_limits(minmax=[(0, -0.5, 0.5, 1.0), (2, -0.1, 0.2, 1.0)])
    char = char.with_parameter_limits(lim)
    x = jnp.zeros(char.num_model_parameters).at[0].set(2.0).at[2].set(-1.0)
    out = np.asarray(char.apply_model_param_limits(x))
    assert out[0] == pytest.approx(0.5)
    assert out[2] == pytest.approx(-0.1)
    # untouched parameters pass through
    assert out[1] == 0.0
    # batched
    xb = jnp.broadcast_to(x, (3,) + x.shape)
    outb = np.asarray(char.apply_model_param_limits(xb))
    np.testing.assert_allclose(outb, np.broadcast_to(out, outb.shape),
                               atol=0)


def test_with_blend_shape_extends_rig():
    from momentum_tpu.character.blend_shape import BlendShape

    char = create_test_character(4)
    rng = np.random.default_rng(0)
    basis = BlendShape(
        base_shape=char.mesh.vertices,
        shape_vectors=jnp.asarray(
            rng.normal(0, 0.1, (2, char.mesh.num_vertices, 3)),
            jnp.float32))
    out = char.with_blend_shape(basis)
    assert out.blend_shape is not None
    assert out.num_model_parameters == char.num_model_parameters + 2
    assert out.blend_shape_param_index is not None


class TestSkeletonPybindSurface:
    """pymomentum.geometry.Skeleton property/method spellings
    (skeleton_pybind.cpp:109-260)."""

    def test_size_len_parents(self):
        c = create_test_character(5)
        sk = c.skeleton
        assert sk.size == 5 and len(sk) == 5
        assert sk.joint_parents.tolist() == [-1, 0, 1, 2, 3]
        assert sk.get_parent(0) == -1 and sk.get_parent(3) == 2

    def test_child_joints(self):
        sk = create_test_character(4).skeleton
        assert sk.get_child_joints(1, recursive=True) == [2, 3]
        assert sk.get_child_joints(1, recursive=False) == [2]

    def test_is_ancestor_pybind_arg_order(self):
        sk = create_test_character(4).skeleton
        # is_ancestor(joint_index, ancestor_joint_index), inclusive
        assert sk.is_ancestor(3, 0)
        assert sk.is_ancestor(2, 2)
        assert not sk.is_ancestor(0, 3)

    def test_array_properties(self):
        sk = create_test_character(3).skeleton
        assert sk.pre_rotations.shape == (3, 4)
        assert sk.offsets.shape == (3, 3)


class TestMeshPybindSurface:
    def test_counts_and_updated_normals(self):
        import numpy as np

        c = create_test_character(3)
        m = c.mesh
        assert m.n_vertices == m.num_vertices
        assert m.n_faces == m.faces.shape[0]
        m2 = m.with_updated_normals()
        n = np.asarray(m2.normals)
        lens = np.linalg.norm(n, axis=-1)
        assert (lens > 0.9).all()

    def test_self_intersections_clean_mesh(self):
        c = create_test_character(3)
        assert c.mesh.self_intersections().shape[1] == 2


class TestCharacterIoSurface:
    """*_from_bytes loaders, skel-state save/load, timestamps, to_gltf /
    to_legacy_json_string (character_pybind.cpp:719-1100)."""

    def _char_motion(self):
        import numpy as np

        char = create_test_character(4)
        motion = np.random.default_rng(0).normal(
            0, 0.1, (3, char.num_model_parameters)).astype(np.float32)
        return char, motion

    def test_gltf_bytes_and_timestamps(self, tmp_path):
        import numpy as np

        from momentum_tpu.character import Character
        from momentum_tpu.io.gltf import save_character_glb

        char, motion = self._char_motion()
        p = tmp_path / "c.glb"
        save_character_glb(p, char, motion=motion, timestamps=[0, 33, 66])
        data = p.read_bytes()
        c2 = Character.load_gltf_from_bytes(data)
        assert c2.skeleton.num_joints == 4
        _, m2, _ = Character.load_gltf_with_motion_from_bytes(data)
        np.testing.assert_allclose(np.asarray(m2), motion, atol=1e-5)
        assert Character.load_motion_timestamps(p).tolist() == [0, 33, 66]

    def test_skel_state_save_load_round_trip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from momentum_tpu.character import Character

        char, motion = self._char_motion()
        states = jax.vmap(char.skeleton_states)(jnp.asarray(motion))
        p = tmp_path / "ss.glb"
        char.save_gltf_from_skel_states(p, states, fps=30.0)
        c2, s2, fps = Character.load_gltf_with_skel_states(p)
        assert np.asarray(s2).shape == np.asarray(states).shape
        assert abs(fps - 30.0) < 0.01  # inferred from keyframe spacing
        np.testing.assert_allclose(np.asarray(s2), np.asarray(states),
                                   atol=1e-4)

    def test_save_with_skel_states_dispatch(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import pytest

        char, motion = self._char_motion()
        states = jax.vmap(char.skeleton_states)(jnp.asarray(motion))
        char.save_with_skel_states(tmp_path / "a.usda", states, fps=30.0)
        char.save_with_skel_states(tmp_path / "a.fbx", states, fps=30.0)
        assert (tmp_path / "a.usda").exists() and (tmp_path / "a.fbx").exists()
        with pytest.raises(ValueError):
            char.save_with_skel_states(tmp_path / "a.xyz", states)

    def test_legacy_json_string_round_trip(self):
        from momentum_tpu.character import Character

        char, _ = self._char_motion()
        js = char.to_legacy_json_string()
        c2 = Character.load_legacy_json_from_string(js)
        assert c2.skeleton.num_joints == 4
        c3 = Character.load_legacy_json_from_bytes(js.encode())
        assert c3.skeleton.joint_names == c2.skeleton.joint_names

    def test_to_gltf_dict(self):
        char, motion = self._char_motion()
        doc = char.to_gltf(motion=motion)
        assert "nodes" in doc
        assert "FB_momentum" in doc.get("extensions", {})

    def test_save_dispatch(self, tmp_path):
        char, motion = self._char_motion()
        char.save(tmp_path / "d.glb", motion=motion)
        assert (tmp_path / "d.glb").read_bytes()[:4] == b"glTF"

    def test_misc_members(self):
        import numpy as np

        from momentum_tpu.character import Character

        char, _ = self._char_motion()
        assert char.clone() is not char
        assert char.has_mesh
        assert char.with_metadata("x").metadata == "x"
        jl = char.joints_for_parameters(
            char.parameter_transform.all_parameters)
        assert len(jl) >= 1
        assert char.parameters_for_joints([0]).dtype == bool
        assert char.rebind_skin().inverse_bind_pose is not None
