"""FbxBuilder multi-entity scenes (fbx_builder_pybind.cpp:30-200) and the
USD binding-surface wrappers (io_usd_pybind.cpp:329-520)."""

import numpy as np
import pytest

import jax.numpy as jnp

import momentum_tpu.io.usd as usd
from momentum_tpu.io import FbxBuilder
from momentum_tpu.io.fbx import load_fbx
from momentum_tpu.testing.fixtures import create_test_character
from momentum_tpu.tracking import MarkerSequence


class TestFbxBuilder:
    def test_single_character_with_motion(self, tmp_path):
        char = create_test_character(3)
        motion = np.random.default_rng(0).normal(
            0, 0.1, (4, char.num_model_parameters)).astype(np.float32)
        b = FbxBuilder()
        b.add_character(char, name="hero").add_motion(motion, fps=30.0)
        p = tmp_path / "one.fbx"
        b.save(p)
        c2 = load_fbx(p)
        assert c2.skeleton.num_joints == 3

    def test_multi_entity_scene(self, tmp_path):
        char = create_test_character(3)
        b = FbxBuilder()
        b.add_character(char, name="hero")
        b.add_rigid_body(create_test_character(3), name="prop", parent_joint=1)
        mk = MarkerSequence(
            positions=jnp.asarray(np.random.default_rng(1).normal(
                size=(4, 2, 3)).astype(np.float32)),
            occluded=jnp.zeros((4, 2), bool), names=("a", "b"))
        b.add_marker_sequence(mk, fps=30.0)
        p = tmp_path / "multi.fbx"
        b.save(p)
        c2 = load_fbx(p)
        # 3 hero + 3 prop + (1 root + 2 markers)
        assert c2.skeleton.num_joints == 9
        assert "markers_root" in c2.skeleton.joint_names
        assert "a" in c2.skeleton.joint_names

    def test_rigid_body_is_full_weight_single_joint(self):
        char = create_test_character(3)
        b = FbxBuilder()
        b.add_rigid_body(char, parent_joint=2)
        sw = b._entries[0]["character"].skin_weights
        assert (np.asarray(sw.index)[:, 0] == 2).all()
        np.testing.assert_allclose(np.asarray(sw.weight)[:, 0], 1.0)
        np.testing.assert_allclose(np.asarray(sw.weight)[:, 1:], 0.0)

    def test_animated_mesh(self, tmp_path):
        char = create_test_character(3)
        jp = np.zeros((5, 7), np.float32)
        jp[:, 0] = np.linspace(0, 10, 5)  # animate tx
        b = FbxBuilder()
        b.add_animated_mesh(char.mesh, name="prop", fps=24.0, joint_params=jp)
        p = tmp_path / "anim_mesh.fbx"
        b.save(p)
        assert p.read_bytes()[:18] == b"Kaydara FBX Binary"

    def test_to_bytes_matches_save(self, tmp_path):
        b = FbxBuilder()
        b.add_character(create_test_character(3))
        p = tmp_path / "x.fbx"
        b.save(p)
        assert b.to_bytes() == p.read_bytes()

    def test_motion_by_name_and_errors(self):
        b = FbxBuilder()
        with pytest.raises(ValueError):
            b.add_motion(np.zeros((1, 3)))
        b.add_character(create_test_character(3), name="hero")
        with pytest.raises(ValueError):
            b.add_motion(np.zeros((1, 3)), character_name="nope")
        with pytest.raises(ValueError):
            FbxBuilder().save("/tmp/never.fbx")


class TestUsdBindingSurface:
    def test_is_usd_available(self):
        assert usd.is_usd_available() is True

    def test_motion_tuple_round_trip(self, tmp_path):
        c = create_test_character(3)
        motion = np.random.default_rng(0).normal(
            0, 0.1, (4, c.num_model_parameters)).astype(np.float32)
        p = tmp_path / "c.usdc"
        usd.save_character(p, c, fps=30.0, motion=motion)
        c2, m2, ident, fps = usd.load_character_with_motion(p)
        assert fps == 30.0
        np.testing.assert_allclose(np.asarray(m2), motion, atol=1e-4)
        assert ident.shape == (c.skeleton.num_joints * 7,)

    def test_bytes_variants(self, tmp_path):
        c = create_test_character(3)
        p = tmp_path / "c.usda"
        usd.save_character(p, c)
        data = p.read_bytes()
        c2 = usd.load_character_from_bytes(data)
        assert c2.skeleton.num_joints == 3
        c3, m3, _, _ = usd.load_character_with_motion_from_bytes(data)
        assert m3 is None

    def test_skel_states_round_trip(self, tmp_path):
        c = create_test_character(3)
        motion = np.random.default_rng(1).normal(
            0, 0.1, (3, c.num_model_parameters)).astype(np.float32)
        p = tmp_path / "c.usdc"
        usd.save_character(p, c, motion=motion)
        c2, states, fps = usd.load_character_with_skel_states(p)
        assert states.shape == (3, 3, 8)
        p2 = tmp_path / "c2.usda"
        usd.save_character_from_skel_states(p2, c, states, fps=24.0)
        _, m2, _, _ = usd.load_character_with_motion(p2)
        np.testing.assert_allclose(np.asarray(m2), motion, atol=2e-3)
