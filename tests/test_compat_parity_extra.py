"""pymomentum.geometry surface added in round 2's parity sweep:
strip_joints / replace_skeleton_hierarchy / load_markers(+from_bytes) /
load_motion / texture aliases / is_fbxsdk_available, plus the limit
map/concat helpers they build on (geometry_pybind.cpp:748-1005,
character_utility.cpp:572-758)."""

import dataclasses
import os

import numpy as np
import pytest

import jax.numpy as jnp

import momentum_tpu.compat as compat
from momentum_tpu.character.character import Character, Locators
from momentum_tpu.character.limits import concat_limits, make_limits, map_limits
from momentum_tpu.character.parameter_transform import ParameterTransform
from momentum_tpu.character.skeleton import make_skeleton
from momentum_tpu.character.utility import replace_skeleton_hierarchy
from momentum_tpu.testing.fixtures import create_test_character

REF_C3D = "/root/reference/momentum/test/resources/markers.c3d"


def _make_char(names, parents, pnames, drive):
    nj = len(names)
    skel = make_skeleton(parents, names=names)
    tf = np.zeros((nj * 7, len(pnames)), np.float32)
    for p, (j, k) in enumerate(drive):
        tf[j * 7 + k, p] = 1.0
    pt = ParameterTransform(transform=jnp.asarray(tf),
                            offsets=jnp.zeros(nj * 7), names=tuple(pnames))
    return Character(skeleton=skel, parameter_transform=pt)


class TestReplaceSkeletonHierarchy:
    def _pair(self):
        tgt = _make_char(
            ["root", "spine", "hand", "finger_t"], [-1, 0, 1, 2],
            ["t_tx", "t_hand_rx", "t_finger"], [(0, 0), (2, 3), (3, 3)])
        src = _make_char(
            ["srcroot", "arm", "hand", "f1", "f2"], [-1, 0, 1, 2, 2],
            ["s_tx", "s_f1_rx", "s_f2_rx"], [(0, 0), (3, 3), (4, 3)])
        return src, tgt

    def test_joint_splice(self):
        src, tgt = self._pair()
        out = replace_skeleton_hierarchy(src, tgt, "hand", "hand")
        assert out.skeleton.joint_names == ("root", "spine", "hand", "f1", "f2")
        assert np.asarray(out.skeleton.joint_parent).tolist() == [-1, 0, 1, 2, 2]
        out.skeleton.validate()

    def test_parameters_merged_by_surviving_joints(self):
        src, tgt = self._pair()
        out = replace_skeleton_hierarchy(src, tgt, "hand", "hand")
        # t_finger's joint was replaced; s_tx's joints were not spliced in
        assert out.parameter_transform.names == (
            "t_tx", "t_hand_rx", "s_f1_rx", "s_f2_rx")
        # spliced columns drive the combined joint rows
        tf = np.asarray(out.parameter_transform.transform)
        assert tf[3 * 7 + 3, 2] == 1.0  # s_f1_rx → f1.rx
        assert tf[4 * 7 + 3, 3] == 1.0  # s_f2_rx → f2.rx

    def test_locators_prefer_source_and_drop_removed(self):
        src, tgt = self._pair()
        tgt = dataclasses.replace(tgt, locators=Locators(
            parent=jnp.asarray([1, 3], jnp.int32), offset=jnp.zeros((2, 3)),
            weight=jnp.ones(2), names=("spine_loc", "shared_loc")))
        src = dataclasses.replace(src, locators=Locators(
            parent=jnp.asarray([3], jnp.int32),
            offset=jnp.ones((1, 3)), weight=jnp.ones(1),
            names=("shared_loc",)))
        out = replace_skeleton_hierarchy(src, tgt, "hand", "hand")
        assert out.locators.names == ("spine_loc", "shared_loc")
        # shared_loc came from the source: offset 1s, parent = f1 (index 3)
        assert np.asarray(out.locators.offset)[1].tolist() == [1.0, 1.0, 1.0]
        assert int(np.asarray(out.locators.parent)[1]) == 3

    def test_limits_remap(self):
        src, tgt = self._pair()
        tgt = dataclasses.replace(tgt, limits=make_limits(
            minmax=[(1, -1.0, 1.0, 2.0),   # t_hand_rx — survives
                    (2, -1.0, 1.0, 1.0)],  # t_finger — dropped with joint
            minmax_joint=[(3, 3, -0.3, 0.3, 1.0, 0)]))  # finger_t — dropped
        src = dataclasses.replace(src, limits=make_limits(
            minmax_joint=[(3, 3, -0.5, 0.5, 1.0, 0)]))  # f1 → combined 3
        out = replace_skeleton_hierarchy(src, tgt, "hand", "hand")
        c = out.limits.counts
        assert c["minmax"] == 1 and c["minmax_joint"] == 1
        assert int(np.asarray(out.limits.minmax_index)[0]) == 1
        assert int(np.asarray(out.limits.minmax_joint_index)[0]) == 3 * 7 + 3

    def test_unknown_roots_raise(self):
        src, tgt = self._pair()
        with pytest.raises(ValueError):
            replace_skeleton_hierarchy(src, tgt, "nope", "hand")
        with pytest.raises(ValueError):
            replace_skeleton_hierarchy(src, tgt, "hand", "nope")


class TestLimitHelpers:
    def test_map_drops_and_renumbers(self):
        lim = make_limits(
            minmax=[(1, -1, 1, 2.0), (3, 0, 2, 1.0)],
            minmax_joint=[(0, 2, -0.5, 0.5, 1.0, 0), (1, 4, 0, 1, 1.0, 1)],
            linear=[(0, 2, 2.0, 0.1, -1, 1, 1.0)],
            halfplane=[(0, 3, 1, 0, 0.2, 1.0)],
            ellipsoid=[(1, 2, [0, 0, 0], np.eye(4), 1.0)])
        jm = np.asarray([0, -1, 1])
        pm = np.asarray([0, 1, -1, 2])
        m = map_limits(lim, jm, pm)
        c = m.counts
        assert c["minmax"] == 2          # params 1, 3 both survive
        assert c["minmax_joint"] == 1    # joint 1 dropped
        assert c["linear"] == 0          # param 2 dropped
        assert c["halfplane"] == 1
        assert c["ellipsoid"] == 0       # joint 1 dropped
        assert np.asarray(m.minmax_index).tolist() == [1, 2]
        assert int(np.asarray(m.minmax_joint_index)[0]) == 0 * 7 + 2

    def test_concat(self):
        a = make_limits(minmax=[(0, -1, 1, 1.0)])
        b = make_limits(minmax=[(2, 0, 1, 2.0)],
                        halfplane=[(0, 1, 1, 0, 0.0, 1.0)])
        c = concat_limits(a, b)
        assert c.counts["minmax"] == 2 and c.counts["halfplane"] == 1
        assert np.asarray(c.minmax_index).tolist() == [0, 2]


class TestStripJoints:
    def test_strip_by_name(self):
        char = create_test_character(4)
        last = char.skeleton.joint_names[-1]
        out = compat.strip_joints(char, [last])
        assert last not in out.skeleton.joint_names
        assert out.skeleton.num_joints == char.skeleton.num_joints - 1

    def test_unknown_joint_raises(self):
        char = create_test_character(3)
        with pytest.raises(ValueError):
            compat.strip_joints(char, ["not_a_joint"])


@pytest.mark.skipif(not os.path.exists(REF_C3D), reason="no reference C3D")
class TestLoadMarkers:
    def test_load_markers_path(self):
        seqs = compat.load_markers(REF_C3D)
        assert len(seqs) == 1
        s = seqs[0]
        assert s.num_frames > 0 and s.num_markers > 0
        assert s.positions.shape == (s.num_frames, s.num_markers, 3)

    def test_from_bytes_matches_path(self):
        with open(REF_C3D, "rb") as f:
            data = f.read()
        a = compat.load_markers(REF_C3D)[0]
        b = compat.load_markers_from_bytes(data, ".c3d")[0]
        assert a.names == b.names
        np.testing.assert_allclose(
            np.nan_to_num(a.positions), np.nan_to_num(b.positions),
            rtol=0, atol=1e-6)

    def test_up_z_rotates(self):
        a = compat.load_markers(REF_C3D)[0]
        z = compat.load_markers(REF_C3D, up="z")[0]
        np.testing.assert_allclose(z.positions[..., 1], a.positions[..., 2])
        np.testing.assert_allclose(z.positions[..., 2], -a.positions[..., 1])

    def test_main_subject_only_false(self):
        seqs = compat.load_markers(REF_C3D, main_subject_only=False)
        assert len(seqs) >= 1
        assert sum(s.num_markers for s in seqs) >= seqs[0].num_markers


class TestLoadMotion:
    def test_glb_motion_identity_round_trip(self, tmp_path):
        from momentum_tpu.io import load_motion, save_character_glb

        char = create_test_character(3)
        rng = np.random.default_rng(0)
        motion = rng.normal(0, 0.1, (5, char.num_model_parameters)).astype(
            np.float32)
        identity = rng.normal(0, 0.02, char.num_joints * 7).astype(np.float32)
        p = tmp_path / "m.glb"
        save_character_glb(p, char, motion=motion, identity=identity)
        m, pnames, ident, jnames = load_motion(p)
        np.testing.assert_allclose(m, motion, atol=1e-6)
        assert pnames == tuple(char.parameter_transform.names)
        np.testing.assert_allclose(ident, identity, atol=1e-6)
        assert jnames == tuple(char.skeleton.joint_names)

    def test_motionless_glb(self, tmp_path):
        from momentum_tpu.io import load_motion, save_character_glb

        char = create_test_character(3)
        p = tmp_path / "c.glb"
        save_character_glb(p, char)
        m, pnames, ident, jnames = load_motion(p)
        assert m is None and ident is None


def test_is_fbxsdk_available():
    assert compat.is_fbxsdk_available() is True


def test_texture_aliases_delegate():
    from momentum_tpu.character import texture_classification as tc

    assert compat.classify_triangles_by_texture.__doc__
    assert compat.split_mesh_by_texture_region.__doc__
    # the aliases call through to the real implementations
    mesh_names = tc.classify_triangles_by_texture.__name__
    assert mesh_names == "classify_triangles_by_texture"


def test_vertices_faces_selections():
    from momentum_tpu.character.character import Mesh
    from momentum_tpu.character.utility import (
        faces_to_vertices, vertices_to_faces)

    mesh = Mesh(vertices=jnp.zeros((5, 3)),
                faces=jnp.asarray([[0, 1, 2], [2, 3, 4]], jnp.int32))
    av = np.asarray([True, True, True, False, True])
    af = vertices_to_faces(mesh, av)
    assert af.tolist() == [True, False]  # face 1 loses vertex 3
    back = faces_to_vertices(mesh, af)
    assert back.tolist() == [True, True, True, False, False]
