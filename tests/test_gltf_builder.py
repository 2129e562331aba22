"""GltfBuilder fluent writer (gltf_builder.h): multi-character documents,
standard glTF animation export, single-character back-compat."""

import json
import struct

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from momentum_tpu.io.gltf import load_character_glb
from momentum_tpu.io.gltf_builder import GltfBuilder, load_all_characters_glb
from momentum_tpu.testing.fixtures import create_test_character


def _read_doc(path):
    with open(path, "rb") as f:
        data = f.read()
    off = 12
    clen, ctype = struct.unpack_from("<II", data, off)
    assert ctype == 0x4E4F534A
    return json.loads(data[off + 8: off + 8 + clen].decode())


def test_single_character_back_compat(tmp_path):
    """One character and no skeleton states delegates to the classic layout,
    readable by the plain loader."""
    char = create_test_character(4)
    motion = np.zeros((3, char.num_model_parameters), np.float32)
    motion[:, 0] = [0.0, 0.5, 1.0]
    path = str(tmp_path / "single.glb")
    GltfBuilder().add_character(char).set_fps(30.0) \
        .add_motion(motion).save(path)
    loaded, m, fps = load_character_glb(path)
    assert loaded.skeleton.joint_names == char.skeleton.joint_names
    np.testing.assert_allclose(m, motion, atol=0)
    assert fps == 30.0


def test_multi_character_round_trip(tmp_path):
    a = create_test_character(4)
    b = create_test_character(6)
    rng = np.random.default_rng(12345)
    motion_b = rng.uniform(-0.2, 0.2,
                           (5, b.num_model_parameters)).astype(np.float32)
    path = str(tmp_path / "multi.glb")
    GltfBuilder().add_character(a, "alice").add_character(b, "bob") \
        .add_motion(motion_b, "bob").save(path)

    out = load_all_characters_glb(path)
    assert [name for name, _, _ in out] == ["alice", "bob"]
    (_, ca, ma), (_, cb, mb) = out
    assert ca.skeleton.joint_names == a.skeleton.joint_names
    assert cb.skeleton.joint_names == b.skeleton.joint_names
    assert ma is None
    np.testing.assert_allclose(mb, motion_b, atol=0)
    # meshes and skinning survive per character
    np.testing.assert_allclose(np.asarray(ca.mesh.vertices),
                               np.asarray(a.mesh.vertices), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cb.mesh.vertices),
                               np.asarray(b.mesh.vertices), atol=1e-6)
    # parameter transforms kept per character
    assert ca.parameter_transform.names == a.parameter_transform.names
    assert cb.parameter_transform.names == b.parameter_transform.names

    # classic loader still reads the FIRST character (back-compat mirror)
    first, _, _ = load_character_glb(path)
    assert first.skeleton.joint_names[:4] == a.skeleton.joint_names


def test_skeleton_states_become_gltf_animations(tmp_path):
    char = create_test_character(4)
    rng = np.random.default_rng(7)
    frames = 4
    mp = jnp.asarray(rng.uniform(-0.3, 0.3,
                                 (frames, char.num_model_parameters)),
                     jnp.float32)
    states = jax.vmap(char.skeleton_states)(mp)
    path = str(tmp_path / "anim.glb")
    GltfBuilder().set_fps(24.0).add_character(char, "hero") \
        .add_skeleton_states(np.asarray(states)).save(path)

    doc = _read_doc(path)
    assert "animations" in doc
    anim = doc["animations"][0]
    nj = char.skeleton.num_joints
    assert len(anim["channels"]) == nj * 3  # T, R, S per joint
    paths = {c["target"]["path"] for c in anim["channels"]}
    assert paths == {"translation", "rotation", "scale"}
    # sampler inputs share one time accessor with min/max metadata
    t_acc = doc["accessors"][anim["samplers"][0]["input"]]
    assert t_acc["count"] == frames
    assert t_acc["min"] == [0.0]
    assert t_acc["max"] == pytest.approx([(frames - 1) / 24.0])

    # the root node's local TRS equals its global state (root has no parent)
    from momentum_tpu.io.gltf import _read_accessor

    with open(path, "rb") as f:
        data = f.read()
    off = 12
    clen, _ = struct.unpack_from("<II", data, off)
    blob_off = off + 8 + clen
    blen, btype = struct.unpack_from("<II", data, blob_off)
    assert btype == 0x004E4942
    blob = data[blob_off + 8: blob_off + 8 + blen]
    root_chan = [c for c in anim["channels"]
                 if c["target"]["node"] == 0
                 and c["target"]["path"] == "translation"][0]
    t_out = _read_accessor(doc, blob,
                           anim["samplers"][root_chan["sampler"]]["output"])
    np.testing.assert_allclose(t_out, np.asarray(states)[:, 0, 0:3],
                               atol=1e-5)


def test_builder_errors():
    b = GltfBuilder()
    with pytest.raises(ValueError, match="add_character"):
        b.add_motion(np.zeros((1, 3)))
    with pytest.raises(ValueError, match="nothing to save"):
        b.save("/tmp/never.glb")
    b.add_character(create_test_character(3), "x")
    with pytest.raises(ValueError, match="duplicate"):
        b.add_character(create_test_character(3), "x")
    with pytest.raises(ValueError, match="unknown character"):
        b.add_motion(np.zeros((1, 3)), "nope")


def test_standard_gltf_animation_loads_back_as_motion():
    """A GLB whose motion is ONLY standard glTF animation channels (no
    FB_momentum motion) loads back through the joint-param inversion +
    rig pseudo-inverse, reproducing the original skeleton states."""
    import tempfile

    char = create_test_character(4)
    rng = np.random.default_rng(3)
    frames = 5
    fps = 120.0  # loader default clock
    mp = jnp.asarray(rng.uniform(-0.3, 0.3,
                                 (frames, char.num_model_parameters)),
                     jnp.float32)
    states = jax.vmap(char.skeleton_states)(mp)

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/anim_only.glb"
        GltfBuilder().set_fps(fps).add_character(char, "hero") \
            .add_skeleton_states(np.asarray(states)).save(path)
        doc = _read_doc(path)
        assert "motion" not in doc["extensions"]["FB_momentum"]
        loaded, motion, _ = load_character_glb(path)

    assert motion is not None and motion.shape[0] == frames
    states2 = jax.vmap(loaded.skeleton_states)(jnp.asarray(motion))
    np.testing.assert_allclose(np.asarray(states2), np.asarray(states),
                               atol=2e-3)


def test_load_with_skel_states_exact():
    """load_character_glb_with_skel_states reproduces the saved GLOBAL
    states exactly through the direct joint-parameter path."""
    import tempfile

    from momentum_tpu.io.gltf import load_character_glb_with_skel_states

    char = create_test_character(4)
    rng = np.random.default_rng(9)
    mp = jnp.asarray(rng.uniform(-0.3, 0.3,
                                 (4, char.num_model_parameters)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(mp)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ss.glb"
        GltfBuilder().set_fps(120.0).add_character(char, "x") \
            .add_skeleton_states(np.asarray(states)).save(path)
        _, states2, _ = load_character_glb_with_skel_states(path)
    np.testing.assert_allclose(np.asarray(states2), np.asarray(states),
                               atol=5e-5)
