"""Round-trip tests for the from-scratch binary FBX writer (io/fbx_writer.py)
through this package's own parser (io/fbx.py).

Reference: fbx_io.h:77-131 saveFbx family (SDK-gated in the reference OSS
build; here implemented natively, so save→load must reproduce skeleton, mesh,
skinning, physical bodies, and sampled motion curves)."""

import dataclasses

import numpy as np
import pytest

from momentum_tpu.character import Character, PhysicalProperties
from momentum_tpu.io.fbx import load_fbx, load_fbx_with_motion
from momentum_tpu.io.fbx_writer import (
    save_fbx,
    save_fbx_model,
    save_fbx_with_joint_params,
)
from momentum_tpu.testing.fixtures import create_test_character


def _quat_close_up_to_sign(a, b, atol=1e-5):
    a = np.asarray(a)
    b = np.asarray(b)
    same = np.abs(a - b).max(axis=-1)
    flip = np.abs(a + b).max(axis=-1)
    assert np.all(np.minimum(same, flip) < atol), (a, b)


def _with_physical(char):
    pp = PhysicalProperties(
        joint_index=np.asarray([0, 2], np.int32),
        mass=np.asarray([5.0, 1.25], np.float32),
        center_of_mass_offset=np.asarray(
            [[0.0, 1.0, 0.5], [0.1, -0.2, 0.3]], np.float32),
        inertia=np.asarray([np.diag([1.0, 2.0, 3.0]),
                            [[0.5, 0.1, 0.0], [0.1, 0.6, 0.05],
                             [0.0, 0.05, 0.7]]], np.float32),
        inertia_rotation=np.asarray(
            [[0.0, 0.0, 0.0, 1.0], [0.0, 0.3826834, 0.0, 0.9238795]],
            np.float32),
        joint_names=(char.skeleton.joint_names[0],
                     char.skeleton.joint_names[2]),
    )
    return dataclasses.replace(char, physical_properties=pp)


def test_rest_round_trip(tmp_path):
    char = _with_physical(create_test_character(5))
    path = str(tmp_path / "char.fbx")
    save_fbx_model(path, char)
    loaded = load_fbx(path)

    assert loaded.skeleton.joint_names == char.skeleton.joint_names
    np.testing.assert_array_equal(
        np.asarray(loaded.skeleton.joint_parent),
        np.asarray(char.skeleton.joint_parent))
    np.testing.assert_allclose(
        np.asarray(loaded.skeleton.translation_offset),
        np.asarray(char.skeleton.translation_offset), atol=1e-6)
    _quat_close_up_to_sign(loaded.skeleton.pre_rotation,
                           char.skeleton.pre_rotation)

    # mesh + top-8 skinning survive
    np.testing.assert_allclose(np.asarray(loaded.mesh.vertices),
                               np.asarray(char.mesh.vertices), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(loaded.mesh.faces),
                                  np.asarray(char.mesh.faces))
    def dense(sw):
        out = np.zeros((char.mesh.vertices.shape[0],
                        char.skeleton.num_joints))
        rows = np.repeat(np.arange(out.shape[0]), sw.index.shape[1])
        np.add.at(out, (rows, np.asarray(sw.index).reshape(-1)),
                  np.asarray(sw.weight).reshape(-1))
        return out

    dense_in = dense(char.skin_weights)
    dense_out = dense(loaded.skin_weights)
    np.testing.assert_allclose(dense_out, dense_in, atol=1e-5)

    # physical bodies (joint index, mass, COM, inertia, rotation)
    pp_in, pp_out = char.physical_properties, loaded.physical_properties
    assert pp_out is not None
    np.testing.assert_array_equal(np.asarray(pp_out.joint_index),
                                  np.asarray(pp_in.joint_index))
    np.testing.assert_allclose(np.asarray(pp_out.mass),
                               np.asarray(pp_in.mass), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pp_out.center_of_mass_offset),
                               np.asarray(pp_in.center_of_mass_offset),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pp_out.inertia),
                               np.asarray(pp_in.inertia), atol=1e-5)
    _quat_close_up_to_sign(pp_out.inertia_rotation, pp_in.inertia_rotation)


def test_pre_rotation_round_trip(tmp_path):
    """Non-trivial pre-rotations must survive the Euler encode/decode."""
    char = create_test_character(4)
    rng = np.random.RandomState(3)
    q = rng.randn(4, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    skel = dataclasses.replace(char.skeleton,
                               pre_rotation=q.astype(np.float32))
    char = dataclasses.replace(char, skeleton=skel, mesh=None,
                               skin_weights=None, inverse_bind_pose=None)
    path = str(tmp_path / "pre.fbx")
    save_fbx_model(path, char)
    loaded = load_fbx(path)
    _quat_close_up_to_sign(loaded.skeleton.pre_rotation, q, atol=1e-5)


def test_joint_param_motion_round_trip(tmp_path):
    char = create_test_character(4)
    nj = char.skeleton.num_joints
    fps = 30.0
    frames = 7
    rng = np.random.RandomState(11)
    jp = np.zeros((frames, nj * 7), np.float32)
    jp[:, 0:3] = rng.randn(frames, 3) * 0.5  # root translation
    jp[:, 3:6] = rng.uniform(-0.8, 0.8, (frames, 3))  # root rotation
    jp[:, 6] = rng.uniform(-0.3, 0.3, frames)  # root log2-scale
    jp[:, 7 * 1 + 3] = np.linspace(0, 1.0, frames)  # joint1 rx ramp

    path = str(tmp_path / "anim.fbx")
    save_fbx_with_joint_params(path, char, jp, fps=fps)
    loaded, motion, out_fps = load_fbx_with_motion(path, fps=fps)
    assert out_fps == fps
    assert motion.shape[0] == frames
    np.testing.assert_allclose(motion, jp, atol=2e-4)


def test_model_param_motion_maps_through_transform(tmp_path):
    char = create_test_character(4)
    frames = 5
    rng = np.random.RandomState(7)
    mp = rng.uniform(-0.5, 0.5,
                     (frames, char.parameter_transform.num_model_parameters))
    mp = mp.astype(np.float32)
    expected_jp = np.asarray(char.parameter_transform.apply(mp))

    path = str(tmp_path / "model_anim.fbx")
    save_fbx(path, char, motion=mp, fps=24.0)
    _, motion, _ = load_fbx_with_motion(path, fps=24.0)
    np.testing.assert_allclose(motion, expected_jp, atol=2e-4)


def test_large_array_compression_path(tmp_path):
    """Vertex arrays above the deflate threshold take the zlib branch."""
    char = create_test_character(12)  # mesh large enough to compress
    assert char.mesh.vertices.size * 8 > 1024
    path = str(tmp_path / "big.fbx")
    save_fbx_model(path, char)
    loaded = load_fbx(path)
    np.testing.assert_allclose(np.asarray(loaded.mesh.vertices),
                               np.asarray(char.mesh.vertices), atol=1e-6)


def test_writer_output_loads_without_motion_api(tmp_path):
    """save_fbx with no motion yields a file whose motion sampling is empty
    but well-formed (single rest frame)."""
    char = create_test_character(3)
    path = str(tmp_path / "rest_only.fbx")
    save_fbx(path, char)
    _, motion, _ = load_fbx_with_motion(path, fps=60.0)
    assert motion.shape == (1, char.skeleton.num_joints * 7)


def test_namespace_stripping_on_load(tmp_path):
    """FBX "ns:" joint-name prefixes are stripped by default
    (character_pybind.cpp:743 strip_namespaces)."""
    char = create_test_character(3)
    ns_names = tuple(f"rig:skel:{n}" for n in char.skeleton.joint_names)
    skel = dataclasses.replace(char.skeleton, joint_names=ns_names)
    char_ns = dataclasses.replace(char, skeleton=skel, mesh=None,
                                  skin_weights=None, inverse_bind_pose=None)
    path = str(tmp_path / "ns.fbx")
    save_fbx_model(path, char_ns)
    stripped = load_fbx(path)
    assert stripped.skeleton.joint_names == char.skeleton.joint_names
    kept = load_fbx(path, strip_namespaces=False)
    assert kept.skeleton.joint_names == ns_names


def test_standard_consumer_sections(tmp_path):
    """The written document carries what standard FBX importers require:
    Definitions object-count templates, a Documents/RootNode section, an
    AnimationStack/Layer binding the curve nodes, and per-cluster
    Transform/TransformLink bind matrices (without which importers
    reconstruct an identity bind pose and collapse the skinning)."""
    import jax.numpy as jnp

    from momentum_tpu.character import fk as _fk
    from momentum_tpu.io.fbx import _parse
    from momentum_tpu.math import skel_state as _ss

    char = create_test_character(4)
    nj = char.skeleton.num_joints
    motion = np.zeros((3, nj * 7), np.float32)
    motion[:, 7 * 1 + 3] = [0.0, 0.2, 0.4]
    path = str(tmp_path / "std.fbx")
    save_fbx_with_joint_params(path, char, motion, fps=30.0)

    with open(path, "rb") as f:
        root, _ = _parse(f.read())
    top = {n.name: n for n in root.children}
    assert {"Documents", "References", "Definitions", "Objects",
            "Connections"} <= set(top)

    # Definitions counts match the objects actually present
    counts = {}
    for ot in top["Definitions"].children:
        if ot.name == "ObjectType":
            cnt = [c for c in ot.children if c.name == "Count"][0]
            counts[ot.props[0]] = cnt.props[0]
    objs = top["Objects"].children
    by_type = {}
    for o in objs:
        by_type[o.name] = by_type.get(o.name, 0) + 1
    for name, cnt in by_type.items():
        assert counts[name] == cnt, name
    assert counts["GlobalSettings"] == 1

    # animation stack + layer exist and every curve node is OO-wired to the
    # layer
    stacks = [o for o in objs if o.name == "AnimationStack"]
    layers = [o for o in objs if o.name == "AnimationLayer"]
    assert len(stacks) == 1 and len(layers) == 1
    layer_uid = layers[0].props[0]
    conns = [c.props for c in top["Connections"].children]
    cn_uids = {o.props[0] for o in objs if o.name == "AnimationCurveNode"}
    oo_to_layer = {p[1] for p in conns
                   if p[0] == "OO" and p[2] == layer_uid}
    assert cn_uids and cn_uids <= oo_to_layer

    # cluster bind matrices: TransformLink == joint world rest transform
    rest = _fk.global_skel_states(char.skeleton,
                                  jnp.zeros(nj * 7, jnp.float32))
    bind = np.asarray(_ss.to_matrix(rest), np.float64)
    clusters = [o for o in objs
                if o.name == "Deformer" and o.props[2] == "Cluster"]
    assert clusters
    jname_of = {f"cluster_{n}": i
                for i, n in enumerate(char.skeleton.joint_names)}
    for cl in clusters:
        kids = {c.name: c for c in cl.children}
        assert "Transform" in kids and "TransformLink" in kids
        j = jname_of[cl.props[1].split("\x00")[0]]
        link = np.asarray(kids["TransformLink"].props[0]).reshape(4, 4).T
        np.testing.assert_allclose(link, bind[j], atol=1e-6)
        tr = np.asarray(kids["Transform"].props[0]).reshape(4, 4).T
        np.testing.assert_allclose(tr @ link, np.eye(4), atol=1e-6)
