"""Regression tests for glTF loader bugs found by code review:

1. load_character_glb_with_skel_states must map animation channels through
   the topologically-sorted joint order (the skeleton is re-sorted on load,
   io_gltf_test.cpp sort_joints.glb precedent), not raw file order.
2. CUBICSPLINE samplers store [in-tangent, value, out-tangent] triplets per
   keyframe; the loader must extract the value element.
3. Multi-character GLB round trips must preserve parameter limits, pose
   constraints, named parameter sets, and collision capsules.
"""

import dataclasses
import json
import struct

import numpy as np

import jax.numpy as jnp

from momentum_tpu.io.gltf import (
    load_character_glb, load_character_glb_with_skel_states,
)


def _add_accessor(doc, blob, arr, type_):
    arr = np.ascontiguousarray(arr, np.float32)
    doc.setdefault("bufferViews", []).append(
        {"buffer": 0, "byteOffset": len(blob), "byteLength": arr.nbytes})
    doc.setdefault("accessors", []).append(
        {"bufferView": len(doc["bufferViews"]) - 1, "componentType": 5126,
         "count": int(arr.shape[0]), "type": type_})
    return blob + arr.tobytes(), len(doc["accessors"]) - 1


def _glb_bytes(doc, blob):
    doc["buffers"] = [{"byteLength": len(blob)}]
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    blob += b"\x00" * (-len(blob) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    return (struct.pack("<III", 0x46546C67, 2, total)
            + struct.pack("<II", len(js), 0x4E4F534A) + js
            + struct.pack("<II", len(blob), 0x004E4942) + blob)


def _tag(name, **extra):
    node = {"name": name,
            "extensions": {"FB_momentum": {"type": "skeleton_joint"}}}
    node.update(extra)
    return node


def test_skel_states_child_before_parent_node_order():
    """Child listed before its parent in the node array: the animation
    channel targeting the child must move the CHILD, not whichever joint
    happens to occupy the raw file slot."""
    doc = {"asset": {"version": "2.0"},
           "nodes": [_tag("child", translation=[1.0, 0.0, 0.0]),
                     _tag("root", children=[0])],
           "scenes": [{"nodes": [1]}]}
    blob = b""
    blob, t_acc = _add_accessor(doc, blob, np.asarray([[0.0]]), "SCALAR")
    blob, v_acc = _add_accessor(doc, blob, np.asarray([[5.0, 0.0, 0.0]]),
                                "VEC3")
    doc["animations"] = [{
        "samplers": [{"input": t_acc, "output": v_acc,
                      "interpolation": "LINEAR"}],
        "channels": [{"sampler": 0,
                      "target": {"node": 0, "path": "translation"}}]}]
    data = _glb_bytes(doc, blob)

    character, _, _ = load_character_glb(data)
    assert character.skeleton.joint_names == ("root", "child")

    _, states, _ = load_character_glb_with_skel_states(data, fps=30.0)
    pos = np.asarray(states)[0, :, :3]
    np.testing.assert_allclose(pos[0], [0.0, 0.0, 0.0], atol=1e-6)  # root
    np.testing.assert_allclose(pos[1], [5.0, 0.0, 0.0], atol=1e-5)  # child


def test_cubicspline_sampler_extracts_values():
    """CUBICSPLINE output packs [in-tangent, value, out-tangent] per key —
    the value element drives the motion; tangents must not leak through."""
    doc = {"asset": {"version": "2.0"},
           "nodes": [_tag("root")],
           "scenes": [{"nodes": [0]}]}
    blob = b""
    blob, t_acc = _add_accessor(doc, blob, np.asarray([[0.0], [1.0]]),
                                "SCALAR")
    out = np.asarray([[9, 9, 9], [1, 2, 3], [9, 9, 9],   # key 0
                      [9, 9, 9], [4, 5, 6], [9, 9, 9]],  # key 1
                     np.float32)
    blob, v_acc = _add_accessor(doc, blob, out, "VEC3")
    doc["animations"] = [{
        "samplers": [{"input": t_acc, "output": v_acc,
                      "interpolation": "CUBICSPLINE"}],
        "channels": [{"sampler": 0,
                      "target": {"node": 0, "path": "translation"}}]}]
    data = _glb_bytes(doc, blob)

    _, states, _ = load_character_glb_with_skel_states(data, fps=1.0)
    pos = np.asarray(states)[:, 0, :3]
    assert pos.shape[0] == 2
    np.testing.assert_allclose(pos[0], [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(pos[1], [4.0, 5.0, 6.0], atol=1e-5)


def test_multi_character_round_trip_keeps_constraints(tmp_path):
    """Limits, pose constraints, parameter sets, and collision capsules
    written by GltfBuilder must survive load_all_characters_glb."""
    from momentum_tpu.character import CollisionGeometry
    from momentum_tpu.character.limits import make_limits
    from momentum_tpu.io.gltf_builder import (
        GltfBuilder, load_all_characters_glb,
    )
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(4)
    pt = dataclasses.replace(
        char.parameter_transform,
        parameter_sets={"upper": (7, 8)},
        pose_constraints={"bind": ((0, 0.25), (7, -0.5))})
    coll = CollisionGeometry(
        parent=jnp.asarray([1], jnp.int32),
        transform=jnp.asarray([[0.1, 0.2, 0.3, 0, 0, 0, 1, 1.0]],
                              jnp.float32),
        radius=jnp.asarray([[0.2, 0.3]], jnp.float32),
        length=jnp.asarray([1.5], jnp.float32))
    char = dataclasses.replace(
        char, parameter_transform=pt, collision=coll,
        limits=make_limits(minmax=[(7, -0.5, 0.5, 2.0)]))

    path = str(tmp_path / "rich.glb")
    GltfBuilder().add_character(char, "a") \
        .add_character(create_test_character(3), "b").save(path)

    out = load_all_characters_glb(path)
    assert [n for n, _, _ in out] == ["a", "b"]
    ca = out[0][1]

    lim = ca.limits
    assert lim is not None and lim.minmax_index.shape[0] == 1
    assert int(lim.minmax_index[0]) == 7
    np.testing.assert_allclose(np.asarray(lim.minmax_bounds[0]), [-0.5, 0.5],
                               atol=1e-6)
    np.testing.assert_allclose(float(lim.minmax_weight[0]), 2.0, atol=1e-6)

    assert ca.parameter_transform.parameter_sets == {"upper": (7, 8)}
    assert ca.parameter_transform.pose_constraints == {
        "bind": ((0, 0.25), (7, -0.5))}

    assert ca.collision is not None
    assert int(ca.collision.parent[0]) == 1
    np.testing.assert_allclose(np.asarray(ca.collision.transform[0]),
                               [0.1, 0.2, 0.3, 0, 0, 0, 1, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ca.collision.radius[0]), [0.2, 0.3],
                               atol=1e-6)
    np.testing.assert_allclose(float(ca.collision.length[0]), 1.5, atol=1e-6)


class TestRemainingReferenceAssets:
    """The last reference GLB fixtures not yet pinned: multi-primitive
    meshes, unskinned meshes, and skeletons whose root isn't a scene root."""

    REF = "/root/reference/momentum/test/resources"

    def test_mesh_not_combined(self):
        # several mesh primitives merge into one vertex buffer
        c, m, fps = load_character_glb(
            f"{self.REF}/mesh-not-combined.glb")
        assert c.skeleton.num_joints == 3
        assert c.mesh is not None and c.mesh.num_vertices == 398
        assert c.skin_weights is not None
        assert c.skin_weights.index.shape == (398, 8)

    def test_mesh_without_skinning(self):
        c, m, fps = load_character_glb(
            f"{self.REF}/mesh-without-skinning.glb")
        assert c.mesh is not None and c.mesh.num_vertices == 24
        assert c.skin_weights is None

    def test_skeleton_non_joint_root(self):
        c, m, fps = load_character_glb(
            f"{self.REF}/skeleton_non_joint_root.glb")
        assert c.skeleton.num_joints == 2
        assert c.mesh is not None and c.mesh.num_vertices == 24
        c.skeleton.validate()
