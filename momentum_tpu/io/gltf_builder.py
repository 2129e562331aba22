"""Fluent multi-character GLB writer (gltf_builder.h GltfBuilder).

Reference: momentum/io/gltf/gltf_builder.h — accumulate characters, motions,
skeleton-state animations and marker sequences, then `save()`. Capabilities
mirrored here:

  * `add_character` (any number; each gets its own node subtree + skin)
  * `set_fps`
  * `add_motion` — model-parameter motion stored in the FB_momentum
    extension (loadable back as parameters)
  * `add_skeleton_states` — written as STANDARD glTF animation channels
    (per-joint translation/rotation/scale samplers, linear interpolation),
    so the output plays in any glTF viewer (gltf_builder.h:83-97 semantics:
    states are GLOBAL skeleton states; they are converted to per-node local
    TRS here)
  * `add_marker_sequence`
  * `save(path)` — single-character documents are byte-compatible with
    save_character_glb (the classic FB_momentum layout); multi-character
    documents additionally record per-character metadata under
    FB_momentum["characters"], which `load_all_characters_glb` reads back.
"""

from __future__ import annotations

import json
import struct

import numpy as np

__all__ = ["GltfBuilder", "load_all_characters_glb"]


class GltfBuilder:
    def __init__(self):
        self._entries = []  # dicts: name, character, motion, states
        self._fps = 120.0
        self._markers = None

    # ------------------------------------------------------------- fluent API
    def add_character(self, character, name: str = None) -> "GltfBuilder":
        if name is None:
            name = f"character{len(self._entries)}" if self._entries \
                else "character"
        if any(e["name"] == name for e in self._entries):
            raise ValueError(f"duplicate character name {name!r}")
        self._entries.append(dict(name=name, character=character,
                                  motion=None, states=None))
        return self

    def set_fps(self, fps: float) -> "GltfBuilder":
        self._fps = float(fps)
        return self

    def _entry(self, character_name):
        if not self._entries:
            raise ValueError("add_character must be called first")
        if character_name is None:
            return self._entries[-1]
        for e in self._entries:
            if e["name"] == character_name:
                return e
        raise ValueError(f"unknown character {character_name!r}")

    def add_motion(self, motion, character_name: str = None,
                   timestamps=None) -> "GltfBuilder":
        """(F, P) model-parameter motion for a character (gltf_builder.h:74).
        Optional per-frame int64 `timestamps` ride in the motion section
        (gltf_builder.cpp:1114)."""
        e = self._entry(character_name)
        e["motion"] = np.asarray(motion, np.float32)
        if timestamps is not None:
            e["timestamps"] = [int(t) for t in np.asarray(timestamps)]
        return self

    def add_skeleton_states(self, skel_states,
                            character_name: str = None) -> "GltfBuilder":
        """(F, nJ, 8) GLOBAL skeleton states → standard glTF animation
        channels (gltf_builder.h:85)."""
        e = self._entry(character_name)
        e["states"] = np.asarray(skel_states, np.float32)
        return self

    def add_marker_sequence(self, markers) -> "GltfBuilder":
        self._markers = markers
        return self

    # ---------------------------------------------------------------- saving
    def add_mesh(self, vertices, faces=None, name: str = None) -> "GltfBuilder":
        """Add a bare (non-skinned) mesh as its own character entry — the
        reference's GltfBuilder::addMesh (gltf_builder.h), used e.g. for
        marker meshes and props. `faces` may be omitted for point clouds."""
        import numpy as np

        import jax.numpy as jnp

        from momentum_tpu.character import Character, Mesh
        from momentum_tpu.character.parameter_transform import (
            make_identity_transform)
        from momentum_tpu.character.skeleton import make_skeleton

        from momentum_tpu.character.skinning import SkinWeights

        vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        faces = (np.zeros((0, 3), np.int32) if faces is None
                 else np.asarray(faces, np.int32).reshape(-1, 3))
        nv = vertices.shape[0]
        # bind every vertex rigidly to the single root so the mesh survives
        # the skinned-GLB export path
        sw = SkinWeights(
            index=jnp.zeros((nv, 8), jnp.int32),
            weight=jnp.asarray(
                np.pad(np.ones((nv, 1), np.float32), ((0, 0), (0, 7)))))
        char = Character(
            skeleton=make_skeleton([-1], names=(name or f"mesh{len(self._entries)}",)),
            parameter_transform=make_identity_transform(1),
            mesh=Mesh(vertices=jnp.asarray(vertices), faces=jnp.asarray(faces)),
            skin_weights=sw,
        ).with_inverse_bind_pose()
        return self.add_character(char, name=name)

    def to_bytes(self) -> bytes:
        """Serialize the built document to GLB bytes (pybind
        GltfBuilder.to_bytes) without touching the filesystem."""
        import os
        import tempfile

        fd, tmp = tempfile.mkstemp(suffix=".glb")
        os.close(fd)
        try:
            self.save(tmp)
            with open(tmp, "rb") as f:
                return f.read()
        finally:
            os.unlink(tmp)

    def save(self, path) -> None:
        if not self._entries:
            raise ValueError("nothing to save: no characters added")
        if len(self._entries) == 1 and self._entries[0]["states"] is None:
            from momentum_tpu.io.gltf import save_character_glb

            e = self._entries[0]
            save_character_glb(str(path), e["character"], motion=e["motion"],
                               fps=self._fps, markers=self._markers,
                               timestamps=e.get("timestamps"))
            return
        self._save_multi(str(path))

    def _save_multi(self, path: str) -> None:
        import jax.numpy as jnp

        from momentum_tpu.io._physical import body_to_json
        from momentum_tpu.io.gltf import _BinWriter, _pt_to_json
        from momentum_tpu.io.limits_json import (
            limits_to_json, pose_constraints_to_json,
        )
        from momentum_tpu.math import skel_state as ss

        w = _BinWriter()
        nodes, meshes, skins, scene_nodes, animations = [], [], [], [], []
        char_meta = []

        for e in self._entries:
            character = e["character"]
            skel = character.skeleton
            nj = skel.num_joints
            base = len(nodes)
            parents = np.asarray(skel.joint_parent)
            pre = np.asarray(skel.pre_rotation)
            offs = np.asarray(skel.translation_offset)

            phys_by_joint = {}
            if character.physical_properties is not None:
                pp = character.physical_properties
                pj = np.asarray(pp.joint_index)
                for b in range(pp.num_bodies):
                    phys_by_joint[int(pj[b])] = body_to_json(
                        np.asarray(pp.mass)[b],
                        np.asarray(pp.center_of_mass_offset)[b],
                        np.asarray(pp.inertia)[b],
                        np.asarray(pp.inertia_rotation)[b])

            children = [[] for _ in range(nj)]
            roots = []
            for j in range(nj):
                p = parents[j]
                (roots if p < 0 else children[p]).append(j)
            for j in range(nj):
                node = dict(name=skel.joint_names[j],
                            rotation=[float(x) for x in pre[j]],
                            translation=[float(x) for x in offs[j]])
                node["extensions"] = {"FB_momentum": {
                    "type": "skeleton_joint", "character": e["name"]}}
                if j in phys_by_joint:
                    node["extensions"]["FB_momentum"]["physicalProperties"] \
                        = phys_by_joint[j]
                if children[j]:
                    node["children"] = [base + c for c in children[j]]
                nodes.append(node)
            scene_nodes.extend(base + r for r in roots)

            if character.locators is not None:
                loc = character.locators
                lp = np.asarray(loc.parent)
                lo = np.asarray(loc.offset)
                lw = np.asarray(loc.weight)
                for i in range(loc.num_locators):
                    idx = len(nodes)
                    nodes.append(dict(
                        name=loc.names[i] if i < len(loc.names)
                        else f"locator{i}",
                        translation=[float(x) for x in lo[i]],
                        extensions={"FB_momentum": {
                            "type": "locator", "weight": float(lw[i])}}))
                    nodes[base + lp[i]].setdefault("children", []).append(idx)

            if character.collision is not None:
                col = character.collision
                cp = np.asarray(col.parent)
                ct = np.asarray(col.transform)
                cr = np.asarray(col.radius)
                cl = np.asarray(col.length)
                for i in range(col.num_capsules):
                    idx = len(nodes)
                    nodes.append(dict(
                        name=f"{e['name']}_capsule{i}",
                        translation=[float(x) for x in ct[i, :3]],
                        rotation=[float(x) for x in ct[i, 3:7]],
                        scale=[float(ct[i, 7])] * 3,
                        extensions={"FB_momentum": {
                            "type": "collision_capsule",
                            "radius": [float(cr[i, 0]), float(cr[i, 1])],
                            "length": float(cl[i])}}))
                    nodes[base + cp[i]].setdefault("children", []).append(idx)

            mesh_index = None
            if character.mesh is not None and \
                    character.skin_weights is not None:
                char_b = character.with_inverse_bind_pose()
                ibp = np.asarray(ss.to_matrix(
                    jnp.asarray(char_b.inverse_bind_pose)))
                ibm_acc = w.add(np.ascontiguousarray(
                    np.transpose(ibp, (0, 2, 1)).astype(np.float32)), "MAT4")
                verts = np.asarray(character.mesh.vertices, np.float32)
                attrs = {"POSITION": w.add(verts, "VEC3", target=34962)}
                if character.mesh.normals is not None:
                    attrs["NORMAL"] = w.add(
                        np.asarray(character.mesh.normals, np.float32),
                        "VEC3", target=34962)
                si = np.asarray(character.skin_weights.index, np.uint16)
                sw = np.asarray(character.skin_weights.weight, np.float32)
                for g in range(2):
                    attrs[f"JOINTS_{g}"] = w.add(np.ascontiguousarray(
                        si[:, 4 * g: 4 * g + 4]), "VEC4", target=34962)
                    attrs[f"WEIGHTS_{g}"] = w.add(np.ascontiguousarray(
                        sw[:, 4 * g: 4 * g + 4]), "VEC4", target=34962)
                idx_acc = w.add(np.asarray(character.mesh.faces,
                                           np.uint32).reshape(-1),
                                "SCALAR", target=34963)
                mesh_index = len(meshes)
                meshes.append(dict(
                    name=f"{e['name']}_mesh",
                    primitives=[dict(attributes=attrs, indices=idx_acc)]))
                skins.append(dict(
                    inverseBindMatrices=ibm_acc,
                    joints=[base + j for j in range(nj)],
                    skeleton=base + int(roots[0])))
                mesh_node = len(nodes)
                nodes.append(dict(name=f"{e['name']}_meshnode",
                                  mesh=mesh_index, skin=len(skins) - 1))
                scene_nodes.append(mesh_node)

            meta = {"name": e["name"],
                    "jointNodes": [base + j for j in range(nj)],
                    "transform": _pt_to_json(character)}
            if character.parameter_transform.parameter_sets:
                meta["parameterSet"] = {
                    k: [character.parameter_transform.names[i] for i in v]
                    for k, v in
                    character.parameter_transform.parameter_sets.items()}
            lj = limits_to_json(character)
            if lj:
                meta["parameterLimits"] = lj
            pj_json = pose_constraints_to_json(character)
            if pj_json:
                meta["poseConstraints"] = pj_json
            if e["motion"] is not None:
                meta["motion"] = {
                    "parameterNames":
                        list(character.parameter_transform.names),
                    "poses": w.add(e["motion"].reshape(-1), "SCALAR"),
                    "nframes": int(e["motion"].shape[0]),
                    "fps": self._fps,
                }
            if mesh_index is not None:
                meta["meshIndex"] = mesh_index
            char_meta.append(meta)

            # skeleton states → standard glTF animation channels
            if e["states"] is not None:
                states = jnp.asarray(e["states"])  # (F, nJ, 8) global
                parent_idx = jnp.maximum(jnp.asarray(parents), 0)
                parent_states = jnp.where(
                    (np.asarray(parents) >= 0)[None, :, None],
                    jnp.take(states, parent_idx, axis=1),
                    ss.identity((states.shape[0], nj)))
                local = np.asarray(ss.multiply(ss.inverse(parent_states),
                                               states))
                f = local.shape[0]
                times = (np.arange(f) / self._fps).astype(np.float32)
                t_acc = w.add(times, "SCALAR")
                w.accessors[t_acc]["min"] = [float(times.min())]
                w.accessors[t_acc]["max"] = [float(times.max())]
                samplers, channels = [], []
                for j in range(nj):
                    t = np.ascontiguousarray(local[:, j, 0:3])
                    q = local[:, j, 3:7]
                    q = np.ascontiguousarray(
                        q / np.maximum(np.linalg.norm(
                            q, axis=-1, keepdims=True), 1e-12))
                    s = np.repeat(local[:, j, 7:8], 3, axis=1)
                    for path_name, data in (("translation", t),
                                            ("rotation", q), ("scale", s)):
                        out_acc = w.add(
                            data.astype(np.float32),
                            "VEC4" if path_name == "rotation" else "VEC3")
                        samplers.append(dict(input=t_acc, output=out_acc,
                                             interpolation="LINEAR"))
                        channels.append(dict(
                            sampler=len(samplers) - 1,
                            target=dict(node=base + j, path=path_name)))
                animations.append(dict(name=f"{e['name']}_motion",
                                       samplers=samplers, channels=channels))

        ext = {"characters": char_meta}
        # back-compat mirror of the first character at the document level
        first = char_meta[0]
        ext["transform"] = first["transform"]
        for k in ("parameterSet", "parameterLimits", "poseConstraints",
                  "motion"):
            if k in first:
                ext[k] = first[k]
        if self._markers is not None:
            m_pos = np.asarray(self._markers.positions, np.float32)
            m_occ = np.asarray(self._markers.occluded, np.uint8)
            ext["markers"] = {
                "names": list(self._markers.names),
                "positions": w.add(m_pos.reshape(-1), "SCALAR"),
                "occluded": w.add(m_occ.reshape(-1), "SCALAR"),
                "nframes": int(m_pos.shape[0]),
            }

        doc = dict(
            asset=dict(version="2.0", generator="momentum_tpu"),
            scene=0,
            scenes=[dict(nodes=scene_nodes)],
            nodes=nodes,
            accessors=w.accessors,
            bufferViews=w.views,
            buffers=[dict(byteLength=w.offset)],
            extensionsUsed=["FB_momentum"],
            extensions={"FB_momentum": ext},
        )
        if meshes:
            doc["meshes"] = meshes
            doc["skins"] = skins
        if animations:
            doc["animations"] = animations

        jbytes = json.dumps(doc).encode()
        jbytes += b" " * ((-len(jbytes)) % 4)
        blob = w.blob()
        total = 12 + 8 + len(jbytes) + 8 + len(blob)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(jbytes), 0x4E4F534A) + jbytes)
            f.write(struct.pack("<II", len(blob), 0x004E4942) + blob)


def load_all_characters_glb(path):
    """Load every character from a (possibly multi-character) GLB written by
    GltfBuilder → list of (name, Character, motion-or-None). Falls back to
    the single-character loader for classic documents."""
    import jax.numpy as jnp

    from momentum_tpu.character import (
        Character, Locators, Mesh, SkinWeights, make_skeleton,
    )
    from momentum_tpu.character.parameter_transform import (
        make_identity_transform,
    )
    from momentum_tpu.io._physical import (
        body_from_json, rows_to_physical_properties,
    )
    from momentum_tpu.io.gltf import (
        _parse_glb, _pt_from_json, _read_accessor, load_character_glb,
    )

    with open(path, "rb") as f:
        data = f.read()
    doc, blob = _parse_glb(data)

    ext = doc.get("extensions", {}).get("FB_momentum", {})
    metas = ext.get("characters")
    if not metas:
        character, motion, _ = load_character_glb(path)
        return [("character", character, motion)]

    nodes = doc.get("nodes", [])
    parent_of = {}
    for i, n in enumerate(nodes):
        for c in n.get("children", []):
            parent_of[c] = i

    def node_ext(n):
        return n.get("extensions", {}).get("FB_momentum", {})

    out = []
    for meta in metas:
        joint_ids = meta["jointNodes"]
        node_to_joint = {n: j for j, n in enumerate(joint_ids)}
        parents, pre, offs, names = [], [], [], []
        phys_rows = []
        for j, nid in enumerate(joint_ids):
            n = nodes[nid]
            p = parent_of.get(nid)
            parents.append(node_to_joint.get(p, -1) if p is not None else -1)
            pre.append(n.get("rotation", [0, 0, 0, 1]))
            offs.append(n.get("translation", [0, 0, 0]))
            names.append(n.get("name", f"joint{j}"))
            e = node_ext(n)
            if "physicalProperties" in e:
                phys_rows.append((j,) + body_from_json(
                    e["physicalProperties"]) + (names[j],))
        skeleton = make_skeleton(parents, np.asarray(pre), np.asarray(offs),
                                 names)
        pt = _pt_from_json(meta["transform"], skeleton) \
            if "transform" in meta else \
            make_identity_transform(skeleton.num_joints)
        if "parameterSet" in meta:
            name_idx = {n: i for i, n in enumerate(pt.names)}
            import dataclasses as _dc

            pt = _dc.replace(pt, parameter_sets={
                k: tuple(name_idx[n] for n in v if n in name_idx)
                for k, v in meta["parameterSet"].items()})

        loc_rows = []
        cap_rows = []
        joint_set = set(joint_ids)
        for i, n in enumerate(nodes):
            e = node_ext(n)
            p = parent_of.get(i)
            if e.get("type") in ("locator", "marker") and p in joint_set:
                loc_rows.append((node_to_joint[p],
                                 n.get("translation", [0, 0, 0]),
                                 e.get("weight", 1.0),
                                 n.get("name", f"l{i}")))
            elif e.get("type") == "collision_capsule" and p in joint_set:
                tf = (n.get("translation", [0, 0, 0])
                      + n.get("rotation", [0, 0, 0, 1])
                      + [n.get("scale", [1, 1, 1])[0]])
                cap_rows.append((node_to_joint[p], tf,
                                 e.get("radius", [1.0, 1.0]),
                                 e.get("length", 1.0)))
        locators = None
        if loc_rows:
            locators = Locators(
                parent=jnp.asarray([r[0] for r in loc_rows], jnp.int32),
                offset=jnp.asarray([r[1] for r in loc_rows], jnp.float32),
                weight=jnp.asarray([r[2] for r in loc_rows], jnp.float32),
                names=tuple(r[3] for r in loc_rows))
        collision = None
        if cap_rows:
            from momentum_tpu.character import CollisionGeometry

            collision = CollisionGeometry(
                parent=jnp.asarray([r[0] for r in cap_rows], jnp.int32),
                transform=jnp.asarray([r[1] for r in cap_rows], jnp.float32),
                radius=jnp.asarray([r[2] for r in cap_rows], jnp.float32),
                length=jnp.asarray([r[3] for r in cap_rows], jnp.float32))

        mesh = None
        skin_weights = None
        if "meshIndex" in meta and doc.get("meshes"):
            prim = doc["meshes"][meta["meshIndex"]]["primitives"][0]
            attrs = prim["attributes"]
            verts = _read_accessor(doc, blob,
                                   attrs["POSITION"]).astype(np.float32)
            faces = _read_accessor(doc, blob,
                                   prim["indices"]).astype(np.int32)
            mesh = Mesh(vertices=jnp.asarray(verts),
                        faces=jnp.asarray(faces.reshape(-1, 3)))
            if "JOINTS_0" in attrs:
                v = verts.shape[0]
                si = np.zeros((v, 8), np.int32)
                sw = np.zeros((v, 8), np.float32)
                for g in range(2):
                    if f"JOINTS_{g}" in attrs:
                        si[:, 4 * g: 4 * g + 4] = _read_accessor(
                            doc, blob, attrs[f"JOINTS_{g}"])
                        sw[:, 4 * g: 4 * g + 4] = _read_accessor(
                            doc, blob, attrs[f"WEIGHTS_{g}"])
                skin_weights = SkinWeights(index=jnp.asarray(si),
                                           weight=jnp.asarray(sw))

        import dataclasses as _dc

        from momentum_tpu.io.limits_json import (
            limits_from_json, pose_constraints_from_json,
        )

        stub = Character(skeleton=skeleton, parameter_transform=pt)
        if "poseConstraints" in meta:
            pt = _dc.replace(pt, pose_constraints=pose_constraints_from_json(
                stub, meta["poseConstraints"]))
        limits_kw = {}
        if "parameterLimits" in meta:
            limits_kw["limits"] = limits_from_json(stub,
                                                   meta["parameterLimits"])
        character = Character(
            skeleton=skeleton, parameter_transform=pt, mesh=mesh,
            skin_weights=skin_weights, locators=locators, collision=collision,
            physical_properties=rows_to_physical_properties(phys_rows),
            name=meta["name"], **limits_kw)
        if mesh is not None and skin_weights is not None:
            character = character.with_inverse_bind_pose()

        motion = None
        if "motion" in meta:
            m = meta["motion"]
            motion = _read_accessor(doc, blob, m["poses"]).astype(
                np.float32).reshape(m["nframes"], -1)
        out.append((meta["name"], character, motion))
    return out
