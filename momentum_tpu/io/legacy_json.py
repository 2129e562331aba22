"""Legacy full-character JSON IO.

Reference: momentum/io/legacy_json/legacy_json_io.cpp — skeleton under
"Skeleton"/"BodySkeleton" with a "Bones" array ({Name, Parent, PreRotation
(x,y,z,w), TranslationOffset}), locators as {name, parent, offset, weight}.
Quaternion arrays follow the reference's (x, y, z, w) JSON order.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["load_legacy_json", "save_legacy_json"]

_INVALID = 0xFFFFFFFFFFFFFFFF


def load_legacy_json(source):
    import jax.numpy as jnp

    from momentum_tpu.character import Character, Locators, make_skeleton
    from momentum_tpu.character.parameter_transform import make_identity_transform

    if isinstance(source, (str, bytes)) and str(source).lstrip().startswith("{"):
        doc = json.loads(source)
    else:
        with open(source) as f:
            doc = json.load(f)

    skel_json = None
    for key in ("Skeleton", "BodySkeleton", "skeleton"):
        if key in doc:
            skel_json = doc[key]
            break
    if skel_json is None:
        raise ValueError("legacy JSON missing Skeleton")
    bones = skel_json["Bones"]
    names, parents, pre, offs = [], [], [], []
    for b in bones:
        names.append(b.get("Name", f"bone{len(names)}"))
        p = b.get("Parent", _INVALID)
        parents.append(-1 if p in (_INVALID, None, -1) else int(p))
        pre.append(b.get("PreRotation", [0.0, 0.0, 0.0, 1.0]))
        offs.append(b.get("TranslationOffset", [0.0, 0.0, 0.0]))
    skeleton = make_skeleton(parents, np.asarray(pre), np.asarray(offs), names)

    locators = None
    loc_json = doc.get("Locators") or doc.get("locators")
    if loc_json:
        lp, lo, lw, ln = [], [], [], []
        name_idx = {n: i for i, n in enumerate(names)}
        for l in loc_json:
            parent = l.get("parent", l.get("Parent", 0))
            if isinstance(parent, str):
                parent = name_idx.get(parent, 0)
            lp.append(int(parent))
            lo.append(l.get("offset", l.get("Offset", [0.0, 0.0, 0.0])))
            lw.append(float(l.get("weight", l.get("Weight", 1.0))))
            ln.append(l.get("name", l.get("Name", f"l{len(ln)}")))
        locators = Locators(
            parent=jnp.asarray(lp, jnp.int32), offset=jnp.asarray(lo, jnp.float32),
            weight=jnp.asarray(lw, jnp.float32), names=tuple(ln))

    return Character(
        skeleton=skeleton,
        parameter_transform=make_identity_transform(skeleton.num_joints),
        locators=locators,
    )


def save_legacy_json(path, character) -> None:
    skel = character.skeleton
    parents = np.asarray(skel.joint_parent)
    pre = np.asarray(skel.pre_rotation)
    offs = np.asarray(skel.translation_offset)
    bones = []
    for j in range(skel.num_joints):
        bones.append({
            "Name": skel.joint_names[j],
            "Parent": _INVALID if parents[j] < 0 else int(parents[j]),
            "PreRotation": [float(x) for x in pre[j]],
            "TranslationOffset": [float(x) for x in offs[j]],
        })
    doc = {"Skeleton": {"Bones": bones}}
    if character.locators is not None:
        loc = character.locators
        doc["Locators"] = [
            {"name": loc.names[i] if i < len(loc.names) else f"l{i}",
             "parent": int(np.asarray(loc.parent)[i]),
             "offset": [float(x) for x in np.asarray(loc.offset)[i]],
             "weight": float(np.asarray(loc.weight)[i])}
            for i in range(loc.num_locators)
        ]
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
