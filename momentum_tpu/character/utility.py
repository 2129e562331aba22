"""Character/skeleton utilities (host-side, numpy-backed).

Reference: momentum/character/character_utility.{h,cpp},
character.h:33-283 member ops, skeleton_utility.h. These are model-surgery
operations done once at load time — they run on the host and produce new
frozen pytrees; nothing here needs to be jitted.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.character import (
    Character, CollisionGeometry, Locators, Mesh, PhysicalProperties)
from momentum_tpu.character.parameter_transform import ParameterTransform
from momentum_tpu.character.skeleton import INVALID_INDEX, PARAMS_PER_JOINT, Skeleton, make_skeleton
from momentum_tpu.character.skinning import SkinWeights

__all__ = [
    "simplify",
    "simplify_skeleton",
    "simplify_parameter_transform",
    "scale_character",
    "reduce_mesh_by_vertices",
    "reduce_mesh_by_faces",
    "transform_character",
    "remove_joints",
    "parameters_to_active_joints",
    "active_joints_to_parameters",
    "subset_parameter_transform",
    "map_parameter_transform_joints",
    "split_parameters",
    "bake_blend_shape",
    "add_face_expression_parameters",
    "add_skinned_locator_parameters",
    "skinned_locator_rest_offsets",
    "resample_motion",
    "extrapolate_model_parameters",
    "add_rigid_transform_node",
    "replace_skeleton_hierarchy",
    "vertices_to_faces",
    "faces_to_vertices",
]


def scale_physical_properties(physical_properties, length_scale: float,
                              mass_scale: str = "preserve_mass"):
    """Scale per-joint mass bodies (character_utility.cpp:105-130):
    COM offset × s; with "preserve_mass" mass × 1, inertia × s²; with
    "preserve_density" mass × s³, inertia × s⁵ (character_utility.h:41-42)."""
    if physical_properties is None:
        return None
    if mass_scale == "preserve_mass":
        m = 1.0
    elif mass_scale == "preserve_density":
        m = length_scale ** 3
    else:
        raise ValueError(f"unknown mass-scale policy: {mass_scale!r}")
    return dataclasses.replace(
        physical_properties,
        center_of_mass_offset=physical_properties.center_of_mass_offset * length_scale,
        mass=physical_properties.mass * m,
        inertia=physical_properties.inertia * (m * length_scale * length_scale),
    )


def scale_character(character: Character, scale: float,
                    mass_scale: str = "preserve_mass") -> Character:
    """Uniformly scale a character (character_utility.cpp scaleCharacter):
    translation offsets, locator offsets, mesh, capsule geometry scale,
    physical mass bodies per the `mass_scale` policy."""
    skel = character.skeleton
    new_skel = dataclasses.replace(
        skel, translation_offset=skel.translation_offset * scale
    )
    out = dataclasses.replace(character, skeleton=new_skel)
    if character.mesh is not None:
        out = dataclasses.replace(
            out, mesh=dataclasses.replace(character.mesh,
                                          vertices=character.mesh.vertices * scale))
    if character.locators is not None:
        loc = character.locators
        out = dataclasses.replace(
            out, locators=dataclasses.replace(
                loc, offset=loc.offset * scale,
                limit_origin=None if loc.limit_origin is None
                else loc.limit_origin * scale,
                skin_offset=None if loc.skin_offset is None
                else loc.skin_offset * scale))
    if character.collision is not None:
        col = character.collision
        tf = col.transform.at[..., 0:3].multiply(scale)
        out = dataclasses.replace(
            out, collision=dataclasses.replace(
                col, transform=tf, radius=col.radius * scale, length=col.length * scale))
    if character.physical_properties is not None:
        out = dataclasses.replace(
            out, physical_properties=scale_physical_properties(
                character.physical_properties, scale, mass_scale))
    lim = character.limits
    if lim is not None and lim.ellipsoid_parent.shape[0] > 0:
        # reference scales ONLY ellipsoid limits (world-space lengths):
        # character_utility.cpp:69-80 — translation of both the ellipsoid
        # frame and its inverse (A⁻¹'s translation is −R⁻¹t, linear in t),
        # plus the parent-frame point offset. MinMax/linear records are on
        # model parameters and are deliberately NOT scaled (reference
        # semantics; unit-converting a config must rescale those itself).
        e_mat = lim.ellipsoid_mat.at[:, :3, 3].multiply(scale)
        e_inv = lim.ellipsoid_inv.at[:, :3, 3].multiply(scale)
        out = dataclasses.replace(
            out, limits=dataclasses.replace(
                lim, ellipsoid_mat=e_mat, ellipsoid_inv=e_inv,
                ellipsoid_point_offset=lim.ellipsoid_point_offset * scale))
    out = dataclasses.replace(out, inverse_bind_pose=None)
    return out.with_inverse_bind_pose()


def transform_character(character: Character, xform: jnp.ndarray) -> Character:
    """Rigidly transform the rest configuration by an 8-param skel_state
    (character_utility.cpp transformCharacter). Only root joints move."""
    from momentum_tpu.math import quaternion as quat, skel_state as ss

    skel = character.skeleton
    parents = np.asarray(skel.joint_parent)
    offs = np.asarray(skel.translation_offset).copy()
    pre = np.asarray(skel.pre_rotation).copy()
    t, q, s = (np.asarray(x) for x in ss.split(xform))
    for j in range(len(parents)):
        if parents[j] == INVALID_INDEX:
            offs[j] = np.asarray(ss.transform_points(xform, jnp.asarray(offs[j])))
            pre[j] = np.asarray(quat.multiply(q, jnp.asarray(pre[j])))
    new_skel = dataclasses.replace(
        skel,
        translation_offset=jnp.asarray(offs),
        pre_rotation=jnp.asarray(pre),
    )
    out = dataclasses.replace(character, skeleton=new_skel, inverse_bind_pose=None)
    return out.with_inverse_bind_pose()


def parameters_to_active_joints(pt: ParameterTransform, enabled: np.ndarray) -> np.ndarray:
    """Bool (nJ,): joints driven by any enabled model parameter
    (character.h parametersToActiveJoints)."""
    pattern = np.abs(np.asarray(pt.transform)) > 0
    active_jp = pattern[:, np.asarray(enabled, bool)].any(axis=1)
    return active_jp.reshape(-1, PARAMS_PER_JOINT).any(axis=1)


def active_joints_to_parameters(pt: ParameterTransform, active_joints: np.ndarray) -> np.ndarray:
    """Bool (P,): model parameters that touch any active joint
    (character.h activeJointsToParameters)."""
    pattern = np.abs(np.asarray(pt.transform)) > 0
    jp_active = np.repeat(np.asarray(active_joints, bool), PARAMS_PER_JOINT)
    return pattern[jp_active, :].any(axis=0)


def subset_parameter_transform(pt: ParameterTransform, keep: np.ndarray) -> ParameterTransform:
    """New transform with only the `keep` model parameters
    (parameter_transform.h subsetParameterTransform)."""
    keep = np.asarray(keep, bool)
    idx = np.nonzero(keep)[0]
    return ParameterTransform(
        transform=jnp.asarray(np.asarray(pt.transform)[:, idx]),
        offsets=pt.offsets,
        names=tuple(pt.names[i] for i in idx),
        parameter_sets={
            k: tuple(int(np.searchsorted(idx, i)) for i in v if i in set(idx.tolist()))
            for k, v in pt.parameter_sets.items()
        },
    )


def remove_joints(character: Character, joints_to_remove) -> Character:
    """Strip joints (and their subtrees' parameters/locators/skinning)
    (character_utility.cpp removeJoints). Children of removed joints must also
    be listed (reference requires consistency; we enforce it)."""
    skel = character.skeleton
    parents = np.asarray(skel.joint_parent)
    n = len(parents)
    remove = np.zeros(n, bool)
    idx = [skel.joint_names.index(j) if isinstance(j, str) else int(j)
           for j in joints_to_remove]
    remove[idx] = True
    for j in range(n):
        if parents[j] != INVALID_INDEX and remove[parents[j]]:
            remove[j] = True
    keep_idx = np.nonzero(~remove)[0]
    old_to_new = np.full(n, INVALID_INDEX, np.int64)
    old_to_new[keep_idx] = np.arange(len(keep_idx))

    new_parents = []
    for j in keep_idx:
        p = parents[j]
        new_parents.append(int(old_to_new[p]) if p != INVALID_INDEX else INVALID_INDEX)
    new_skel = make_skeleton(
        new_parents,
        pre_rotations=np.asarray(skel.pre_rotation)[keep_idx],
        translation_offsets=np.asarray(skel.translation_offset)[keep_idx],
        names=[skel.joint_names[i] for i in keep_idx],
    )

    # parameter transform: drop rows of removed joints, drop params that no
    # longer touch anything
    tf = np.asarray(character.parameter_transform.transform)
    row_keep = np.repeat(~remove, PARAMS_PER_JOINT)
    tf2 = tf[row_keep]
    offs2 = np.asarray(character.parameter_transform.offsets)[row_keep]
    col_keep = (np.abs(tf2) > 0).any(axis=0)
    pt2 = ParameterTransform(
        transform=jnp.asarray(tf2[:, col_keep]),
        offsets=jnp.asarray(offs2),
        names=tuple(np.asarray(character.parameter_transform.names)[col_keep].tolist()),
    )

    out = dataclasses.replace(
        character, skeleton=new_skel, parameter_transform=pt2, inverse_bind_pose=None,
        mesh=None, skin_weights=None, blend_shape=None, collision=None,
    )
    if character.physical_properties is not None:
        # drop bodies on removed joints, remap the rest
        # (character_utility.cpp:143-170 mapPhysicalProperties)
        pp = character.physical_properties
        pj = np.asarray(pp.joint_index)
        pkeep = ~remove[pj]
        new_pp = None
        if pkeep.any():
            new_pp = dataclasses.replace(
                pp,
                joint_index=jnp.asarray(old_to_new[pj[pkeep]], jnp.int32),
                mass=jnp.asarray(np.asarray(pp.mass)[pkeep]),
                center_of_mass_offset=jnp.asarray(
                    np.asarray(pp.center_of_mass_offset)[pkeep]),
                inertia=jnp.asarray(np.asarray(pp.inertia)[pkeep]),
                inertia_rotation=jnp.asarray(
                    np.asarray(pp.inertia_rotation)[pkeep]),
                joint_names=tuple(
                    n for n, k in zip(pp.joint_names, pkeep) if k
                ) if pp.joint_names else (),
            )
        out = dataclasses.replace(out, physical_properties=new_pp)
    if character.locators is not None:
        loc = character.locators
        lp = np.asarray(loc.parent)
        lkeep = ~remove[lp]
        def _sub(arr):
            return None if arr is None else jnp.asarray(np.asarray(arr)[lkeep])

        out = dataclasses.replace(out, locators=Locators(
            parent=jnp.asarray(old_to_new[lp[lkeep]], jnp.int32),
            offset=jnp.asarray(np.asarray(loc.offset)[lkeep]),
            weight=jnp.asarray(np.asarray(loc.weight)[lkeep]),
            names=tuple(np.asarray(loc.names)[lkeep].tolist()),
            locked=_sub(loc.locked), limit_weight=_sub(loc.limit_weight),
            limit_origin=_sub(loc.limit_origin),
            attached_to_skin=_sub(loc.attached_to_skin),
            skin_offset=_sub(loc.skin_offset),
        ))
    if character.mesh is not None and character.skin_weights is not None:
        # keep mesh; re-point skinning at nearest kept ancestor
        si = np.asarray(character.skin_weights.index)
        sw = np.asarray(character.skin_weights.weight).copy()
        remap = np.empty(n, np.int64)
        for j in range(n):
            a = j
            while a != INVALID_INDEX and remove[a]:
                a = parents[a]
            remap[j] = old_to_new[a] if a != INVALID_INDEX else 0
        out = dataclasses.replace(
            out, mesh=character.mesh,
            skin_weights=SkinWeights(index=jnp.asarray(remap[si], jnp.int32),
                                     weight=jnp.asarray(sw)))
    return out.with_inverse_bind_pose()


def split_parameters(pt: ParameterTransform, params: jnp.ndarray, mask) -> jnp.ndarray:
    """Zero out parameters not in `mask` (character.h splitParameters)."""
    m = jnp.asarray(np.asarray(mask, np.float32))
    return params * m


def bake_blend_shape(character: Character, coefficients: jnp.ndarray) -> Character:
    """Bake blendshape coefficients into a static mesh (character.h bake)."""
    if character.blend_shape is None or character.mesh is None:
        return character
    baked = character.blend_shape.apply(coefficients)
    return dataclasses.replace(
        character,
        mesh=dataclasses.replace(character.mesh, vertices=baked),
        blend_shape=None,
        blend_shape_param_index=None,
    )


def resample_motion(poses: np.ndarray, src_fps: float, dst_fps: float) -> np.ndarray:
    """Linear resampling of a (F, P) pose track (skeleton_utility.h
    MotionParameters resampling)."""
    poses = np.asarray(poses)
    f = poses.shape[0]
    if f < 2 or src_fps == dst_fps:
        return poses.copy()
    duration = (f - 1) / src_fps
    n_out = int(np.floor(duration * dst_fps)) + 1
    t_out = np.arange(n_out) / dst_fps * src_fps
    i0 = np.clip(np.floor(t_out).astype(np.int64), 0, f - 2)
    frac = (t_out - i0)[:, None]
    return poses[i0] * (1 - frac) + poses[i0 + 1] * frac


def extrapolate_model_parameters(previous, current, active=None,
                                 factor: float = 0.8,
                                 max_delta: float = 0.4):
    """Predict the next pose from two consecutive ones
    (skeleton_utility.h:22-38 extrapolateModelParameters): clamp the
    per-parameter step to [-max_delta, max_delta], scale by `factor`, and add
    to `current`. With an `active` mask, inactive parameters pass through
    `current` unchanged. Returns `current` when sizes mismatch (reference
    size-mismatch fallback). Batched over leading dims."""
    import jax.numpy as jnp

    previous = jnp.asarray(previous)
    current = jnp.asarray(current)
    if previous.shape != current.shape:
        return current
    delta = jnp.clip(current - previous, -max_delta, max_delta)
    out = current + factor * delta
    if active is not None:
        out = jnp.where(jnp.asarray(active, bool), out, current)
    return out


def add_blend_shape_parameters(character: Character, blend_shape, num_shapes=None) -> Character:
    """Extend the parameter transform with blendshape coefficient parameters
    (ParameterTransform::addBlendShapeParameters, parameter_transform.h:189-227):
    new columns are zero (they drive no joints); their indices are recorded in
    character.blend_shape_param_index so the mesh pipeline picks them up."""
    import jax.numpy as jnp
    import numpy as np

    pt = character.parameter_transform
    k = num_shapes if num_shapes is not None else blend_shape.num_shapes
    old_p = pt.num_model_parameters
    tf = np.asarray(pt.transform)
    tf2 = np.concatenate([tf, np.zeros((tf.shape[0], k), tf.dtype)], axis=1)
    names = pt.names + tuple(f"blend_{i}" for i in range(k))
    pt2 = ParameterTransform(
        transform=jnp.asarray(tf2), offsets=pt.offsets, names=names,
        parameter_sets=pt.parameter_sets)
    return dataclasses.replace(
        character, parameter_transform=pt2, blend_shape=blend_shape,
        blend_shape_param_index=tuple(range(old_p, old_p + k)))


def simplify_parameter_transform(character: Character, keep: np.ndarray) -> Character:
    """Keep only the given model parameters (character.h:149
    simplifyParameterTransform). `keep` is a (P,) bool mask."""
    keep = np.asarray(keep, bool)
    if not keep.any():
        raise ValueError("no active parameters to keep")
    pt = subset_parameter_transform(character.parameter_transform, keep)
    from momentum_tpu.character.limits import remap_limits_model_parameters

    limits = remap_limits_model_parameters(character.limits, keep)
    return dataclasses.replace(character, parameter_transform=pt, limits=limits)


def simplify_skeleton(character: Character, active_joints: np.ndarray) -> Character:
    """Drop inactive joints, remapping everything attached (character.h:143
    simplifySkeleton). Inactive joints with active descendants are kept (a
    joint cannot outlive its ancestors)."""
    active = np.asarray(active_joints, bool).copy()
    parents = np.asarray(character.skeleton.joint_parent)
    # close over ancestors: every ancestor of an active joint stays
    for j in range(len(parents) - 1, -1, -1):
        if active[j] and parents[j] >= 0:
            active[parents[j]] = True
    remove = [character.skeleton.joint_names[j]
              for j in range(len(parents)) if not active[j]]
    if not remove:
        return character
    return remove_joints(character, remove)


def simplify(character: Character, enabled_params: np.ndarray | None = None) -> Character:
    """parametersToActiveJoints → simplifySkeleton, always keeping the root
    (character.cpp:553-563 Character::simplify)."""
    p = character.num_model_parameters
    enabled = np.ones(p, bool) if enabled_params is None \
        else np.asarray(enabled_params, bool)
    active = parameters_to_active_joints(character.parameter_transform, enabled)
    active[0] = True  # always keep the root (character.cpp:555-561)
    return simplify_skeleton(character, active)


def reduce_mesh_by_vertices(character: Character, active_vertices) -> Character:
    """Keep only the selected vertices and faces fully inside the selection
    (character_utility.h:104-125 reduceMeshByVertices): remaps faces, skin
    weights, and per-vertex attributes."""
    mesh = character.mesh
    if mesh is None:
        return character
    active = np.asarray(active_vertices, bool)
    v = mesh.num_vertices
    if active.shape[0] != v:
        raise ValueError(f"active_vertices has {active.shape[0]} entries "
                         f"for a {v}-vertex mesh")
    keep_idx = np.nonzero(active)[0]
    old_to_new = np.full(v, -1, np.int64)
    old_to_new[keep_idx] = np.arange(len(keep_idx))
    faces = np.asarray(mesh.faces)
    fkeep = active[faces].all(axis=1)
    new_faces = old_to_new[faces[fkeep]]

    def take(arr):
        return None if arr is None else jnp.asarray(np.asarray(arr)[keep_idx])

    new_mesh = dataclasses.replace(
        mesh,
        vertices=take(mesh.vertices),
        faces=jnp.asarray(new_faces.astype(np.int32)),
        normals=take(mesh.normals),
        colors=take(mesh.colors),
        confidence=take(mesh.confidence),
        texcoords=take(mesh.texcoords) if mesh.texcoord_faces is None
        else mesh.texcoords,
        texcoord_faces=None if mesh.texcoord_faces is None
        else jnp.asarray(np.asarray(mesh.texcoord_faces)[fkeep]),
    )
    out = dataclasses.replace(character, mesh=new_mesh)
    if character.skin_weights is not None:
        sw = character.skin_weights
        out = dataclasses.replace(out, skin_weights=SkinWeights(
            index=jnp.asarray(np.asarray(sw.index)[keep_idx]),
            weight=jnp.asarray(np.asarray(sw.weight)[keep_idx])))
    if character.blend_shape is not None:
        bs = character.blend_shape
        from momentum_tpu.character.blend_shape import BlendShape

        out = dataclasses.replace(out, blend_shape=BlendShape(
            base_shape=jnp.asarray(np.asarray(bs.base_shape)[keep_idx]),
            shape_vectors=jnp.asarray(
                np.asarray(bs.shape_vectors)[:, keep_idx])))
    return out


def reduce_mesh_by_faces(character: Character, active_faces) -> Character:
    """Keep only the selected faces and the vertices they use
    (character_utility.h:108-113 reduceMeshByFaces)."""
    mesh = character.mesh
    if mesh is None:
        return character
    active = np.asarray(active_faces, bool)
    faces = np.asarray(mesh.faces)
    if active.shape[0] != faces.shape[0]:
        raise ValueError("active_faces size mismatch")
    used = np.zeros(mesh.num_vertices, bool)
    used[faces[active].ravel()] = True
    # keep exactly the used vertices; the vertex-based reducer then keeps
    # every face whose 3 vertices survive — a superset of active when faces
    # share vertices, so mask the faces first
    masked = dataclasses.replace(
        character,
        mesh=dataclasses.replace(mesh, faces=jnp.asarray(
            faces[active].astype(np.int32)),
            texcoord_faces=None if mesh.texcoord_faces is None
            else jnp.asarray(np.asarray(mesh.texcoord_faces)[active])))
    return reduce_mesh_by_vertices(masked, used)


def map_parameter_transform_joints(pt: ParameterTransform, num_target_joints: int,
                                   joint_mapping) -> ParameterTransform:
    """Re-target a parameter transform onto a different skeleton's joint
    ordering (parameter_transform.h:202-205 mapParameterTransformJoints):
    joint_mapping[src_joint] = target joint index or -1 to drop. Rows of
    dropped joints vanish; columns are kept (apply subset_parameter_transform
    afterwards to drop now-unused parameters)."""
    mapping = np.asarray(joint_mapping, np.int64)
    src_joints = mapping.shape[0]
    tf = np.asarray(pt.transform)
    offs = np.asarray(pt.offsets)
    if tf.shape[0] != src_joints * PARAMS_PER_JOINT:
        raise ValueError("joint_mapping does not match the transform rows")
    out_tf = np.zeros((num_target_joints * PARAMS_PER_JOINT, tf.shape[1]),
                      tf.dtype)
    out_off = np.zeros(num_target_joints * PARAMS_PER_JOINT, offs.dtype)
    for sj in range(src_joints):
        tj = mapping[sj]
        if tj < 0:
            continue
        if tj >= num_target_joints:
            raise ValueError(f"mapping[{sj}]={tj} out of range")
        s0, t0 = sj * PARAMS_PER_JOINT, tj * PARAMS_PER_JOINT
        out_tf[t0:t0 + PARAMS_PER_JOINT] = tf[s0:s0 + PARAMS_PER_JOINT]
        out_off[t0:t0 + PARAMS_PER_JOINT] = offs[s0:s0 + PARAMS_PER_JOINT]
    return ParameterTransform(
        transform=jnp.asarray(out_tf), offsets=jnp.asarray(out_off),
        names=pt.names, parameter_sets=pt.parameter_sets)


def add_face_expression_parameters(character: Character, blend_shape,
                                   num_shapes=None) -> Character:
    """Extend the rig with face-expression coefficients
    (parameter_transform.h:212-215 addFaceExpressionParameters): like
    add_blend_shape_parameters but on the separate expression basis, which is
    applied additively as deltas on the (possibly shape-blended) rest mesh."""
    pt = character.parameter_transform
    k = num_shapes if num_shapes is not None else blend_shape.num_shapes
    old_p = pt.num_model_parameters
    tf = np.asarray(pt.transform)
    tf2 = np.concatenate([tf, np.zeros((tf.shape[0], k), tf.dtype)], axis=1)
    names = pt.names + tuple(f"face_expre_{i}" for i in range(k))
    pt2 = ParameterTransform(
        transform=jnp.asarray(tf2), offsets=pt.offsets, names=names,
        parameter_sets=pt.parameter_sets)
    return dataclasses.replace(
        character, parameter_transform=pt2,
        face_expression_blend_shape=blend_shape,
        face_expression_param_index=tuple(range(old_p, old_p + k)))


def add_skinned_locator_parameters(character: Character, active_locators=None) -> Character:
    """Add 3 model parameters (x/y/z rest offset) per active skinned locator
    (parameter_transform.h:222-226 addSkinnedLocatorParameters). Records the
    flattened (L, 3) parameter map in skinned_locator_param_index (-1 where a
    locator is inactive, matching skinnedLocatorParameters semantics)."""
    sl = character.skinned_locators
    if sl is None:
        raise ValueError("character has no skinned locators")
    n = sl.num_locators
    active = np.ones(n, bool) if active_locators is None \
        else np.asarray(active_locators, bool)
    pt = character.parameter_transform
    old_p = pt.num_model_parameters
    k = int(active.sum()) * 3
    tf = np.asarray(pt.transform)
    tf2 = np.concatenate([tf, np.zeros((tf.shape[0], k), tf.dtype)], axis=1)
    names = list(pt.names)
    index = np.full(n * 3, -1, np.int64)
    nxt = old_p
    for i in range(n):
        if not active[i]:
            continue
        nm = sl.names[i] if i < len(sl.names) else f"skinned_locator_{i}"
        for a, ax in enumerate("xyz"):
            names.append(f"{nm}_t{ax}")
            index[i * 3 + a] = nxt
            nxt += 1
    pt2 = ParameterTransform(
        transform=jnp.asarray(tf2), offsets=pt.offsets, names=tuple(names),
        parameter_sets=pt.parameter_sets)
    return dataclasses.replace(
        character, parameter_transform=pt2,
        skinned_locator_param_index=tuple(int(x) for x in index))


def skinned_locator_rest_offsets(character: Character, model_params):
    """(L, 3) rest offsets from the model parameters (zeros where
    unparameterized)."""
    sl = character.skinned_locators
    idx = np.asarray(character.skinned_locator_param_index, np.int64)
    gathered = jnp.take(model_params, jnp.asarray(np.maximum(idx, 0)), axis=-1)
    mask = jnp.asarray((idx >= 0).astype(np.float32))
    return (gathered * mask).reshape(model_params.shape[:-1] + (sl.num_locators, 3))


def add_rigid_transform_node(character: Character, name: str,
                             translation_offset=(0.0, 0.0, 0.0),
                             pre_rotation=(0.0, 0.0, 0.0, 1.0)):
    """Append a new root-level joint with 6 rigid DOF model parameters
    (character_utility.cpp:862-940 addRigidTransformNode): the joint has no
    parent, and parameters {name}_tx..{name}_rz map 1:1 onto its
    translation/rotation joint parameters. Useful for attaching cameras or
    other rigid frames without touching the original hierarchy.

    → (new_character, bone_index, parameter_start_index)."""
    skel = character.skeleton
    bone_index = skel.num_joints
    parents = np.asarray(skel.joint_parent).tolist() + [INVALID_INDEX]
    pre = np.concatenate([np.asarray(skel.pre_rotation),
                          np.asarray(pre_rotation, np.float32)[None, :]])
    offs = np.concatenate([np.asarray(skel.translation_offset),
                           np.asarray(translation_offset, np.float32)[None, :]])
    names = tuple(skel.joint_names) + (name,)
    new_skel = make_skeleton(parents, pre, offs, names)

    pt = character.parameter_transform
    old_rows, old_cols = np.asarray(pt.transform).shape
    parameter_start = old_cols
    mat = np.zeros((old_rows + PARAMS_PER_JOINT, old_cols + 6), np.float32)
    mat[:old_rows, :old_cols] = np.asarray(pt.transform)
    for k in range(6):  # tx ty tz rx ry rz → 1:1 columns
        mat[bone_index * PARAMS_PER_JOINT + k, parameter_start + k] = 1.0
    offsets = np.zeros(old_rows + PARAMS_PER_JOINT, np.float32)
    offsets[:old_rows] = np.asarray(pt.offsets)
    new_pt = ParameterTransform(
        transform=jnp.asarray(mat), offsets=jnp.asarray(offsets),
        names=pt.names + tuple(f"{name}_{s}"
                               for s in ("tx", "ty", "tz", "rx", "ry", "rz")),
        parameter_sets=pt.parameter_sets,
        pose_constraints=pt.pose_constraints,
    )
    out = dataclasses.replace(
        character, skeleton=new_skel, parameter_transform=new_pt,
        inverse_bind_pose=None)
    return out.with_inverse_bind_pose(), bone_index, parameter_start


def _map_locators(loc: Locators, joint_map: np.ndarray):
    """Remap locator parents through an old→new joint map, dropping locators
    whose parent was removed (character_utility.cpp:173-191 mapParents)."""
    if loc is None:
        return None
    lp = np.asarray(loc.parent)
    mapped = joint_map[lp]
    keep = mapped >= 0

    def _sub(arr):
        return None if arr is None else jnp.asarray(np.asarray(arr)[keep])

    return Locators(
        parent=jnp.asarray(mapped[keep], jnp.int32),
        offset=jnp.asarray(np.asarray(loc.offset)[keep]),
        weight=jnp.asarray(np.asarray(loc.weight)[keep]),
        names=tuple(np.asarray(loc.names)[keep].tolist()),
        locked=_sub(loc.locked), limit_weight=_sub(loc.limit_weight),
        limit_origin=_sub(loc.limit_origin),
        attached_to_skin=_sub(loc.attached_to_skin),
        skin_offset=_sub(loc.skin_offset),
    )


def _concat_locators(a: Locators, b: Locators) -> Locators:
    if a is None or a.parent.shape[0] == 0:
        return b
    if b is None or b.parent.shape[0] == 0:
        return a

    def _opt(x, y, shape_fn):
        """Concatenate optional per-locator arrays, zero-filling a missing side."""
        na, nb = a.parent.shape[0], b.parent.shape[0]
        if x is None and y is None:
            return None
        xa = np.zeros(shape_fn(na), np.float32) if x is None else np.asarray(x)
        yb = np.zeros(shape_fn(nb), np.float32) if y is None else np.asarray(y)
        return jnp.asarray(np.concatenate([xa, yb], axis=0))

    return Locators(
        parent=jnp.concatenate([a.parent, b.parent]),
        offset=jnp.concatenate([a.offset, b.offset]),
        weight=jnp.concatenate([a.weight, b.weight]),
        names=tuple(a.names) + tuple(b.names),
        locked=_opt(a.locked, b.locked, lambda n: (n, 3)),
        limit_weight=_opt(a.limit_weight, b.limit_weight, lambda n: (n, 3)),
        limit_origin=_opt(a.limit_origin, b.limit_origin, lambda n: (n, 3)),
        attached_to_skin=_opt(a.attached_to_skin, b.attached_to_skin,
                              lambda n: (n,)),
        skin_offset=_opt(a.skin_offset, b.skin_offset, lambda n: (n, 3)),
    )


def _filter_locators(loc: Locators, keep: np.ndarray) -> Locators:
    def _sub(arr):
        return None if arr is None else jnp.asarray(np.asarray(arr)[keep])

    return Locators(
        parent=jnp.asarray(np.asarray(loc.parent)[keep], jnp.int32),
        offset=jnp.asarray(np.asarray(loc.offset)[keep]),
        weight=jnp.asarray(np.asarray(loc.weight)[keep]),
        names=tuple(np.asarray(loc.names)[keep].tolist()),
        locked=_sub(loc.locked), limit_weight=_sub(loc.limit_weight),
        limit_origin=_sub(loc.limit_origin),
        attached_to_skin=_sub(loc.attached_to_skin),
        skin_offset=_sub(loc.skin_offset),
    )


def replace_skeleton_hierarchy(
    src_character: Character,
    tgt_character: Character,
    src_root: str,
    tgt_root: str,
) -> Character:
    """Replace the part of `tgt_character`'s skeleton rooted at `tgt_root`
    with the part of `src_character`'s skeleton rooted at `src_root` — e.g.
    swap one character's hand hierarchy onto another body
    (character_utility.cpp:572-758 replaceSkeletonHierarchy; bound as
    pymomentum.geometry.replace_skeleton_hierarchy).

    Semantics mirrored from the reference:
      * combined joints = target joints outside the tgt_root subtree, with
        the source joints strictly under src_root spliced in right after
        tgt_root (source parents resolve by name; src_root's own children
        attach to tgt_root);
      * locators/collision/physical bodies remap through the joint maps;
        duplicate locator and body entries prefer the SOURCE side;
      * model parameters merge by name (duplicates raise), limits remap per
        record type; the target's mesh/blendshapes are kept, with skinning
        re-pointed at each joint's nearest surviving ancestor by name.
    """
    from momentum_tpu.character.limits import concat_limits, map_limits

    src_skel, tgt_skel = src_character.skeleton, tgt_character.skeleton
    s_names = list(src_skel.joint_names)
    t_names = list(tgt_skel.joint_names)
    if src_root not in s_names:
        raise ValueError(f"source root joint '{src_root}' not found")
    if tgt_root not in t_names:
        raise ValueError(f"target root joint '{tgt_root}' not found")
    src_root_i, tgt_root_i = s_names.index(src_root), t_names.index(tgt_root)
    s_par = np.asarray(src_skel.joint_parent)
    t_par = np.asarray(tgt_skel.joint_parent)

    def strict_descendants(parents, root):
        n = len(parents)
        d = np.zeros(n, bool)
        d[root] = True
        for j in range(n):  # topological order: parent < child
            p = parents[j]
            if p != INVALID_INDEX and d[p]:
                d[j] = True
        d[root] = False
        return d

    s_desc = strict_descendants(s_par, src_root_i)
    t_desc = strict_descendants(t_par, tgt_root_i)

    comb_names, comb_parent, comb_pre, comb_off = [], [], [], []
    name_to_comb: dict = {}
    src_to_comb = np.full(len(s_par), INVALID_INDEX, np.int64)
    tgt_to_comb = np.full(len(t_par), INVALID_INDEX, np.int64)

    def add(names, parents, pre, off, j, mapping, fallback_parent=None):
        nm = names[j]
        if nm in name_to_comb:
            raise ValueError(f"duplicate joint '{nm}' while reparenting")
        ci = len(comb_names)
        mapping[j] = ci
        name_to_comb[nm] = ci
        p = parents[j]
        if p == INVALID_INDEX:
            cp = INVALID_INDEX
        else:
            pnm = names[p]
            if pnm in name_to_comb:
                cp = name_to_comb[pnm]
            elif fallback_parent is not None:
                # src_root's children attach to tgt_root even when the two
                # roots are named differently (the reference asserts the name
                # resolves, which requires matching root names)
                cp = fallback_parent
            else:
                raise ValueError(
                    f"parent '{pnm}' of joint '{nm}' not in combined skeleton")
        comb_names.append(nm)
        comb_parent.append(cp)
        comb_pre.append(np.asarray(pre)[j])
        comb_off.append(np.asarray(off)[j])

    for i in range(len(t_par)):
        if i == tgt_root_i:
            add(t_names, t_par, tgt_skel.pre_rotation,
                tgt_skel.translation_offset, i, tgt_to_comb)
            root_ci = name_to_comb[tgt_root]
            for k in range(src_root_i + 1, len(s_par)):
                if s_desc[k]:
                    add(s_names, s_par, src_skel.pre_rotation,
                        src_skel.translation_offset, k, src_to_comb,
                        fallback_parent=root_ci)
        elif not t_desc[i]:
            add(t_names, t_par, tgt_skel.pre_rotation,
                tgt_skel.translation_offset, i, tgt_to_comb)

    comb_skel = make_skeleton(
        comb_parent, pre_rotations=np.asarray(comb_pre),
        translation_offsets=np.asarray(comb_off), names=comb_names)
    n_comb = len(comb_names)

    # ---- merged parameter transform (character_utility.cpp:293-360
    # addMappedParameters: keep parameters driving surviving joints, merge by
    # name, scatter rows into the combined joint layout; offsets reset) ----
    cols, names = [], []

    def add_mapped(pt: ParameterTransform, jmap: np.ndarray) -> np.ndarray:
        tf = np.asarray(pt.transform)
        n_p = tf.shape[1]
        valid = np.zeros(n_p, bool)
        for j, cj in enumerate(jmap):
            if cj < 0:
                continue
            rows = tf[j * PARAMS_PER_JOINT:(j + 1) * PARAMS_PER_JOINT]
            valid |= (np.abs(rows) > 0).any(axis=0)
        pmap = np.full(n_p, INVALID_INDEX, np.int64)
        existing = set(names)
        for p in np.nonzero(valid)[0]:
            nm = pt.names[p]
            if nm in existing:
                raise ValueError(
                    f"duplicate parameter '{nm}' while merging transforms")
            col = np.zeros(n_comb * PARAMS_PER_JOINT, np.float32)
            for j, cj in enumerate(jmap):
                if cj >= 0:
                    col[cj * PARAMS_PER_JOINT:(cj + 1) * PARAMS_PER_JOINT] = \
                        tf[j * PARAMS_PER_JOINT:(j + 1) * PARAMS_PER_JOINT, p]
            pmap[p] = len(names)
            names.append(nm)
            cols.append(col)
        return pmap

    tgt_pmap = add_mapped(tgt_character.parameter_transform, tgt_to_comb)
    src_pmap = add_mapped(src_character.parameter_transform, src_to_comb)
    comb_pt = ParameterTransform(
        transform=jnp.asarray(np.stack(cols, axis=1) if cols
                              else np.zeros((n_comb * PARAMS_PER_JOINT, 0),
                                            np.float32)),
        offsets=jnp.zeros(n_comb * PARAMS_PER_JOINT, jnp.float32),
        names=tuple(names),
    )

    # ---- limits ----
    comb_limits = concat_limits(
        map_limits(tgt_character.limits, tgt_to_comb, tgt_pmap),
        map_limits(src_character.limits, src_to_comb, src_pmap))

    # ---- locators: duplicates prefer the source side
    # (character_utility.cpp:644-655) ----
    src_loc = _map_locators(src_character.locators, src_to_comb)
    tgt_loc = _map_locators(tgt_character.locators, tgt_to_comb)
    if tgt_loc is not None and src_loc is not None:
        src_names = set(src_loc.names)
        keep = np.asarray([nm not in src_names for nm in tgt_loc.names], bool)
        tgt_loc = _filter_locators(tgt_loc, keep)
    comb_loc = _concat_locators(tgt_loc, src_loc)

    # ---- collision: both sides merged (character_utility.cpp:663-671) ----
    def map_collision(col, jmap):
        if col is None:
            return None
        cp = np.asarray(col.parent)
        mapped = jmap[cp]
        keep = mapped >= 0
        if not keep.any():
            return None

        def _sub(arr):
            return None if arr is None else jnp.asarray(np.asarray(arr)[keep])

        return CollisionGeometry(
            parent=jnp.asarray(mapped[keep], jnp.int32),
            transform=jnp.asarray(np.asarray(col.transform)[keep]),
            radius=jnp.asarray(np.asarray(col.radius)[keep]),
            length=jnp.asarray(np.asarray(col.length)[keep]),
            ptype=_sub(col.ptype),
            ellipsoid_radii=_sub(col.ellipsoid_radii),
            box_half_extents=_sub(col.box_half_extents),
        )

    def concat_collision(a, b):
        if a is None:
            return b
        if b is None:
            return a
        na, nb = a.parent.shape[0], b.parent.shape[0]

        def _opt(x, y, default_a, default_b):
            if x is None and y is None:
                return None
            xa = default_a if x is None else np.asarray(x)
            yb = default_b if y is None else np.asarray(y)
            return jnp.asarray(np.concatenate([xa, yb], axis=0))

        return CollisionGeometry(
            parent=jnp.concatenate([a.parent, b.parent]),
            transform=jnp.concatenate([a.transform, b.transform]),
            radius=jnp.concatenate([a.radius, b.radius]),
            length=jnp.concatenate([a.length, b.length]),
            ptype=_opt(a.ptype, b.ptype, np.zeros(na, np.int32),
                       np.zeros(nb, np.int32)),
            ellipsoid_radii=_opt(a.ellipsoid_radii, b.ellipsoid_radii,
                                 np.zeros((na, 3), np.float32),
                                 np.zeros((nb, 3), np.float32)),
            box_half_extents=_opt(a.box_half_extents, b.box_half_extents,
                                  np.zeros((na, 3), np.float32),
                                  np.zeros((nb, 3), np.float32)),
        )

    comb_col = concat_collision(
        map_collision(tgt_character.collision, tgt_to_comb),
        map_collision(src_character.collision, src_to_comb))

    # ---- skinning: keep the target mesh; each target joint maps to itself
    # if it survived, else the nearest ancestor whose name survives
    # (character_utility.cpp:691-717 tgtToCombinedWithParents) ----
    comb_skin = None
    if tgt_character.mesh is not None and tgt_character.skin_weights is not None:
        walk = np.zeros(len(t_par), np.int64)
        for j in range(len(t_par)):
            a = j
            while a != INVALID_INDEX and t_names[a] not in name_to_comb:
                a = t_par[a]
            if a == INVALID_INDEX:
                raise ValueError(
                    f"no surviving ancestor for target joint '{t_names[j]}'")
            walk[j] = name_to_comb[t_names[a]]
        si = np.asarray(tgt_character.skin_weights.index)
        comb_skin = SkinWeights(
            index=jnp.asarray(walk[si], jnp.int32),
            weight=tgt_character.skin_weights.weight)

    # ---- physical bodies: duplicates (same combined joint) prefer source
    # (character_utility.cpp:720-738) ----
    comb_pp = None
    pieces = []
    for char_, jmap in ((tgt_character, tgt_to_comb),
                        (src_character, src_to_comb)):
        pp = char_.physical_properties
        if pp is None:
            continue
        pj = np.asarray(pp.joint_index)
        mapped = jmap[pj]
        keep = mapped >= 0
        if keep.any():
            pieces.append((mapped[keep], pp, keep))
    if pieces:
        if len(pieces) == 2:
            src_joints = set(pieces[1][0].tolist())
            tj, tpp, tkeep = pieces[0]
            extra = np.asarray([j not in src_joints for j in tj], bool)
            tkeep2 = np.zeros_like(tkeep)
            tkeep2[np.nonzero(tkeep)[0][extra]] = True
            pieces[0] = (tj[extra], tpp, tkeep2)
        ji = np.concatenate([p[0] for p in pieces])

        def cat(field):
            return jnp.asarray(np.concatenate(
                [np.asarray(getattr(p[1], field))[p[2]] for p in pieces]))

        comb_pp = PhysicalProperties(
            joint_index=jnp.asarray(ji, jnp.int32),
            mass=cat("mass"),
            center_of_mass_offset=cat("center_of_mass_offset"),
            inertia=cat("inertia"),
            inertia_rotation=cat("inertia_rotation"),
            joint_names=tuple(comb_names[int(j)] for j in ji),
        )

    out = Character(
        skeleton=comb_skel, parameter_transform=comb_pt, limits=comb_limits,
        mesh=tgt_character.mesh, skin_weights=comb_skin,
        blend_shape=tgt_character.blend_shape, locators=comb_loc,
        collision=comb_col, physical_properties=comb_pp,
    )
    return out.with_inverse_bind_pose() if comb_skin is not None else out


def vertices_to_faces(mesh: Mesh, active_vertices) -> np.ndarray:
    """Vertex selection → face selection: a face stays active only when ALL
    its vertices are active (character_utility.h:142 verticesToFaces)."""
    av = np.asarray(active_vertices, bool)
    faces = np.asarray(mesh.faces)
    return av[faces].all(axis=1)


def faces_to_vertices(mesh: Mesh, active_faces) -> np.ndarray:
    """Face selection → vertex selection: a vertex is active when ANY active
    face references it (character_utility.h:149 facesToVertices)."""
    af = np.asarray(active_faces, bool)
    faces = np.asarray(mesh.faces)
    nv = np.asarray(mesh.vertices).shape[0]
    out = np.zeros(nv, bool)
    out[faces[af].reshape(-1)] = True
    return out
