"""Tracker utilities: locator-character surgery, identity plumbing, marker
synthesis, skinned-locator conversion, floor contacts.

Reference: momentum/marker_tracking/tracker_utils.cpp —
createLocatorCharacter (:636), extractLocatorsFromCharacter (:730),
extractParameters / extractIdAndLocatorsFromParams (:809-838),
fillIdentity / removeIdentity (:848-884), extractMarkersFromMotion (:905),
averageTriangleSkinWeights (:113), isRelatedJoint (:172),
closestPointOnMeshMatchingParent (:187), locatorsToSkinnedLocators (:243),
skinnedLocatorsToLocators (:340), computeFloorContactConstraints (:944).

These are host-side character-surgery and data-prep helpers (numpy for the
irregular parts); the per-frame math (FK, closest points) is batched JAX.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.character import Character, Locators, SkinnedLocators, make_skeleton
from momentum_tpu.character.parameter_transform import ParameterTransform
from momentum_tpu.character.skeleton import PARAMS_PER_JOINT
from momentum_tpu.math import skel_state as ss
from momentum_tpu.math.geometry import point_triangle_closest_point

__all__ = [
    "create_locator_character",
    "extract_locators_from_character",
    "extract_parameters",
    "extract_id_and_locators_from_params",
    "fill_identity",
    "remove_identity",
    "extract_markers_from_motion",
    "is_related_joint",
    "average_triangle_skin_weights",
    "closest_point_on_mesh_matching_parent",
    "locators_to_skinned_locators",
    "skinned_locators_to_locators",
    "compute_floor_contact_constraints",
]

_MAX_SKIN = 8


def create_locator_character(character: Character, prefix: str = "locator_"):
    """Turn every locator into its own joint with 3 translation rig
    parameters, so locator offsets can be calibrated as ordinary model
    parameters (tracker_utils.cpp:636-728). Returns (locator_character,
    locator_param_mask) where the mask selects the added parameters; the
    new parameter set is also registered as "locators"."""
    skel = character.skeleton
    loc = character.locators
    nj = skel.num_joints
    nl = loc.num_locators

    parents = np.concatenate([np.asarray(skel.joint_parent),
                              np.asarray(loc.parent)]).astype(np.int64)
    pre = np.concatenate([np.asarray(skel.pre_rotation),
                          np.tile([0.0, 0.0, 0.0, 1.0], (nl, 1))], axis=0)
    offs = np.concatenate([np.asarray(skel.translation_offset),
                           np.asarray(loc.offset)], axis=0)
    names = list(skel.joint_names) + [
        prefix + (loc.names[i] if loc.names else f"l{i}") for i in range(nl)]
    new_skel = make_skeleton(parents, pre, offs, names)

    pt = character.parameter_transform
    p_old = pt.num_model_parameters
    old_mat = np.asarray(pt.transform)
    new_rows = (nj + nl) * PARAMS_PER_JOINT
    mat = np.zeros((new_rows, p_old + 3 * nl), old_mat.dtype)
    mat[: old_mat.shape[0], :p_old] = old_mat
    pnames = list(pt.names)
    for i in range(nl):
        jid = nj + i
        for a, suffix in enumerate(("_tx", "_ty", "_tz")):
            col = p_old + 3 * i + a
            mat[jid * PARAMS_PER_JOINT + a, col] = 1.0
            pnames.append(names[jid] + suffix)
    offsets = np.zeros(new_rows, old_mat.dtype)
    offsets[: old_mat.shape[0]] = np.asarray(pt.offsets)
    loc_set = tuple(range(p_old, p_old + 3 * nl))
    sets = dict(pt.parameter_sets)
    sets["locators"] = loc_set
    new_pt = ParameterTransform(
        transform=jnp.asarray(mat), offsets=jnp.asarray(offsets),
        names=tuple(pnames), parameter_sets=sets)

    new_loc = Locators(
        parent=jnp.arange(nj, nj + nl, dtype=jnp.int32),
        offset=jnp.zeros((nl, 3), jnp.float32),
        weight=loc.weight,
        names=loc.names)
    mask = np.zeros(p_old + 3 * nl, bool)
    mask[list(loc_set)] = True
    char = dataclasses.replace(
        character, skeleton=new_skel, parameter_transform=new_pt,
        locators=new_loc)
    return char.with_inverse_bind_pose(), mask


def extract_locators_from_character(locator_character: Character,
                                    calib_params) -> Locators:
    """Map calibrated locator-joint positions back into the ORIGINAL parent
    frames (tracker_utils.cpp:730-785)."""
    char = locator_character
    states = char.skeleton_states(jnp.asarray(calib_params, jnp.float32))
    loc = char.locators
    world = ss.transform_points(
        jnp.take(states, loc.parent, axis=-2), loc.offset)
    orig_parent = jnp.take(jnp.asarray(char.skeleton.joint_parent),
                           loc.parent)
    parent_states = jnp.take(states, orig_parent, axis=-2)
    offset = ss.transform_points(ss.inverse(parent_states), world)
    return Locators(parent=orig_parent.astype(jnp.int32),
                    offset=offset, weight=loc.weight, names=loc.names)


def extract_parameters(params, parameter_mask):
    """Zero every parameter outside the mask (tracker_utils.cpp:809)."""
    return jnp.where(jnp.asarray(parameter_mask), jnp.asarray(params), 0.0)


def _scaling_mask(character):
    pt = character.parameter_transform
    mask = np.zeros(pt.num_model_parameters, bool)
    if "scaling" in pt.parameter_sets:
        mask[list(pt.parameter_sets["scaling"])] = True
    else:
        mask[[i for i, n in enumerate(pt.names)
              if "scale" in n.lower()]] = True
    return mask


def extract_id_and_locators_from_params(params, source_character,
                                        target_character):
    """→ (identity params, calibrated Locators) from a locator-character
    solve (tracker_utils.cpp:820-838)."""
    id_mask = _scaling_mask(target_character)
    n = target_character.parameter_transform.num_model_parameters
    id_params = extract_parameters(jnp.asarray(params)[..., :n],
                                   id_mask)
    locators = extract_locators_from_character(source_character, params)
    return id_params, locators


def fill_identity(motion, identity, scaling_mask=None, character=None):
    """Overwrite the scaling rows of a (F, P) motion with the shared
    identity vector (tracker_utils.cpp:848-866)."""
    motion = jnp.asarray(motion)
    if scaling_mask is None:
        scaling_mask = _scaling_mask(character)
    m = jnp.asarray(scaling_mask)
    return jnp.where(m, jnp.asarray(identity), motion)


def remove_identity(motion, scaling_mask=None, character=None):
    """Zero the scaling rows of a (F, P) motion (tracker_utils.cpp:867-883)."""
    motion = jnp.asarray(motion)
    if scaling_mask is None:
        scaling_mask = _scaling_mask(character)
    return jnp.where(jnp.asarray(scaling_mask), 0.0, motion)


def extract_markers_from_motion(character: Character, motion) -> jnp.ndarray:
    """Synthesize marker positions from tracked motion: (F, L, 3) world
    locator positions (tracker_utils.cpp:905-922)."""
    motion = jnp.asarray(motion, jnp.float32)
    states = jax.vmap(character.skeleton_states)(motion)
    return jax.vmap(character.locators.world_positions)(states)


def is_related_joint(skeleton, joint_a: int, joint_b: int) -> bool:
    """Same joint or direct parent/child (tracker_utils.cpp:172-186)."""
    if joint_a == joint_b:
        return True
    parent = np.asarray(skeleton.joint_parent)
    return (parent[joint_a] == joint_b) or (parent[joint_b] == joint_a)


def average_triangle_skin_weights(character, triangle_index: int,
                                  barycentric):
    """Barycentric blend of the triangle's vertex skin weights, top-8 kept
    and renormalized (tracker_utils.cpp:113-154). → (indices (8,),
    weights (8,))."""
    skin = character.skin_weights
    tri = np.asarray(character.mesh.faces)[triangle_index]
    bary = np.asarray(barycentric, np.float64)
    nj = character.skeleton.num_joints
    dense = np.zeros(nj)
    idx = np.asarray(skin.index)
    wgt = np.asarray(skin.weight)
    for k in range(3):
        np.add.at(dense, idx[tri[k]], wgt[tri[k]] * bary[k])
    order = np.argsort(-dense)[:_MAX_SKIN]
    w = dense[order]
    total = w.sum()
    w = w / total if total > 0 else w
    # fixed-width (kMaxSkinJoints) outputs, zero-padded like the reference
    idx8 = np.zeros(_MAX_SKIN, np.int32)
    w8 = np.zeros(_MAX_SKIN, np.float32)
    idx8[: len(order)] = order
    w8[: len(w)] = w
    return idx8, w8


def closest_point_on_mesh_matching_parent(character, p_world, parent_idx: int,
                                          cutoff_weight: float = 0.02):
    """Closest point on the rest mesh restricted to triangles whose average
    skin weight on {parent, its parent, its children} exceeds the cutoff
    (tracker_utils.cpp:187-241). Batched over ALL triangles at once — the
    TPU-right shape for the reference's per-triangle scan. Returns
    (triangle_index, barycentric (3,), point (3,), distance) or None if no
    triangle passes the cutoff."""
    mesh = character.mesh
    skin = character.skin_weights
    faces = np.asarray(mesh.faces)
    idx = np.asarray(skin.index)
    wgt = np.asarray(skin.weight)
    parent = np.asarray(character.skeleton.joint_parent)

    nj = character.skeleton.num_joints
    related = np.zeros(nj, bool)
    related[parent_idx] = True
    if parent[parent_idx] >= 0:
        related[parent[parent_idx]] = True
    related[np.nonzero(parent == parent_idx)[0]] = True

    tri_w = (related[idx[faces]] * wgt[faces]).sum((-1, -2)) / 3.0  # (F,)
    ok = tri_w >= cutoff_weight
    if not ok.any():
        return None

    verts = jnp.asarray(mesh.vertices)
    tri_pts = jnp.take(verts, jnp.asarray(faces), axis=0)  # (F, 3, 3)
    p = jnp.asarray(p_world, jnp.float32)
    q, bary = point_triangle_closest_point(
        p, tri_pts[:, 0], tri_pts[:, 1], tri_pts[:, 2])
    dist = jnp.linalg.norm(q - p, axis=-1)
    dist = jnp.where(jnp.asarray(ok), dist, jnp.inf)
    best = int(jnp.argmin(dist))
    return best, np.asarray(bary[best]), np.asarray(q[best]), float(dist[best])


def locators_to_skinned_locators(character: Character,
                                 cutoff_weight: float = 0.02) -> Character:
    """Convert joint-attached locators to mesh-skinned locators by snapping
    each to the closest admissible rest-mesh point and blending that
    triangle's skin weights (tracker_utils.cpp:243-338). Locators with no
    admissible triangle stay joint-attached."""
    loc = character.locators
    if loc is None or loc.num_locators == 0:
        return character
    bind = np.asarray(character.bind_pose())
    parents_np = np.asarray(loc.parent)
    offsets_np = np.asarray(loc.offset)
    kept_rows = []
    skinned = []
    for i in range(loc.num_locators):
        world = np.asarray(ss.transform_points(
            jnp.asarray(bind[parents_np[i]]), jnp.asarray(offsets_np[i])))
        hit = closest_point_on_mesh_matching_parent(
            character, world, int(parents_np[i]), cutoff_weight)
        if hit is None:
            kept_rows.append(i)
            continue
        tri_idx, bary, point, _ = hit
        sidx, sw = average_triangle_skin_weights(character, tri_idx, bary)
        name = loc.names[i] if loc.names else f"l{i}"
        skinned.append((name, sidx, sw, point))
    if not skinned:
        return character
    k = _MAX_SKIN
    new_sl = SkinnedLocators(
        parents=jnp.asarray(np.stack([s[1] for s in skinned]), jnp.int32),
        skin_weights=jnp.asarray(np.stack([s[2] for s in skinned])),
        rest_position=jnp.asarray(np.stack([s[3] for s in skinned]),
                                  jnp.float32),
        names=tuple(s[0] for s in skinned))
    if character.skinned_locators is not None and \
            character.skinned_locators.num_locators:
        old = character.skinned_locators
        new_sl = SkinnedLocators(
            parents=jnp.concatenate([old.parents, new_sl.parents]),
            skin_weights=jnp.concatenate([old.skin_weights,
                                          new_sl.skin_weights]),
            rest_position=jnp.concatenate([old.rest_position,
                                           new_sl.rest_position]),
            names=old.names + new_sl.names)
    kept = Locators(
        parent=jnp.asarray(parents_np[kept_rows].astype(np.int32)),
        offset=jnp.asarray(offsets_np[kept_rows]),
        weight=jnp.take(loc.weight, jnp.asarray(kept_rows, jnp.int32))
        if kept_rows else jnp.zeros((0,), jnp.float32),
        names=tuple(loc.names[i] for i in kept_rows) if loc.names else ())
    return dataclasses.replace(character, locators=kept,
                               skinned_locators=new_sl)


def skinned_locators_to_locators(character: Character) -> Character:
    """Reattach each skinned locator to its strongest-weight joint as a
    plain locator (tracker_utils.cpp:340-405): offset = bind-frame inverse
    of the rest position."""
    sl = character.skinned_locators
    if sl is None or sl.num_locators == 0:
        return character
    best_k = np.argmax(np.asarray(sl.skin_weights), axis=1)
    parents = np.asarray(sl.parents)[np.arange(sl.num_locators), best_k]
    bind = character.bind_pose()
    parent_states = jnp.take(bind, jnp.asarray(parents), axis=0)
    offset = ss.transform_points(ss.inverse(parent_states), sl.rest_position)
    loc = character.locators
    new_loc = Locators(
        parent=jnp.asarray(parents, jnp.int32),
        offset=offset,
        weight=jnp.ones(sl.num_locators, jnp.float32),
        names=sl.names)
    if loc is not None and loc.num_locators:
        new_loc = Locators(
            parent=jnp.concatenate([loc.parent, new_loc.parent]),
            offset=jnp.concatenate([loc.offset, new_loc.offset]),
            weight=jnp.concatenate([loc.weight, new_loc.weight]),
            names=loc.names + new_loc.names)
    return dataclasses.replace(character, locators=new_loc,
                               skinned_locators=None)


def compute_floor_contact_constraints(character: Character, motion,
                                      floor_parents, floor_offsets,
                                      floor_normal=(0.0, 1.0, 0.0),
                                      floor_d: float = 0.0,
                                      percentile: float = 0.15):
    """Per-locator contact detection over a motion
    (tracker_utils.cpp:944-1002): signed height of each floor locator per
    frame, per-locator percentile threshold, contact where height ≤
    threshold. Returns (contact (F, L) bool, heights (F, L)) — batched FK
    over all frames at once instead of the reference's frame loop."""
    motion = jnp.asarray(motion, jnp.float32)
    states = jax.vmap(character.skeleton_states)(motion)
    fp = jnp.asarray(floor_parents, jnp.int32)
    fo = jnp.asarray(floor_offsets, jnp.float32)
    pts = ss.transform_points(jnp.take(states, fp, axis=-2), fo)  # (F, L, 3)
    n = jnp.asarray(floor_normal, jnp.float32)
    heights = jnp.einsum("...i,i->...", pts, n) - floor_d  # (F, L)
    f = heights.shape[0]
    k = min(int(percentile * f), f - 1)
    thresh = jnp.sort(heights, axis=0)[k]  # (L,)
    return heights <= thresh, heights
