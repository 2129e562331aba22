"""pymomentum-style convenience API.

Function-for-function surface of the reference's `pymomentum.geometry`
array ops (geometry_pybind.cpp:159-268, array_*.cpp) so users migrating from
pymomentum find the operations under familiar names. All functions are
jit/vmap-safe and batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.character import fk
from momentum_tpu.character.inverse_fk import joint_parameters_from_skeleton_states
from momentum_tpu.character.skinning import apply_ssd, skin_points, skinning_matrices
from momentum_tpu.math import skel_state as ss

__all__ = [
    "apply_parameter_transform",
    "model_parameters_to_skeleton_state",
    "joint_parameters_to_skeleton_state",
    "skeleton_state_to_joint_parameters",
    "model_parameters_to_positions",
    "joint_parameters_to_positions",
    "skin_points_from_model_parameters",
    "uniform_random_to_model_parameters",
    "reduce_to_selected_model_parameters",
    "bones_to_vertices",
    "reduce_mesh_to_bones",
    "compare_skeleton_states",
    "find_closest_points",
    "find_closest_points_on_mesh",
    "compute_vertex_normals",
    "replace_rest_mesh",
    "map_model_parameters",
    "map_joint_parameters",
    "model_parameters_to_blend_shape_coefficients",
    "model_parameters_to_face_expression_coefficients",
    "model_parameters_to_local_skeleton_state",
    "joint_parameters_to_local_skeleton_state",
    "local_skeleton_state_to_joint_parameters",
    "strip_lower_body_vertices",
    "strip_joints",
    "replace_skeleton_hierarchy",
    "reduce_mesh_by_faces",
    "reduce_mesh_by_vertices",
    "classify_triangles_by_texture",
    "split_mesh_by_texture_region",
    "load_markers",
    "load_markers_from_bytes",
    "load_motion",
    "is_fbxsdk_available",
]


def apply_parameter_transform(character, model_parameters):
    """(..., P) → (..., nJ*7) (pymomentum.geometry.apply_parameter_transform)."""
    return character.parameter_transform.apply(model_parameters)


def model_parameters_to_skeleton_state(character, model_parameters):
    """(..., P) → (..., nJ, 8) global skel states
    (pymomentum model_parameters_to_skeleton_state)."""
    return character.skeleton_states(model_parameters)


def joint_parameters_to_skeleton_state(character, joint_parameters):
    return fk.global_skel_states(character.skeleton, joint_parameters)


def skeleton_state_to_joint_parameters(character, skeleton_state):
    return joint_parameters_from_skeleton_states(character.skeleton, skeleton_state)


def model_parameters_to_positions(character, model_parameters):
    """World positions of all locators (pymomentum joint_parameters_to_positions
    analog on the locator set)."""
    states = character.skeleton_states(model_parameters)
    return character.locators.world_positions(states)


def joint_parameters_to_positions(character, joint_parameters):
    states = fk.global_skel_states(character.skeleton, joint_parameters)
    return character.locators.world_positions(states)


def skin_points_from_model_parameters(character, model_parameters):
    """Posed mesh vertices (LBS; blendshapes applied when rigged)."""
    char = character.with_inverse_bind_pose()
    states = char.skeleton_states(model_parameters)
    rest = char.mesh.vertices
    if char.blend_shape is not None and char.blend_shape_param_index is not None:
        coeffs = jnp.take(model_parameters,
                          jnp.asarray(char.blend_shape_param_index), axis=-1)
        rest = char.blend_shape.apply(coeffs)
    return skin_points(char.skin_weights, states, char.inverse_bind_pose, rest)


def uniform_random_to_model_parameters(character, unit_samples):
    """Map uniform [0,1] samples to plausible model parameters using the
    parameter limits where available (pymomentum
    uniform_random_to_model_parameters, array_parameter_transform.cpp)."""
    p = character.num_model_parameters
    lo = np.full(p, -np.pi, np.float32)
    hi = np.full(p, np.pi, np.float32)
    lim = character.limits
    idx = np.asarray(lim.minmax_index)
    bounds = np.asarray(lim.minmax_bounds)
    for i, pi in enumerate(idx):
        lo[pi] = bounds[i, 0]
        hi[pi] = bounds[i, 1]
    lo_j = jnp.asarray(lo)
    hi_j = jnp.asarray(hi)
    return lo_j + unit_samples * (hi_j - lo_j)


def compare_skeleton_states(state_a, state_b):
    """Similarity metrics between two skeleton states
    (SkeletonStateT::compare, skeleton_state.h:520-566): returns dict with
    max/mean position error and max/mean rotation angle error (radians)."""
    ta, qa, _ = ss.split(state_a)
    tb, qb, _ = ss.split(state_b)
    pos_err = jnp.linalg.norm(ta - tb, axis=-1)
    dot = jnp.clip(jnp.abs(jnp.sum(qa * qb, axis=-1)), 0.0, 1.0)
    ang_err = 2.0 * jnp.arccos(dot)
    return dict(
        max_position_error=jnp.max(pos_err),
        mean_position_error=jnp.mean(pos_err),
        max_rotation_error=jnp.max(ang_err),
        mean_rotation_error=jnp.mean(ang_err),
    )


def reduce_to_selected_model_parameters(character, enabled):
    """pymomentum geometry reduce_to_selected_model_parameters: subset the
    parameter transform to the enabled mask."""
    from momentum_tpu.character.utility import simplify_parameter_transform

    return simplify_parameter_transform(character, enabled)


def bones_to_vertices(character, joints_to_keep):
    """Vertices whose dominant skinning influence is one of `joints_to_keep`
    (momentum_geometry.cpp bonesToVertices)."""
    import numpy as np

    if character.skin_weights is None:
        raise ValueError("character has no skin weights")
    keep = np.zeros(character.num_joints, bool)
    keep[np.asarray(joints_to_keep, np.int64)] = True
    idx = np.asarray(character.skin_weights.index)
    w = np.asarray(character.skin_weights.weight)
    dominant = idx[np.arange(idx.shape[0]), w.argmax(axis=1)]
    return keep[dominant]


def reduce_mesh_to_bones(character, joints_to_keep):
    """pymomentum geometry: reduce the mesh to vertices skinned to the given
    joints (momentum_geometry.cpp:515-524)."""
    from momentum_tpu.character.utility import reduce_mesh_by_vertices

    return reduce_mesh_by_vertices(
        character, bones_to_vertices(character, joints_to_keep))


def find_closest_points(points_source, points_target, max_dist=None,
                        normals_source=None, normals_target=None,
                        max_normal_dot=0.0):
    """For each source point, the closest target point
    (pymomentum.geometry.find_closest_points, geometry_pybind.cpp:1445-1481).
    With normals given, only targets with n_src·n_tgt > max_normal_dot are
    admissible — avoids front/back mismatches. Batched brute force (the
    TPU-right shape vs the reference's KD-tree). Returns
    (points (..., S, D), index (..., S) int32 [-1 invalid], valid (..., S))."""
    src = jnp.asarray(points_source, jnp.float32)
    tgt = jnp.asarray(points_target, jnp.float32)
    d2 = jnp.sum((src[..., :, None, :] - tgt[..., None, :, :]) ** 2, axis=-1)
    if normals_source is not None and normals_target is not None:
        ns = jnp.asarray(normals_source, jnp.float32)
        nt = jnp.asarray(normals_target, jnp.float32)
        ndot = jnp.einsum("...si,...ti->...st", ns, nt)
        d2 = jnp.where(ndot > max_normal_dot, d2, jnp.inf)
    if max_dist is not None:
        d2 = jnp.where(d2 <= max_dist * max_dist, d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)
    best = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
    valid = jnp.isfinite(best)
    pts = jnp.take_along_axis(
        tgt, idx[..., None].repeat(tgt.shape[-1], -1), axis=-2)
    pts = jnp.where(valid[..., None], pts, 0.0)
    return pts, jnp.where(valid, idx, -1).astype(jnp.int32), valid


def find_closest_points_on_mesh(points_source, vertices_target, faces_target):
    """Closest point on a triangle mesh per source point
    (geometry_pybind.cpp:1484-1499). Returns (valid, points, face_index,
    bary)."""
    from momentum_tpu.axel.queries import closest_point_on_mesh

    cp, fi, bary, d2 = closest_point_on_mesh(
        jnp.asarray(points_source, jnp.float32),
        jnp.asarray(vertices_target, jnp.float32),
        jnp.asarray(faces_target, jnp.int32))
    valid = jnp.isfinite(d2)
    return valid, cp, fi.astype(jnp.int32), bary


def compute_vertex_normals(vertex_positions, triangles):
    """Smooth area-weighted vertex normals
    (pymomentum.geometry.compute_vertex_normals)."""
    from momentum_tpu.character.skinning import update_normals

    return update_normals(jnp.asarray(vertex_positions, jnp.float32),
                          jnp.asarray(triangles, jnp.int32))


def replace_rest_mesh(character, rest_vertex_positions):
    """New character with replaced rest-mesh positions, topology unchanged
    (geometry_pybind.cpp replace_rest_mesh)."""
    import dataclasses

    v = jnp.asarray(rest_vertex_positions, jnp.float32)
    if v.shape != character.mesh.vertices.shape:
        raise ValueError("replace_rest_mesh cannot change topology: "
                         f"{v.shape} vs {character.mesh.vertices.shape}")
    return dataclasses.replace(
        character, mesh=dataclasses.replace(character.mesh, vertices=v))


def map_model_parameters(motion, source_character, target_character,
                         verbose=False):
    """Map (..., P_src) model parameters onto the target character's
    parameter ordering by NAME (pymomentum map_model_parameters,
    array_parameter_transform.cpp:557-713); unmatched target params are 0."""
    motion = jnp.asarray(motion)
    src_names = list(source_character.parameter_transform.names)
    tgt_names = list(target_character.parameter_transform.names)
    src_idx = {n: i for i, n in enumerate(src_names)}
    cols = np.asarray([src_idx.get(n, -1) for n in tgt_names], np.int64)
    if verbose:
        missing = [n for n in tgt_names if n not in src_idx]
        if missing:
            print(f"map_model_parameters: {len(missing)} unmatched target "
                  f"parameters: {missing[:8]}...")
    gathered = jnp.take(motion, jnp.maximum(jnp.asarray(cols), 0), axis=-1)
    return jnp.where(jnp.asarray(cols) >= 0, gathered, 0.0)


def map_joint_parameters(joint_params, source_character, target_character):
    """Map (..., nJsrc*7) joint parameters onto the target skeleton's joint
    ordering by joint NAME (pymomentum map_joint_parameters)."""
    joint_params = jnp.asarray(joint_params)
    src_names = list(source_character.skeleton.joint_names)
    tgt_names = list(target_character.skeleton.joint_names)
    src_idx = {n: i for i, n in enumerate(src_names)}
    jmap = np.asarray([src_idx.get(n, -1) for n in tgt_names], np.int64)
    cols = (jmap[:, None] * 7 + np.arange(7)[None, :]).reshape(-1)
    valid = np.repeat(jmap >= 0, 7)
    gathered = jnp.take(joint_params,
                        jnp.asarray(np.maximum(cols, 0)), axis=-1)
    return jnp.where(jnp.asarray(valid), gathered, 0.0)


def model_parameters_to_blend_shape_coefficients(character, model_parameters):
    """Extract the blend-shape coefficient slice
    (pymomentum model_parameters_to_blend_shape_coefficients)."""
    if character.blend_shape_param_index is None:
        raise ValueError("character has no blend-shape parameters")
    return jnp.take(jnp.asarray(model_parameters),
                    jnp.asarray(character.blend_shape_param_index), axis=-1)


def model_parameters_to_face_expression_coefficients(character,
                                                     model_parameters):
    if character.face_expression_param_index is None:
        raise ValueError("character has no face-expression parameters")
    return jnp.take(jnp.asarray(model_parameters),
                    jnp.asarray(character.face_expression_param_index),
                    axis=-1)


def model_parameters_to_local_skeleton_state(character, model_parameters):
    """(..., P) → (..., nJ, 8) joint-LOCAL skel states
    (pymomentum model_parameters_to_local_skeleton_state)."""
    jp = character.parameter_transform.apply(model_parameters)
    return fk.local_skel_states(character.skeleton, jp)


def joint_parameters_to_local_skeleton_state(character, joint_parameters):
    return fk.local_skel_states(character.skeleton, joint_parameters)


def local_skeleton_state_to_joint_parameters(character, local_state):
    """Invert local states back to 7-per-joint parameters (constrained Euler
    extraction; pymomentum local_skeleton_state_to_joint_parameters)."""
    from momentum_tpu.character.inverse_fk import (
        joint_parameters_from_local_skel_states,
    )

    return joint_parameters_from_local_skel_states(
        character.skeleton, local_state)


def strip_lower_body_vertices(character, upper_body_root=None):
    """Drop vertices skinned below the waist, skeleton untouched
    (momentum_geometry.cpp:480-524): upper body = the spine root's ancestor
    chain + all its descendants."""
    names = character.skeleton.joint_names
    if upper_body_root is None:
        for cand in ("b_spine0", "c_spine0"):
            if cand in names:
                upper_body_root = names.index(cand)
                break
        else:
            spines = [i for i, n in enumerate(names) if "spine" in n.lower()]
            if not spines:
                raise ValueError("no spine joint found; pass upper_body_root")
            upper_body_root = min(spines)
    parent = np.asarray(character.skeleton.joint_parent)
    nj = len(names)
    keep = np.zeros(nj, bool)
    cur = upper_body_root
    while cur >= 0:
        keep[cur] = True
        cur = parent[cur]
    # descendants of the root
    for j in range(nj):
        cur = j
        while cur >= 0 and not (keep[cur] and cur == upper_body_root):
            cur = parent[cur]
        if cur == upper_body_root:
            keep[j] = True
    return reduce_mesh_to_bones(character, np.nonzero(keep)[0])


def strip_joints(character, joint_names):
    """Remove the named joints and everything parented under them
    (pymomentum.geometry.strip_joints → removeJoints,
    character_utility.cpp:758-840). Unknown names raise."""
    from momentum_tpu.character.utility import remove_joints

    names = character.skeleton.joint_names
    for j in joint_names:
        if isinstance(j, str) and j not in names:
            raise ValueError(f"joint '{j}' not in skeleton")
    return remove_joints(character, joint_names)


def replace_skeleton_hierarchy(source_character, target_character,
                               source_root, target_root):
    """pymomentum.geometry.replace_skeleton_hierarchy — see
    character.utility.replace_skeleton_hierarchy."""
    from momentum_tpu.character.utility import (
        replace_skeleton_hierarchy as _impl)

    return _impl(source_character, target_character, source_root, target_root)


def reduce_mesh_by_faces(character, active_faces):
    """pymomentum.geometry.reduce_mesh_by_faces."""
    from momentum_tpu.character.utility import reduce_mesh_by_faces as _impl

    return _impl(character, active_faces)


def reduce_mesh_by_vertices(character, active_vertices):
    """pymomentum.geometry.reduce_mesh_by_vertices."""
    from momentum_tpu.character.utility import reduce_mesh_by_vertices as _impl

    return _impl(character, active_vertices)


def classify_triangles_by_texture(*args, **kwargs):
    """pymomentum.geometry.classify_triangles_by_texture — see
    character.texture_classification.classify_triangles_by_texture."""
    from momentum_tpu.character.texture_classification import (
        classify_triangles_by_texture as _impl)

    return _impl(*args, **kwargs)


def split_mesh_by_texture_region(*args, **kwargs):
    """pymomentum.geometry.split_mesh_by_texture_region — see
    character.texture_classification.split_mesh_by_texture_region."""
    from momentum_tpu.character.texture_classification import (
        split_mesh_by_texture_region as _impl)

    return _impl(*args, **kwargs)


def load_markers(path, main_subject_only=True, up="y"):
    """pymomentum.geometry.load_markers (geometry_pybind.cpp:970)."""
    from momentum_tpu.io.markers import load_markers as _impl

    return _impl(path, main_subject_only=main_subject_only, up=up)


def load_markers_from_bytes(data, format, main_subject_only=True, up="y"):
    """pymomentum.geometry.load_markers_from_bytes."""
    from momentum_tpu.io.markers import load_markers_from_bytes as _impl

    return _impl(data, format, main_subject_only=main_subject_only, up=up)


def load_motion(gltf_filename):
    """pymomentum.geometry.load_motion: motion-only GLB read →
    (motion, parameter_names, identity, joint_names)."""
    from momentum_tpu.io.gltf import load_motion_glb

    return load_motion_glb(gltf_filename)


def is_fbxsdk_available() -> bool:
    """pymomentum.geometry.is_fbxsdk_available. The reference needs the
    Autodesk SDK for FBX *saving*; this build ships its own binary FBX
    writer (io/fbx_writer.py), so saving is always available."""
    return True
