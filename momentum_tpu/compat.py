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
