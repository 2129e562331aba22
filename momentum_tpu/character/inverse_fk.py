"""Inverse forward kinematics: skeleton states → joint parameters.

Reference: momentum/character/skeleton_state.h:499-566
(`skeletonStateToJointParameters`): per joint, express the global transform in
the parent frame and invert the local composition
    local.t = offset + (tx,ty,tz)
    local.R = Rpre · Rz(rz)·Ry(ry)·Rx(rx)
    local.s = exp2(scale)
so
    t_params = local.t − offset
    (rz,ry,rx) = euler_zyx(Rpre⁻¹ · local.R)
    scale = log2(local.s)

Gimbal caveats match the reference (skeleton_state.h:509-511): at ry = ±π/2
the decomposition is not unique; the gimbal branch pins rz = 0.

`model_parameters_from_joint_parameters` maps back through the parameter
transform's pseudo-inverse (inverse_parameter_transform.h).
"""

from __future__ import annotations

import jax.numpy as jnp

from momentum_tpu.character.fk import parent_global_states
from momentum_tpu.character.skeleton import Skeleton
from momentum_tpu.math import euler, quaternion as quat, skel_state as ss

__all__ = ["joint_parameters_from_skeleton_states",
           "joint_parameters_from_local_skel_states", "local_from_global"]


def local_from_global(skeleton: Skeleton, global_states: jnp.ndarray) -> jnp.ndarray:
    """(..., nJ, 8) global → (..., nJ, 8) local states."""
    parent_g = parent_global_states(skeleton, global_states)
    return ss.multiply(ss.inverse(parent_g), global_states)


def joint_parameters_from_skeleton_states(
    skeleton: Skeleton, global_states: jnp.ndarray
) -> jnp.ndarray:
    """(..., nJ, 8) global states → (..., nJ*7) joint parameters (inverse FK)."""
    local = local_from_global(skeleton, global_states)
    return joint_parameters_from_local_skel_states(skeleton, local)


def joint_parameters_from_local_skel_states(
    skeleton: Skeleton, local: jnp.ndarray
) -> jnp.ndarray:
    """(..., nJ, 8) joint-LOCAL states → (..., nJ*7) joint parameters
    (constrained ZYX Euler extraction against the pre-rotation)."""
    t, q, s = ss.split(local)
    t_params = t - skeleton.translation_offset
    q_euler = quat.multiply(quat.conjugate(skeleton.pre_rotation), q)
    zyx = euler.rotation_matrix_to_euler_zyx(quat.to_rotation_matrix(q_euler))
    rx, ry, rz = zyx[..., 2], zyx[..., 1], zyx[..., 0]
    scale = jnp.log2(jnp.maximum(s[..., 0], 1e-20))
    jp = jnp.concatenate(
        [t_params, rx[..., None], ry[..., None], rz[..., None], scale[..., None]],
        axis=-1,
    )
    return jp.reshape(jp.shape[:-2] + (-1,))
