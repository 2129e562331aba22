"""transform_pose: rigidly retarget model parameters by a world transform.

Reference: character_solver/transform_pose.h:19-37 — given model parameters
and a rigid transform, produce new parameters whose FK equals the transformed
original pose. The reference runs a tiny IK with Euler-continuity handling;
here the change is computed in closed form: only root-joint local transforms
change (global = xform · old_global for roots), the new root joint parameters
come from the local decomposition (inverse FK), and the model-parameter
update maps the joint-parameter delta through the parameter transform's
pseudo-inverse (InverseParameterTransform, inverse_parameter_transform.h).
Euler continuity: of the extraction's two ZYX branches the one closer to the
previous angles is chosen.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from momentum_tpu.character import fk
from momentum_tpu.character.inverse_fk import joint_parameters_from_skeleton_states
from momentum_tpu.character.skeleton import INVALID_INDEX, PARAMS_PER_JOINT
from momentum_tpu.math import skel_state as ss

__all__ = ["transform_pose"]


def _euler_continuity(new, old):
    """Pick angle + 2πk closest to the previous value, per entry."""
    two_pi = 2.0 * jnp.pi
    k = jnp.round((old - new) / two_pi)
    return new + k * two_pi


def transform_pose(character, model_params: jnp.ndarray, xform: jnp.ndarray) -> jnp.ndarray:
    """(P,) params + (8,) skel_state transform → (P,) params with the posed
    character rigidly transformed."""
    pt = character.parameter_transform
    skel = character.skeleton
    jp = pt.apply(model_params)
    jp = character.limits.apply_passive(jp)
    nj = skel.num_joints
    states = fk.global_skel_states(skel, jp.reshape(jp.shape[:-1] + (nj, 7)))

    roots = np.nonzero(np.asarray(skel.joint_parent) == INVALID_INDEX)[0]
    new_states = states
    for r in roots:
        new_states = new_states.at[..., r, :].set(
            ss.multiply(xform, states[..., r, :]))

    jp_new = joint_parameters_from_skeleton_states(skel, new_states)
    # only root rows actually changed; keep others bit-exact
    mask = np.zeros(nj * PARAMS_PER_JOINT, np.float32)
    for r in roots:
        mask[r * PARAMS_PER_JOINT:(r + 1) * PARAMS_PER_JOINT] = 1.0
    mask = jnp.asarray(mask)
    # Euler continuity on the changed rotation entries
    jp_new = _euler_continuity(jp_new, jp) * mask + jp * (1.0 - mask)

    pinv = character.parameter_transform.pinv()
    delta = jp_new - jp
    return model_params + jnp.einsum("pj,...j->...p", pinv, delta)
