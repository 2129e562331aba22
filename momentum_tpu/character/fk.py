"""Forward kinematics: joint parameters → per-joint global skeleton states.

Semantics exactly follow the reference (momentum/character/joint_state.cpp:22-66,
joint_state.h:17-48):

    local.t = translationOffset + params[0:3]          (acts in parent frame)
    local.R = Rpre · Rz(rz) · Ry(ry) · Rx(rx)          (params[3:6] = rx,ry,rz)
    local.s = exp2(params[6])                          (log2-scale param)
    global  = parent_global * local

Two evaluation strategies, both jittable and vmappable:

* `global_skel_states_scan` — `lax.scan` over joints in topological order,
  serial like the reference's SkeletonStateT::set (skeleton_state.cpp:87-115)
  and the Triton in-kernel joint loop (pymomentum/backend/triton_fk.py:182-207).
  Best when the batch is huge (each scan step is a wide batched compose).

* `global_skel_states_lifted` — binary-lifting prefix product (pointer
  doubling, log2(depth) gather+compose rounds), the TPU analog of the torch
  backend's prefix multiplication (pymomentum/backend/skel_state_backend.py:90-165).
  Best default: no serial chain, everything is dense vectorized work.

Derivative axes (what the reference stores as JointStateT.translationAxis /
rotationAxis for Jacobian assembly) are *derived* from the global states:

    translationAxis(j) = s_par(j) · R_par(j)             [3x3, identity at root]
    rotationAxis(j) = [ R_g(j)·ex,  R_g(j)·Rx(-rx)·ey,  R_g(j)·Rx(-rx)·Ry(-ry)·ez ]

using R_g = R_par·Rpre·Rz·Ry·Rx and the invariance R_a(θ)·e_a = e_a; this
avoids materializing the partially-accumulated local rotations the reference
keeps during its serial FK (joint_state.cpp:50-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from momentum_tpu.character.skeleton import PARAMS_PER_JOINT, Skeleton
from momentum_tpu.math import quaternion as quat, skel_state as ss

__all__ = [
    "local_skel_states",
    "global_skel_states",
    "global_skel_states_scan",
    "global_skel_states_lifted",
    "joint_axes",
    "parent_global_states",
]

_LN2 = 0.6931471805599453


def local_skel_states(skeleton: Skeleton, joint_params: jnp.ndarray) -> jnp.ndarray:
    """(..., nJ*7) or (..., nJ, 7) joint params → (..., nJ, 8) local states."""
    jp = joint_params.reshape(joint_params.shape[:-1] + (-1, PARAMS_PER_JOINT)) \
        if joint_params.shape[-1] != PARAMS_PER_JOINT else joint_params
    t = skeleton.translation_offset + jp[..., 0:3]
    q_euler = quat.euler_to_quaternion(jp[..., 3:6], order="ZYX")
    q = quat.multiply(skeleton.pre_rotation, q_euler)
    s = jnp.exp2(jp[..., 6:7])
    return ss.join(t, q, s)


def global_skel_states_scan(skeleton: Skeleton, local_states: jnp.ndarray) -> jnp.ndarray:
    """Serial scan over topologically-ordered joints. Supports leading batch dims."""
    n = skeleton.num_joints
    parent = skeleton.joint_parent  # (nJ,) int32, -1 root
    batch = local_states.shape[:-2]
    ident = ss.identity(batch, dtype=local_states.dtype)

    def step(carry, inputs):
        # carry: (..., nJ, 8) global states filled so far (others identity)
        j, local_j = inputs
        p = parent[j]
        parent_state = jnp.where(p < 0, ident, carry[..., jnp.maximum(p, 0), :])
        g = ss.multiply(parent_state, local_j)
        carry = carry.at[..., j, :].set(g)
        return carry, None

    init = jnp.broadcast_to(ident[..., None, :], batch + (n, 8))
    idx = jnp.arange(n)
    locals_joint_major = jnp.moveaxis(local_states, -2, 0)  # (nJ, ..., 8)
    out, _ = jax.lax.scan(step, init, (idx, locals_joint_major))
    return out


def global_skel_states_lifted(skeleton: Skeleton, local_states: jnp.ndarray) -> jnp.ndarray:
    """Binary-lifting prefix product: log2(depth) rounds of parent-select +
    compose.

    On TPU the parent selection runs as a one-hot permutation MATMUL instead
    of a gather — measured 1.6× faster (gathers are lane-shuffles on the VPU;
    the (nJ+1)² one-hot matmul rides the MXU) and bit-exact. CPU keeps the
    gather."""
    import numpy as np

    levels = skeleton.prefix_levels()  # host-side static schedule, length nJ+1 arrays
    batch = local_states.shape[:-2]
    ident = ss.identity(batch + (1,), dtype=local_states.dtype)
    g = jnp.concatenate([local_states, ident], axis=-2)  # (..., nJ+1, 8)
    use_matmul = jax.default_backend() == "tpu"
    n1 = skeleton.num_joints + 1
    for p in levels:
        if use_matmul:
            perm = jnp.asarray(np.eye(n1, dtype=np.float32)[np.asarray(p)])
            parent = jnp.einsum("ij,...jd->...id", perm, g)
        else:
            parent = jnp.take(g, jnp.asarray(p), axis=-2)
        g = ss.multiply(parent, g)
    return g[..., :-1, :]


def global_skel_states(
    skeleton: Skeleton, joint_params: jnp.ndarray, method: str = "lifted"
) -> jnp.ndarray:
    """(..., nJ*7) joint params → (..., nJ, 8) global skeleton states.

    Batched inputs on TPU route through the fused Pallas kernel
    (ops/fk_pallas.py: the whole binary-lifting ladder in VMEM) with
    XLA-path tangents via custom_jvp; everything else uses the XLA
    implementations."""
    local = local_skel_states(skeleton, joint_params)
    if method == "scan":
        return global_skel_states_scan(skeleton, local)
    if (local.ndim == 3 and local.shape[0] >= 128
            and jax.default_backend() == "tpu"):
        from momentum_tpu.ops.fk_pallas import make_differentiable_fk

        return make_differentiable_fk(skeleton)(local)
    return global_skel_states_lifted(skeleton, local)


def parent_global_states(skeleton: Skeleton, global_states: jnp.ndarray) -> jnp.ndarray:
    """Gather each joint's parent global state (identity for roots)."""
    parent = skeleton.joint_parent
    ident = ss.identity(global_states.shape[:-2] + (1,), dtype=global_states.dtype)
    padded = jnp.concatenate([global_states, ident], axis=-2)
    idx = jnp.where(parent < 0, skeleton.num_joints, parent)
    return jnp.take(padded, idx, axis=-2)


def joint_axes(
    skeleton: Skeleton, joint_params: jnp.ndarray, global_states: jnp.ndarray
):
    """Derivative axes for analytic Jacobians.

    Returns (translation_axis, rotation_axis), each (..., nJ, 3, 3) with
    COLUMN i = world-space axis for DoF i — matching JointStateT's
    translationAxis / rotationAxis layout (joint_state.h:62-70):

      translation_axis[..., :, i] = i-th column of s_par·R_par
      rotation_axis[..., :, i]    = world rotation axis for rx,ry,rz
    """
    jp = joint_params.reshape(joint_params.shape[:-1] + (-1, PARAMS_PER_JOINT)) \
        if joint_params.shape[-1] != PARAMS_PER_JOINT else joint_params
    parent_g = parent_global_states(skeleton, global_states)
    _, q_par, s_par = ss.split(parent_g)
    trans_axis = quat.to_rotation_matrix(q_par) * s_par[..., None]

    _, q_g, _ = ss.split(global_states)
    rx = jp[..., 3]
    ry = jp[..., 4]
    # R_g·ex
    ax = quat.rotate_vector(q_g, jnp.broadcast_to(jnp.asarray([1.0, 0, 0], q_g.dtype), q_g.shape[:-1] + (3,)))
    # R_g·Rx(-rx)·ey = R_g·(0, cos rx, -sin rx)
    cy = jnp.stack([jnp.zeros_like(rx), jnp.cos(rx), -jnp.sin(rx)], axis=-1)
    ay = quat.rotate_vector(q_g, cy)
    # R_g·Rx(-rx)·Ry(-ry)·ez ; Ry(-ry)·ez = (-sin ry, 0, cos ry); then Rx(-rx)·that
    v = jnp.stack([-jnp.sin(ry), jnp.sin(rx) * jnp.cos(ry), jnp.cos(rx) * jnp.cos(ry)], axis=-1)
    az = quat.rotate_vector(q_g, v)
    rot_axis = jnp.stack([ax, ay, az], axis=-1)  # columns = axes
    return trans_axis, rot_axis
