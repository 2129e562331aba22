"""Analytic Jacobian assembly — the TPU-vectorized SkeletonDerivative.

Reference: character_solver/skeleton_derivative.{h,cpp}:24-445 — per
constraint, walk the joint chain from the constraint's joint to the root and
accumulate per-DOF contributions:
    translation DOF i :  d = translationAxis.col(i)
    rotation DOF i    :  d = rotationAxis.col(i) × (p − jointPos)
    scale             :  d = (p − jointPos) · ln2
then scatter through the parameter transform.

The chain walk becomes a DENSE masked tensor product: the static
ancestor-or-self matrix anc[a, j] (skeleton.ancestor_matrix) selects which
joints contribute to which constraints, every (constraint × joint × DOF)
contribution is computed at once on the VPU, and the parameter-transform
scatter is one MXU matmul. Compared to jacfwd (which pushes P tangents
through the whole FK), this touches O(C·nJ) memory instead of O(P·nJ) per
batch element — the difference between HBM-bound and compute-bound at
production batch sizes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from momentum_tpu.character import fk

__all__ = ["JacobianContext", "make_jacobian_context", "point_jacobian", "vector_jacobian"]

_LN2 = 0.6931471805599453


class JacobianContext:
    """Per-evaluation derivative state: joint axes + static ancestor mask."""

    def __init__(self, anc_mask, joint_pos, trans_axis, rot_axis):
        self.anc_mask = anc_mask  # (nJ, nJ) float 0/1, [a, j] = a ancestor-or-self of j
        self.joint_pos = joint_pos  # (nJ, 3)
        self.trans_axis = trans_axis  # (nJ, 3, 3) columns = axes
        self.rot_axis = rot_axis  # (nJ, 3, 3)


def make_jacobian_context(character, ctx) -> JacobianContext:
    trans_axis, rot_axis = fk.joint_axes(
        character.skeleton, ctx.joint_params, ctx.skel_states)
    anc = jnp.asarray(character.skeleton.ancestor_matrix().astype(np.float32))
    return JacobianContext(anc, ctx.skel_states[..., :3], trans_axis, rot_axis)


def point_jacobian(jc: JacobianContext, points: jnp.ndarray, parents: jnp.ndarray):
    """d(world point)/d(joint parameters).

    points (..., C, 3) world positions rigidly attached to `parents` (C,).
    Returns (..., C, 3, nJ*7). Supports leading batch dims on both the
    points and the JacobianContext arrays (batch-native solve path).
    """
    mask = jnp.take(jc.anc_mask, parents, axis=1).T  # (C, nJ)
    diff = points[..., :, None, :] - jc.joint_pos[..., None, :, :]  # (..., C, nJ, 3)
    # translation: (..., C, nJ, 3out, 3dof)
    jt = jnp.broadcast_to(jc.trans_axis[..., None, :, :, :], diff.shape + (3,))
    # rotation: cross(axis_k, diff) for each of the 3 axes
    axes = jnp.swapaxes(jc.rot_axis, -1, -2)  # (..., nJ, 3dof, 3)
    jr = jnp.cross(axes[..., None, :, :, :], diff[..., :, :, None, :])
    jr = jnp.swapaxes(jr, -1, -2)  # (..., C, nJ, 3out, 3dof)
    js = (diff * _LN2)[..., None]  # (..., C, nJ, 3out, 1)
    j = jnp.concatenate([jt, jr, js], axis=-1)  # (..., C, nJ, 3, 7)
    j = j * mask[:, :, None, None]
    c = points.shape[-2]
    j = jnp.swapaxes(j, -3, -2)  # (..., C, 3, nJ, 7)
    return j.reshape(j.shape[:-2] + (-1,))


def vector_jacobian(jc: JacobianContext, vectors: jnp.ndarray, parents: jnp.ndarray):
    """d(world direction)/d(joint parameters): only rotation DOFs contribute.
    vectors (..., C, 3) world-space; returns (..., C, 3, nJ*7)."""
    mask = jnp.take(jc.anc_mask, parents, axis=1).T
    axes = jnp.swapaxes(jc.rot_axis, -1, -2)  # (..., nJ, 3dof, 3)
    jr = jnp.cross(axes[..., None, :, :, :], vectors[..., :, None, None, :])
    jr = jnp.swapaxes(jr, -1, -2)  # (..., C, nJ, 3out, 3dof)
    zeros3 = jnp.zeros(jr.shape[:-1] + (3,), jr.dtype)
    zeros1 = jnp.zeros(jr.shape[:-1] + (1,), jr.dtype)
    j = jnp.concatenate([zeros3, jr, zeros1], axis=-1)  # (..., C, nJ, 3, 7)
    j = j * mask[:, :, None, None]
    j = jnp.swapaxes(j, -3, -2)  # (..., C, 3, nJ, 7)
    return j.reshape(j.shape[:-2] + (-1,))


def fused_point_jacobian_model_merged(jc: JacobianContext, points, parents,
                                      pt_mat, scale=None):
    """fused_point_jacobian_model with the translation / scale-position /
    rotation-position factors MERGED by linearity into one per-joint factor
    before the mask contraction:

        J = m@(a_t − ln2·w_s − q) + (m@d_r) × p_c + ln2·p_c ⊗ m_pt6

    → TWO J-sized mask matmuls instead of four (the elementwise merge fuses
    into the dot's operand read), halving both the contraction flops and the
    J-sized intermediate traffic. Mathematically identical reassociation.
    """
    nj = jc.anc_mask.shape[0]
    p_dim = pt_mat.shape[1]
    ptj = pt_mat.reshape(nj, 7, p_dim)
    mask = jnp.take(jc.anc_mask, parents, axis=1).T  # (C, nJ)
    if scale is not None:
        mask = mask * scale[..., :, None]
    pt6 = ptj[:, 6]
    m_pt6 = mask @ pt6  # (..., C, P)

    a_t = jnp.einsum("...nij,njp->...nip", jc.trans_axis, ptj[:, :3])
    w_s = jnp.einsum("...nv,np->...nvp", jc.joint_pos, pt6)
    d_r = jnp.einsum("...nwk,nkp->...nwp", jc.rot_axis, ptj[:, 3:6])
    q = jnp.cross(d_r, jc.joint_pos[..., :, :, None], axisa=-2, axisb=-2,
                  axisc=-2)
    g1 = a_t - _LN2 * w_s - q
    t1 = jnp.einsum("...cn,...nvp->...cvp", mask, g1)
    h1 = jnp.einsum("...cn,...nwp->...cwp", mask, d_r)
    term_r = jnp.cross(h1, points[..., :, :, None], axisa=-2, axisb=-2,
                       axisc=-2)
    return (t1 + term_r
            + _LN2 * points[..., :, :, None] * m_pt6[..., :, None, :])


def fused_point_jacobian_model_stacked(jc: JacobianContext, points, parents,
                                       pt_mat, scale=None):
    """fused_point_jacobian_model with the four per-joint factors STACKED so
    the constraint-side chain rule is ONE mask matmul + one elementwise
    combine (round-5 stage budget: the jacobian stage ran at ~4× its
    HBM bound, dominated by four separate J-sized mask contractions whose
    outputs could not fuse; stacking contracts K=nJ once at N=12·P and the
    ε/point combination happens in a single fused pointwise pass).

    Factor slots k (each (..., nJ, 3, P)):
      0: a_t  = transAxis·PT_t    (translation)
      1: w_s  = t_j ⊗ pt6         (scale, joint-position part)
      2: d_r  = rotAxis·PT_r      (rotation, crossed with p_c downstream)
      3: q    = d_r × t_j         (rotation, joint-position part)
    J = m@a_t + ln2·(p_c ⊗ m_pt6 − m@w_s) + (m@d_r) × p_c − m@q.
    """
    nj = jc.anc_mask.shape[0]
    p_dim = pt_mat.shape[1]
    ptj = pt_mat.reshape(nj, 7, p_dim)
    mask = jnp.take(jc.anc_mask, parents, axis=1).T  # (C, nJ)
    if scale is not None:
        mask = mask * scale[..., :, None]
    pt6 = ptj[:, 6]
    m_pt6 = mask @ pt6  # (..., C, P)

    a_t = jnp.einsum("...nij,njp->...nip", jc.trans_axis, ptj[:, :3])
    w_s = jnp.einsum("...nv,np->...nvp", jc.joint_pos, pt6)
    d_r = jnp.einsum("...nwk,nkp->...nwp", jc.rot_axis, ptj[:, 3:6])
    q = jnp.cross(d_r, jc.joint_pos[..., :, :, None], axisa=-2, axisb=-2,
                  axisc=-2)
    f_cat = jnp.concatenate([a_t, w_s, d_r, q], axis=-2)  # (..., nJ, 12, P)
    terms = jnp.einsum("...cn,...nkp->...ckp", mask, f_cat)
    t_t = terms[..., 0:3, :]
    t_ws = terms[..., 3:6, :]
    h1 = terms[..., 6:9, :]
    h2 = terms[..., 9:12, :]
    term_s = _LN2 * (points[..., :, :, None] * m_pt6[..., :, None, :] - t_ws)
    term_r = jnp.cross(h1, points[..., :, :, None], axisa=-2, axisb=-2,
                       axisc=-2) - h2
    return t_t + term_s + term_r


def fused_point_jacobian_model(jc: JacobianContext, points, parents, pt_mat,
                               scale=None):
    """d(world point)/d(MODEL parameters) without materializing the
    (..., C, 3, nJ·7) joint-space Jacobian.

    The chain rule J_model = J_jp · PT is reassociated so every contraction
    over joints/DOFs is an MXU matmul on small precontracted factors:

      translation: Σ_j transAxis(n,·,j)·PT[n,j,·]  → A(n,3,P), then mask·A
      scale:       (mask·diff·ln2) × PT[n,6,·]
      rotation:    ε_{vwu} Σ_n [mask·diff](c,n,u) · [rotAxis·PT_rot](n,w,P)

    Memory traffic drops ~5× vs point_jacobian + dense PT matmul (the
    dominant cost of a solver iteration at production batch sizes).

    points (..., C, 3); pt_mat (nJ*7, P); optional scale (..., C) row scaling.
    Returns (..., C, 3, P).
    """
    nj = jc.anc_mask.shape[0]
    p_dim = pt_mat.shape[1]
    ptj = pt_mat.reshape(nj, 7, p_dim)
    mask = jnp.take(jc.anc_mask, parents, axis=1).T  # (C, nJ)
    if scale is not None:
        mask = mask * scale[..., :, None]  # fold row scaling into the mask
    diff = points[..., :, None, :] - jc.joint_pos[..., None, :, :]  # (..., C, nJ, 3)

    # translation
    a_t = jnp.einsum("...nij,njp->...nip", jc.trans_axis, ptj[:, :3])
    term_t = jnp.einsum("...cn,...nip->...cip", mask, a_t)

    # The rotation/scale terms depend on diff = p_c − t_j. Splitting them
    # (diff separability) keeps every joint contraction a mask matmul and the
    # constraint-point factor a per-constraint elementwise op — nothing of
    # size (..., C, nJ, ...) or (..., C, 3, 3, P) is ever materialized.

    # scale (log2 parameterization): ln2·Σ_j m·(p_c − t_j)·pt6_j
    pt6 = ptj[:, 6]  # (nJ, P)
    m_pt6 = mask @ pt6  # (..., C, P)
    w_s = jnp.einsum("...nv,np->...nvp", jc.joint_pos, pt6)  # (.., nJ, 3, P)
    term_s = _LN2 * (points[..., :, :, None] * m_pt6[..., :, None, :]
                     - jnp.einsum("...cn,...nvp->...cvp", mask, w_s))

    # rotation: Σ_j m·((axis_j × p_c) − (axis_j × t_j))·pt_rot
    #         = (Σ_j m·axis·pt) × p_c  −  Σ_j m·(axis_j × t_j)·pt
    d_r = jnp.einsum("...nwk,nkp->...nwp", jc.rot_axis, ptj[:, 3:6])
    h1 = jnp.einsum("...cn,...nwp->...cwp", mask, d_r)  # (..., C, 3, P)
    q = jnp.cross(d_r, jc.joint_pos[..., :, :, None], axisa=-2, axisb=-2,
                  axisc=-2)  # (..., nJ, 3, P): axis_j × t_j per column
    h2 = jnp.einsum("...cn,...nvp->...cvp", mask, q)
    term_r = jnp.cross(h1, points[..., :, :, None], axisa=-2, axisb=-2,
                       axisc=-2) - h2
    return term_t + term_s + term_r


def fused_vector_jacobian_model(jc: JacobianContext, vectors, parents, pt_mat,
                                scale=None):
    """d(world direction)/d(MODEL parameters), fused like
    fused_point_jacobian_model: only rotation DOFs contribute and the
    derivative axis_j × v is reassociated as (Σ_j m·axis·PT) × v — one mask
    matmul plus a per-constraint cross product, no (C, nJ) temporaries.

    vectors (..., C, 3); returns (..., C, 3, P)."""
    nj = jc.anc_mask.shape[0]
    p_dim = pt_mat.shape[1]
    ptj = pt_mat.reshape(nj, 7, p_dim)
    mask = jnp.take(jc.anc_mask, parents, axis=1).T
    if scale is not None:
        mask = mask * scale[..., :, None]
    d_r = jnp.einsum("...nwk,nkp->...nwp", jc.rot_axis, ptj[:, 3:6])
    h1 = jnp.einsum("...cn,...nwp->...cwp", mask, d_r)  # (..., C, 3, P)
    return jnp.cross(h1, vectors[..., :, :, None], axisa=-2, axisb=-2,
                     axisc=-2)


def fused_rotation_factor(jc: JacobianContext, parents, pt_mat, scale=None):
    """The precontracted rotation factor h1 = Σ_j mask·(rotAxis_j·PT_rot)
    of shape (..., C, 3, P) — the quantity every world-direction derivative
    is a cross product of (d(R·v)/dθ_model = h1 × v). Exposed so structured
    normal-equation contributions (orientation) can contract h1 directly
    without materializing per-row Jacobians."""
    nj = jc.anc_mask.shape[0]
    p_dim = pt_mat.shape[1]
    ptj = pt_mat.reshape(nj, 7, p_dim)
    mask = jnp.take(jc.anc_mask, parents, axis=1).T
    if scale is not None:
        mask = mask * scale[..., :, None]
    d_r = jnp.einsum("...nwk,nkp->...nwp", jc.rot_axis, ptj[:, 3:6])
    return jnp.einsum("...cn,...nwp->...cwp", mask, d_r)


def skinned_point_jacobian(jc: JacobianContext, character, ctx, vertex_index):
    """d(posed LBS vertex)/d(joint parameters) — the vertex variant of the
    derivative walk (skeleton_derivative.cpp vertex paths): the posed vertex
    is Σ_k w_k·M_k(θ)·x_rest, so its Jacobian is the skin-weighted sum of the
    rigid point Jacobians of each influence's own transformed point M_k·x
    (NOT the blended point). ≤8 influences ⇒ 8 masked dense products.

    Returns (..., C, 3, nJ·7)."""
    from momentum_tpu.math import skel_state as ss

    char = character.with_inverse_bind_pose()
    skin = char.skin_weights
    idx = jnp.take(skin.index, vertex_index, axis=0)  # (C, K)
    w = jnp.take(skin.weight, vertex_index, axis=0)  # (C, K)
    rest = jnp.take(ctx.rest_vertices, vertex_index, axis=-2)  # (..., C, 3)
    j = None
    for k in range(idx.shape[1]):
        pk = idx[:, k]
        st = jnp.take(ctx.skel_states, pk, axis=-2)
        mk = ss.multiply(st, jnp.take(char.inverse_bind_pose, pk, axis=0))
        ptk = ss.transform_points(mk, rest)
        jk = point_jacobian(jc, ptk, pk)
        contrib = w[:, k][..., None, None] * jk
        j = contrib if j is None else j + contrib
    return j


def skinned_vector_jacobian(jc: JacobianContext, character, ctx, vertex_index,
                            vectors):
    """Approximate d(posed vertex direction)/d(joint params): the direction
    rotates with the blend of its skinning transforms, so each influence
    contributes w_k·(rotAxis × v) masked by its own ancestor chain — the
    reference's normal-rotation correction (skeleton_derivative.h:233-235:
    the combined gradient+normal walk treats the vertex normal as rigidly
    rotating with the skinning frames, not re-derived from face areas).

    vectors (..., C, 3) current posed directions; returns (..., C, 3, nJ·7)."""
    char = character.with_inverse_bind_pose()
    skin = char.skin_weights
    idx = jnp.take(skin.index, vertex_index, axis=0)  # (C, K)
    w = jnp.take(skin.weight, vertex_index, axis=0)  # (C, K)
    j = None
    for k in range(idx.shape[1]):
        jk = vector_jacobian(jc, vectors, idx[:, k])
        contrib = w[:, k][..., None, None] * jk
        j = contrib if j is None else j + contrib
    return j


def skinned_blend_jacobian(character, ctx, vertex_index, basis=None):
    """d(posed vertex)/d(shape coefficients): the skinning linear map applied
    to each basis delta — the blend-shape columns of the vertex derivative
    walk. `basis` defaults to the body blendshape; pass
    character.face_expression_blend_shape for the expression columns.
    Returns (..., C, 3, nB) or None when the rig has no such basis."""
    if basis is None:
        basis = character.blend_shape
        if basis is None or not character.blend_shape_param_index:
            return None
    from momentum_tpu.math import skel_state as ss

    char = character.with_inverse_bind_pose()
    skin = char.skin_weights
    idx = jnp.take(skin.index, vertex_index, axis=0)
    w = jnp.take(skin.weight, vertex_index, axis=0)
    deltas = jnp.take(basis.shape_vectors, vertex_index, axis=1)  # (nB, C, 3)
    out = None
    for k in range(idx.shape[1]):
        pk = idx[:, k]
        st = jnp.take(ctx.skel_states, pk, axis=-2)
        mk = ss.multiply(st, jnp.take(char.inverse_bind_pose, pk, axis=0))
        _, q, s = ss.split(mk)
        from momentum_tpu.math import quaternion as quat

        rot = quat.to_rotation_matrix(q) * s[..., None]  # (..., C, 3, 3)
        term = w[:, k][..., None, None] * jnp.einsum(
            "...cij,bcj->...cib", rot, deltas)
        out = term if out is None else out + term
    return out
