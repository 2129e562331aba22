"""TRS (translation, rotation-matrix, scale) transform utilities.

Mirrors pymomentum/trs.py: a transform is the tuple
``(t[..., 3], r[..., 3, 3], s[..., 1])`` applying ``x → t + r @ (s·x)``.
Rotation matrices invert by transpose and feed ML-style 6D/9D rotation
representations directly, avoiding quaternion↔matrix churn at the edges;
internally momentum's currency stays the 8-float skel_state
(math/skel_state.py) and this module converts both ways
(trs.py:329-370 from/to_skeleton_state).

Composition (trs.py:180-206): (A·B).t = A.t + A.R (A.s · B.t),
(A·B).R = A.R·B.R, (A·B).s = A.s·B.s — identical to the reference
TransformT semantics (math/transform.h:119-129).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from momentum_tpu.math import quaternion as quat

__all__ = [
    "TRSTransform",
    "from_translation",
    "from_rotation_matrix",
    "from_scale",
    "identity",
    "multiply",
    "inverse",
    "transform_points",
    "to_matrix",
    "from_matrix",
    "from_skeleton_state",
    "to_skeleton_state",
    "slerp",
    "blend",
    "rotmat_inverse",
    "rotmat_multiply",
    "rotmat_rotate_vector",
    "rotmat_from_euler_xyz",
    "index_select",
    "where",
]

TRSTransform = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _eye(batch, dtype):
    return jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(batch) + (3, 3))


def from_translation(translation: jnp.ndarray) -> TRSTransform:
    """Pure-translation transform (trs.py:74)."""
    translation = jnp.asarray(translation)
    batch = translation.shape[:-1]
    return (translation, _eye(batch, translation.dtype),
            jnp.ones(batch + (1,), translation.dtype))


def from_rotation_matrix(rotation_matrix: jnp.ndarray) -> TRSTransform:
    """Pure-rotation transform (trs.py:98)."""
    rotation_matrix = jnp.asarray(rotation_matrix)
    batch = rotation_matrix.shape[:-2]
    return (jnp.zeros(batch + (3,), rotation_matrix.dtype), rotation_matrix,
            jnp.ones(batch + (1,), rotation_matrix.dtype))


def from_scale(scale: jnp.ndarray) -> TRSTransform:
    """Pure uniform-scale transform (trs.py:120)."""
    scale = jnp.asarray(scale)
    batch = scale.shape[:-1]
    return (jnp.zeros(batch + (3,), scale.dtype), _eye(batch, scale.dtype),
            scale)


def identity(batch_shape=(), dtype=jnp.float32) -> TRSTransform:
    """Identity transform with the given leading batch shape (trs.py:144)."""
    batch = tuple(batch_shape)
    return (jnp.zeros(batch + (3,), dtype), _eye(batch, dtype),
            jnp.ones(batch + (1,), dtype))


def multiply(trs1: TRSTransform, trs2: TRSTransform) -> TRSTransform:
    """Compose two transforms: result applies trs2 first, then trs1
    (trs.py:180-206)."""
    t1, r1, s1 = trs1
    t2, r2, s2 = trs2
    return (t1 + rotmat_rotate_vector(r1, s1 * t2),
            rotmat_multiply(r1, r2), s1 * s2)


def inverse(trs: TRSTransform) -> TRSTransform:
    """Inverse transform; the rotation inverts by transpose (trs.py:209-233)."""
    t, r, s = trs
    r_inv = jnp.swapaxes(r, -2, -1)
    s_inv = 1.0 / s
    t_inv = -rotmat_rotate_vector(r_inv, s_inv * t)
    return t_inv, r_inv, s_inv


def transform_points(trs: TRSTransform, points: jnp.ndarray) -> jnp.ndarray:
    """Apply ``t + r @ (s·points)`` (trs.py:235-256)."""
    points = jnp.asarray(points)
    if points.shape[-1] != 3:
        raise ValueError("points must have last dimension 3")
    t, r, s = trs
    return t + rotmat_rotate_vector(r, s * points)


def to_matrix(trs: TRSTransform) -> jnp.ndarray:
    """(..., 4, 4) homogeneous matrices (trs.py:257-283)."""
    t, r, s = trs
    linear = r * s[..., None, :]
    affine = jnp.concatenate([linear, t[..., :, None]], axis=-1)
    last = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], t.dtype), t.shape[:-1] + (1, 4))
    return jnp.concatenate([affine, last], axis=-2)


def from_matrix(matrices: jnp.ndarray) -> TRSTransform:
    """Decompose (..., 4, 4) uniform-scale affine matrices via SVD:
    scale = leading singular value, R = U·Vᵀ (trs.py:285-327)."""
    matrices = jnp.asarray(matrices)
    if matrices.shape[-2:] != (4, 4):
        raise ValueError("expected (..., 4, 4) matrices")
    linear = matrices[..., :3, :3]
    translation = matrices[..., :3, 3]
    u, sv, vt = jnp.linalg.svd(linear)
    scale = sv[..., :1]
    rotation = u @ vt
    return translation, rotation, scale


def from_skeleton_state(skeleton_state: jnp.ndarray) -> TRSTransform:
    """8-float (tx,ty,tz, qx,qy,qz,qw, s) skel_state → TRS (trs.py:329-351)."""
    skeleton_state = jnp.asarray(skeleton_state)
    if skeleton_state.shape[-1] != 8:
        raise ValueError("expected skeleton state with last dimension 8")
    return (skeleton_state[..., :3],
            quat.to_rotation_matrix(skeleton_state[..., 3:7]),
            skeleton_state[..., 7:])


def to_skeleton_state(trs: TRSTransform) -> jnp.ndarray:
    """TRS → 8-float skel_state (trs.py:353-370)."""
    t, r, s = trs
    return jnp.concatenate([t, quat.from_rotation_matrix(r), s], axis=-1)


def slerp(trs0: TRSTransform, trs1: TRSTransform, t) -> TRSTransform:
    """Interpolate: lerp translation/scale, slerp rotation (trs.py:373-400)."""
    t = jnp.asarray(t)
    t0, r0, s0 = trs0
    t1, r1, s1 = trs1
    w1 = t[..., None]
    w0 = 1.0 - w1
    q0 = quat.from_rotation_matrix(r0)
    q1 = quat.from_rotation_matrix(r1)
    r_interp = quat.to_rotation_matrix(quat.slerp(q0, q1, t))
    return w0 * t0 + w1 * t1, r_interp, w0 * s0 + w1 * s1


def blend(trs_transforms: Sequence[TRSTransform],
          weights: Optional[jnp.ndarray] = None) -> TRSTransform:
    """Weighted blend: linear for translation/scale, quaternion (eigen)
    average for rotation (trs.py:402-455)."""
    if len(trs_transforms) == 0:
        raise ValueError("cannot blend an empty list of transforms")
    if len(trs_transforms) == 1:
        return trs_transforms[0]
    ts = jnp.stack([x[0] for x in trs_transforms], axis=-2)  # (..., N, 3)
    rs = jnp.stack([x[1] for x in trs_transforms], axis=-3)  # (..., N, 3, 3)
    ss = jnp.stack([x[2] for x in trs_transforms], axis=-2)  # (..., N, 1)
    n = len(trs_transforms)
    if weights is None:
        weights = jnp.full((n,), 1.0 / n, ts.dtype)
    weights = jnp.asarray(weights)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    t_blend = jnp.sum(weights[..., None] * ts, axis=-2)
    s_blend = jnp.sum(weights[..., None] * ss, axis=-2)
    qs = quat.from_rotation_matrix(rs)  # (..., N, 4)
    r_blend = quat.to_rotation_matrix(quat.blend(qs, weights))
    return t_blend, r_blend, s_blend


def rotmat_inverse(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation-matrix inverse = transpose (trs.py:458-470)."""
    return jnp.swapaxes(jnp.asarray(r), -2, -1)


def rotmat_multiply(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Batched rotation-matrix product (trs.py:472-484)."""
    return jnp.asarray(r1) @ jnp.asarray(r2)


def rotmat_rotate_vector(r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) vectors by (..., 3, 3) matrices (trs.py:486-498)."""
    return jnp.einsum("...ij,...j->...i", jnp.asarray(r), jnp.asarray(v))


def rotmat_from_euler_xyz(euler: jnp.ndarray) -> jnp.ndarray:
    """Joint-convention Euler (rx, ry, rz) → matrix Rz·Ry·Rx
    (trs.py:574-609: "applied first around X, then Y, then Z")."""
    from momentum_tpu.math.euler import euler_zyx_to_matrix

    return euler_zyx_to_matrix(jnp.asarray(euler))


def index_select(trs: TRSTransform, dim: int, indices) -> TRSTransform:
    """Select along a leading batch dimension (trs.py:500-537)."""
    t, r, s = trs
    indices = jnp.asarray(indices)
    if dim < 0:
        raise ValueError("dim must index a leading batch dimension")
    return (jnp.take(t, indices, axis=dim), jnp.take(r, indices, axis=dim),
            jnp.take(s, indices, axis=dim))


def where(condition: jnp.ndarray, trs1: TRSTransform,
          trs2: TRSTransform) -> TRSTransform:
    """Elementwise select between two transforms; `condition` broadcasts
    against the batch shape (trs.py:539-572)."""
    c = jnp.asarray(condition)
    t1, r1, s1 = trs1
    t2, r2, s2 = trs2
    return (jnp.where(c[..., None], t1, t2),
            jnp.where(c[..., None, None], r1, r2),
            jnp.where(c[..., None], s1, s2))
