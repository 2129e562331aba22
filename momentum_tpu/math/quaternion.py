"""Batched quaternion algebra in JAX.

Convention: quaternions are arrays whose last dimension has size 4, ordered
``(x, y, z, w)`` with identity ``(0, 0, 0, 1)`` — the same component order as
the reference's Python API (pymomentum/quaternion.py:22-27). All functions
broadcast over leading batch dimensions and are jit/vmap/grad-safe (no Python
control flow on traced values).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "identity",
    "check",
    "split",
    "multiply",
    "conjugate",
    "inverse",
    "normalize",
    "rotate_vector",
    "from_axis_angle",
    "to_axis_angle",
    "from_rotation_matrix",
    "to_rotation_matrix",
    "euler_to_quaternion",
    "slerp",
    "blend",
    "blend_nlerp",
    "from_two_vectors",
    "multiply_assume_normalized",
    "rotate_vector_assume_normalized",
    "to_rotation_matrix_assume_normalized",
    "euler_xyz_to_quaternion",
    "euler_zyx_to_quaternion",
    "quaternion_to_xyz_euler",
]

_EPS = 1e-12


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion(s) of shape ``(*shape, 4)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def check(q: jnp.ndarray) -> None:
    if q.shape[-1] != 4:
        raise ValueError(f"expected last dim 4 for quaternion, got {q.shape}")


def split(q: jnp.ndarray):
    """Split into (vector xyz, scalar w[..., None])."""
    check(q)
    return q[..., :3], q[..., 3:]


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ∘ q2 (rotation q2 applied first when rotating vectors)."""
    v1, w1 = split(q1)
    v2, w2 = split(q2)
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([v, w], axis=-1)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    check(q)
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Multiplicative inverse (== conjugate for unit quaternions)."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return conjugate(q) / jnp.maximum(n2, _EPS)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def rotate_vector(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) v by unit quaternion(s) q.

    Uses the 18-mul expansion v + 2 qw (qv × v) + 2 qv × (qv × v); pure VPU
    work, fuses fully under XLA.
    """
    qv, qw = split(q)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def from_axis_angle(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from rotation-vector (axis * angle) representation."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc form is stable at angle -> 0: sin(a/2)/a -> 1/2.
    small = angle < 1e-6
    k = jnp.where(small, 0.5 + angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS))
    return jnp.concatenate([axis_angle * k, jnp.cos(half)], axis=-1)


def to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (axis * angle) from unit quaternion, angle in [0, pi]."""
    qv, qw = split(q)
    sin_half = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, jnp.abs(qw))
    sign = jnp.where(qw < 0, -1.0, 1.0)
    k = jnp.where(sin_half < 1e-9, 2.0 * sign, sign * angle / jnp.maximum(sin_half, _EPS))
    return qv * k


def _axis_quat(angle: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Quaternion for rotation of `angle` about coordinate axis `axis` (static int)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    c = jnp.cos(half)
    z = jnp.zeros_like(angle)
    comps = [z, z, z]
    comps[axis] = s
    return jnp.stack(comps + [c], axis=-1)


def euler_to_quaternion(angles: jnp.ndarray, order: str = "ZYX") -> jnp.ndarray:
    """Quaternion for the matrix product R = R_o0(a_o0) · R_o1(a_o1) · R_o2(a_o2).

    `angles[..., i]` is always the angle about axis i (x=0, y=1, z=2) regardless
    of order; `order` gives the multiplication order left-to-right. The
    reference's joint rotation is R = Rz(rz)·Ry(ry)·Rx(rx) i.e. order="ZYX"
    (joint_state.cpp:50-58: loop index 2..0 right-multiplying).
    """
    axis_of = {"X": 0, "Y": 1, "Z": 2}
    q = None
    for ch in order:
        ax = axis_of[ch]
        qa = _axis_quat(angles[..., ax], ax)
        q = qa if q is None else multiply(q, qa)
    return q


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix from unit quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_rotation_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x,y,z,w) from rotation matrix, branch-free.

    Shepperd's method evaluated on all four candidates with `where` selection so
    it is vmap/jit-safe and numerically stable for every sign pattern.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], axis=-1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], axis=-1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], axis=-1)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return normalize(q)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical linear interpolation, shortest arc, nlerp fallback near 0."""
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return normalize(w0 * q0 + w1 * q1)


def blend(quats: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted blend of quaternions over the second-to-last axis.

    The eigen average of Markley et al. ("Averaging Quaternions", AIAA JGCD
    2007), matching pymomentum/quaternion_np.py:516-536 blend(): the result is
    the top eigenvector of M = Σ w_i·q_i·q_iᵀ with the weights clamped ≥ 0 and
    normalized to sum 1. Unlike the normalized-lerp blend (`blend_nlerp`) this
    is exact for spread-out quaternions and sign-invariant by construction.
    """
    if weights is None:
        weights = jnp.ones(quats.shape[:-1], dtype=quats.dtype)
    weights = jnp.maximum(weights, 0.0)
    weights = weights / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True), _EPS)
    m = jnp.einsum("...ki,...kj,...k->...ij", quats, quats, weights)
    _, vecs = jnp.linalg.eigh(m)  # ascending eigenvalues
    return vecs[..., :, 3]


def blend_nlerp(quats: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized-lerp blend: sign-correct against the first quaternion, then
    renormalize the weighted sum. First-order equal to `blend` for clustered
    quaternions at a fraction of the cost — the right choice inside skinning
    and dual-quaternion-style hot paths; use `blend` where the reference's
    eigen-average semantics matter (retargeting, motion averaging)."""
    if weights is None:
        weights = jnp.ones(quats.shape[:-1], dtype=quats.dtype)
    ref = quats[..., :1, :]
    sign = jnp.where(jnp.sum(quats * ref, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    q = jnp.sum(quats * sign * weights[..., None], axis=-2)
    return normalize(q)


def from_two_vectors(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Shortest-arc quaternion rotating direction a onto direction b."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    w = 1.0 + d
    # antiparallel fallback: rotate pi about any axis orthogonal to a.
    ortho = jnp.cross(a, jnp.where(jnp.abs(a[..., :1]) < 0.9, jnp.asarray([1.0, 0, 0], a.dtype), jnp.asarray([0, 1.0, 0], a.dtype)))
    q = jnp.concatenate([c, w], axis=-1)
    q_anti = jnp.concatenate([ortho, jnp.zeros_like(w)], axis=-1)
    q = jnp.where(w < 1e-6, q_anti, q)
    return normalize(q)


# ---------------------------------------------------------------------------
# pymomentum/quaternion.py API-parity aliases (quaternion_np.py:332-420).
# The base ops here never re-normalize, so the *_assume_normalized variants
# are the same functions — kept as named aliases for drop-in migration.
# ---------------------------------------------------------------------------

multiply_assume_normalized = multiply
rotate_vector_assume_normalized = rotate_vector
to_rotation_matrix_assume_normalized = to_rotation_matrix


def euler_xyz_to_quaternion(euler_xyz: jnp.ndarray) -> jnp.ndarray:
    """[rx, ry, rz] applied X first, then Y, then Z → q = qz ⊗ qy ⊗ qx
    (quaternion_np.py:332-358)."""
    return euler_to_quaternion(euler_xyz, "ZYX")


def euler_zyx_to_quaternion(euler_zyx: jnp.ndarray) -> jnp.ndarray:
    """[yaw, pitch, roll] applied Z first, then Y, then X → q = qx ⊗ qy ⊗ qz
    (quaternion_np.py:361-390)."""
    return euler_to_quaternion(euler_zyx[..., ::-1], "XYZ")


def quaternion_to_xyz_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of euler_xyz_to_quaternion: (rx, ry, rz) with
    Rz(rz)·Ry(ry)·Rx(rx) == R(q) (quaternion_np.py quaternion_to_xyz_euler)."""
    from momentum_tpu.math.euler import quaternion_to_euler_zyx

    return quaternion_to_euler_zyx(q)


def check_and_normalize_weights(quats: jnp.ndarray,
                                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Validate/normalize blend weights for (..., k, 4) quaternion stacks
    (pymomentum/quaternion.py:353 check_and_normalize_weights): missing
    weights become uniform; weights are normalized to sum to 1 over k."""
    k = quats.shape[-2]
    if quats.shape[-1] != 4:
        raise ValueError(f"expected (..., k, 4) quaternions, got {quats.shape}")
    if weights is None:
        return jnp.full(quats.shape[:-1], 1.0 / k, dtype=quats.dtype)
    weights = jnp.asarray(weights, quats.dtype)
    if weights.shape[-1] != k:
        raise ValueError(
            f"weights last dim {weights.shape[-1]} != quaternion count {k}")
    total = jnp.sum(weights, axis=-1, keepdims=True)
    return weights / jnp.where(total == 0, 1.0, total)
