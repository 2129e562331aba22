"""Batched similarity-transform ("skeleton state") algebra.

A skeleton state packs a uniform-scale rigid transform into 8 floats laid out
``(tx, ty, tz, rx, ry, rz, rw, s)`` — translation, quaternion (x,y,z,w), scale —
matching the reference's Python representation (pymomentum/skel_state.py:13-18).
This is the currency of forward kinematics: FK maps joint parameters to one
skeleton state per joint.

Composition semantics follow the reference's TransformT (math/transform.h:119-129):

    (A * B).t = A.t + A.R · (A.s · B.t)
    (A * B).R = A.R · B.R
    (A * B).s = A.s · B.s

and point transform ``A · p = A.t + A.R · (A.s · p)`` (transform.h:193-195).

All functions broadcast over leading dimensions; the compose op is associative,
which is what makes the binary-lifting (prefix-product) FK path valid.
"""

from __future__ import annotations

import jax.numpy as jnp

from momentum_tpu.math import quaternion as quat

__all__ = [
    "identity",
    "check",
    "split",
    "join",
    "from_translation",
    "from_quaternion",
    "from_scale",
    "multiply",
    "inverse",
    "transform_points",
    "rotate_vectors",
    "to_matrix",
    "from_matrix",
    "blend",
    "slerp",
]


def check(s: jnp.ndarray) -> None:
    if s.shape[-1] != 8:
        raise ValueError(f"expected last dim 8 for skel_state, got {s.shape}")


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    s = jnp.zeros(tuple(shape) + (8,), dtype=dtype)
    return s.at[..., 6].set(1.0).at[..., 7].set(1.0)


def split(s: jnp.ndarray):
    """-> (t (...,3), q (...,4), scale (...,1))."""
    check(s)
    return s[..., 0:3], s[..., 3:7], s[..., 7:8]


def join(t: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    if s.ndim == t.ndim - 1:
        s = s[..., None]
    batch = jnp.broadcast_shapes(t.shape[:-1], q.shape[:-1], s.shape[:-1])
    t = jnp.broadcast_to(t, batch + (3,))
    q = jnp.broadcast_to(q, batch + (4,))
    s = jnp.broadcast_to(s, batch + (1,))
    return jnp.concatenate([t, q, s], axis=-1)


def from_translation(t: jnp.ndarray) -> jnp.ndarray:
    q = quat.identity(t.shape[:-1], dtype=t.dtype)
    return join(t, q, jnp.ones(t.shape[:-1] + (1,), t.dtype))


def from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros(q.shape[:-1] + (3,), q.dtype)
    return join(z, q, jnp.ones(q.shape[:-1] + (1,), q.dtype))


def from_scale(s: jnp.ndarray) -> jnp.ndarray:
    if s.shape[-1] != 1:
        s = s[..., None]
    z = jnp.zeros(s.shape[:-1] + (3,), s.dtype)
    return join(z, quat.identity(s.shape[:-1], dtype=s.dtype), s)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose: apply b first, then a (matrix convention A·B)."""
    ta, qa, sa = split(a)
    tb, qb, sb = split(b)
    t = ta + quat.rotate_vector(qa, sa * tb)
    q = quat.multiply(qa, qb)
    return join(t, q, sa * sb)


def inverse(a: jnp.ndarray) -> jnp.ndarray:
    t, q, s = split(a)
    qi = quat.conjugate(q)
    si = 1.0 / s
    ti = -quat.rotate_vector(qi, si * t)
    return join(ti, qi, si)


def transform_points(a: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply transform(s) to point(s): t + R·(s·p)."""
    t, q, s = split(a)
    return t + quat.rotate_vector(q, s * p)


def rotate_vectors(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotation only (directions): R·v."""
    _, q, _ = split(a)
    return quat.rotate_vector(q, v)


def to_matrix(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) homogeneous matrix [s·R | t]."""
    t, q, s = split(a)
    r = quat.to_rotation_matrix(q) * s[..., None]
    m = jnp.zeros(a.shape[:-1] + (4, 4), a.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of to_matrix for matrices of the form [s·R | t] (uniform scale).

    Scale is recovered as the cube root of the determinant of the linear part.
    """
    lin = m[..., :3, :3]
    det = jnp.linalg.det(lin)
    s = jnp.cbrt(det)
    r = lin / jnp.maximum(s[..., None, None], 1e-12)
    q = quat.from_rotation_matrix(r)
    t = m[..., :3, 3]
    return join(t, q, s[..., None])


def blend(states: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted blend over second-to-last axis: lerp t and s, quaternion blend q."""
    if weights is None:
        weights = jnp.ones(states.shape[:-1], states.dtype)
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    w = weights / wsum
    t, q, s = split(states)
    tb = jnp.sum(t * w[..., None], axis=-2)
    sb = jnp.sum(s * w[..., None], axis=-2)
    qb = quat.blend(q, w)
    return join(tb, qb, sb)


def slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    ta, qa, sa = split(a)
    tb, qb, sb = split(b)
    tt = jnp.asarray(t, a.dtype)
    if tt.ndim == a.ndim - 1:
        tt = tt[..., None]
    return join(
        (1.0 - tt) * ta + tt * tb,
        quat.slerp(qa, qb, tt),
        jnp.exp((1.0 - tt) * jnp.log(jnp.maximum(sa, 1e-12)) + tt * jnp.log(jnp.maximum(sb, 1e-12))),
    )


def multiply_assume_normalized(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """pymomentum/skel_state.py multiply_assume_normalized: multiply()
    without re-normalizing the rotation part. Our multiply composes the
    quaternions directly (no normalize step), so the two names coincide."""
    return multiply(a, b)


def transform_points_assume_normalized(a: jnp.ndarray,
                                       p: jnp.ndarray) -> jnp.ndarray:
    """pymomentum/skel_state.py transform_points_assume_normalized — see
    multiply_assume_normalized for why this aliases transform_points."""
    return transform_points(a, p)
