"""Euler-angle conversions (branch-free JAX versions).

Conventions mirror the reference (momentum/math/utility.h:153-175):
an *intrinsic* sequence "XYZ" means the matrix product Rx·Ry·Rz; the
*extrinsic* XYZ sequence is the intrinsic ZYX product with reversed angle
order. The reference's joint rotation R = Rz(rz)·Ry(ry)·Rx(rx) is intrinsic
ZYX, i.e. extrinsic XYZ (joint_state.cpp:50-58).

`rotation_matrix_to_euler_*` use jnp.where-selected gimbal-lock branches so
they are jit/vmap-safe; at the locks the first angle is pinned to zero exactly
as the reference does (utility.cpp:220-236, 265-280).
"""

from __future__ import annotations

import jax.numpy as jnp

from momentum_tpu.math import quaternion as quat

__all__ = [
    "euler_xyz_to_matrix",
    "euler_zyx_to_matrix",
    "rotation_matrix_to_euler_xyz",
    "rotation_matrix_to_euler_zyx",
    "quaternion_to_euler_zyx",
]

_TOL = 1e-6


def _axis_matrix(angle: jnp.ndarray, axis: int) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == 0:
        rows = [one, zero, zero, zero, c, -s, zero, s, c]
    elif axis == 1:
        rows = [c, zero, s, zero, one, zero, -s, zero, c]
    else:
        rows = [c, -s, zero, s, c, zero, zero, zero, one]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_xyz_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic XYZ: Rx(a0)·Ry(a1)·Rz(a2)."""
    return _axis_matrix(angles[..., 0], 0) @ _axis_matrix(angles[..., 1], 1) @ _axis_matrix(angles[..., 2], 2)


def euler_zyx_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic ZYX with angles given as (rx, ry, rz): Rz(a2)·Ry(a1)·Rx(a0).

    This is the joint-rotation convention (joint params store rx,ry,rz).
    """
    return _axis_matrix(angles[..., 2], 2) @ _axis_matrix(angles[..., 1], 1) @ _axis_matrix(angles[..., 0], 0)


def rotation_matrix_to_euler_xyz(m: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic-XYZ angles (x, y, z) such that Rx·Ry·Rz == m."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m22 = m[..., 2, 2]
    sy = jnp.clip(m02, -1.0, 1.0)
    # regular branch
    x_r = jnp.arctan2(-m12, m22)
    y_r = jnp.arcsin(sy)
    z_r = jnp.arctan2(-m01, m00)
    # gimbal locks: sy == ∓1 → x pinned to 0
    z_lo = jnp.arctan2(m10, m11)       # sy == -1, y = -pi/2
    z_hi = jnp.arctan2(m10, m11)       # sy == +1, y = +pi/2 (same remaining entries)
    lo = sy <= -1.0 + _TOL
    hi = sy >= 1.0 - _TOL
    x = jnp.where(lo | hi, 0.0, x_r)
    y = jnp.where(lo, -jnp.pi / 2, jnp.where(hi, jnp.pi / 2, y_r))
    z = jnp.where(lo, z_lo, jnp.where(hi, z_hi, z_r))
    return jnp.stack([x, y, z], axis=-1)


def rotation_matrix_to_euler_zyx(m: jnp.ndarray) -> jnp.ndarray:
    """Angles (z, y, x) such that Rz(z)·Ry(y)·Rx(x) == m (reference ZYX order,
    utility.cpp:240-281 — first returned component is the Z angle)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10 = m[..., 1, 0]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    sy = jnp.clip(-m20, -1.0, 1.0)
    z_r = jnp.arctan2(m10, m00)
    y_r = jnp.arcsin(sy)
    x_r = jnp.arctan2(m21, m22)
    # locks: m20 == -1 → sin(y)=+1; m20 == +1 → sin(y)=-1; pin z to 0
    hi = m20 <= -1.0 + _TOL   # sin(y) = +1
    lo = m20 >= 1.0 - _TOL    # sin(y) = -1
    x_hi = jnp.arctan2(m01, m02)
    x_lo = jnp.arctan2(-m01, -m02)
    z = jnp.where(lo | hi, 0.0, z_r)
    y = jnp.where(hi, jnp.pi / 2, jnp.where(lo, -jnp.pi / 2, y_r))
    x = jnp.where(hi, x_hi, jnp.where(lo, x_lo, x_r))
    return jnp.stack([z, y, x], axis=-1)


def quaternion_to_euler_zyx(q: jnp.ndarray) -> jnp.ndarray:
    """Joint-rotation Euler extraction: returns (rx, ry, rz) such that
    Rz(rz)·Ry(ry)·Rx(rx) == R(q) — the inverse of the FK joint rotation."""
    zyx = rotation_matrix_to_euler_zyx(quat.to_rotation_matrix(q))
    return zyx[..., ::-1]
