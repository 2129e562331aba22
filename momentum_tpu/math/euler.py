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
    "euler_to_matrix",
    "rotation_matrix_to_euler",
    "rotation_matrix_to_one_axis_euler",
    "rotation_matrix_to_two_axis_euler",
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


# ---------------------------------------------------------------------------
# Generic axis-sequence Euler conversions + best-fit reduced-DOF extraction
# (reference: math/utility.h:185-246 rotationMatrixToEuler /
#  rotationMatrixToOneAxisEuler / rotationMatrixToTwoAxisEuler).
# Axis arguments are static Python ints so everything stays jit/vmap-safe;
# only the gimbal selects are traced.
# ---------------------------------------------------------------------------

_EVEN = {(0, 1, 2), (1, 2, 0), (2, 0, 1)}


def euler_to_matrix(angles: jnp.ndarray, axes=(0, 1, 2),
                    convention: str = "intrinsic") -> jnp.ndarray:
    """General Euler composition. Intrinsic (i,j,k) is R_i(a0)·R_j(a1)·R_k(a2);
    extrinsic is the reversed product R_k(a2)·R_j(a1)·R_i(a0)
    (utility.h:153-175 semantics). Repeated first/last axes (proper Euler,
    e.g. ZXZ) are allowed."""
    i, j, k = axes
    if convention == "extrinsic":
        return (_axis_matrix(angles[..., 2], k)
                @ _axis_matrix(angles[..., 1], j)
                @ _axis_matrix(angles[..., 0], i))
    if convention != "intrinsic":
        raise ValueError(f"unknown Euler convention {convention!r}")
    return (_axis_matrix(angles[..., 0], i)
            @ _axis_matrix(angles[..., 1], j)
            @ _axis_matrix(angles[..., 2], k))


def rotation_matrix_to_euler(m: jnp.ndarray, axes=(0, 1, 2),
                             convention: str = "intrinsic") -> jnp.ndarray:
    """General Euler extraction: angles such that
    euler_to_matrix(angles, axes, convention) == m (utility.cpp:185-196; the
    reference delegates to Eigen::eulerAngles — branch choices may differ but
    the recomposition is identical). Supports all 12 sequences: 6 Tait-Bryan
    (distinct axes) and 6 proper Euler (first==last axis)."""
    i, j, k = axes
    if convention == "extrinsic":
        return rotation_matrix_to_euler(m, (k, j, i), "intrinsic")[..., ::-1]
    if convention != "intrinsic":
        raise ValueError(f"unknown Euler convention {convention!r}")
    if i == j or j == k:
        raise ValueError("consecutive equal axes are degenerate")
    tol = _TOL if m.dtype == jnp.float32 else 1e-12

    if i != k:  # Tait-Bryan
        eps = 1.0 if (i, j, k) in _EVEN else -1.0
        s1 = eps * m[..., i, k]
        # cos t1 ≥ 0 on the principal range [-π/2, π/2]; recover it from the
        # (j,k)/(k,k) pair so t1 stays accurate up to the lock
        c1 = jnp.sqrt(m[..., j, k] ** 2 + m[..., k, k] ** 2)
        t0 = jnp.arctan2(-eps * m[..., j, k], m[..., k, k])
        t1 = jnp.arctan2(s1, c1)
        t2 = jnp.arctan2(-eps * m[..., i, j], m[..., i, i])
        # exact gimbal (cos t1 == 0): every atan2 operand above vanishes —
        # pin t2 = 0; the residual is R_i(t0)·R_j(±π/2) whose stable
        # entries are m[j,j] = cos t0 and m[k,j] = eps·sin t0
        locked = c1 <= tol
        t0_lock = jnp.arctan2(eps * m[..., k, j], m[..., j, j])
        t0 = jnp.where(locked, t0_lock, t0)
        t2 = jnp.where(locked, 0.0, t2)
    else:  # proper Euler (i == k)
        l = 3 - i - j  # the unused third axis
        eps = 1.0 if (i, j, l) in _EVEN else -1.0
        c1 = m[..., i, i]
        # sin t1 ≥ 0 on the principal range [0, π]
        s1 = jnp.sqrt(m[..., j, i] ** 2 + m[..., l, i] ** 2)
        t0 = jnp.arctan2(m[..., j, i], -eps * m[..., l, i])
        t1 = jnp.arctan2(s1, c1)
        t2 = jnp.arctan2(m[..., i, j], eps * m[..., i, l])
        # exact gimbal (sin t1 == 0): pin t2 = 0; the rotation is pure
        # axis-i with R[j,j] = cos t0 and R[l,j] = eps·sin t0
        locked = s1 <= tol
        t0_lock = jnp.arctan2(eps * m[..., l, j], m[..., j, j])
        t0 = jnp.where(locked, t0_lock, t0)
        t2 = jnp.where(locked, 0.0, t2)
    return jnp.stack([t0, t1, t2], axis=-1)


def rotation_matrix_to_one_axis_euler(m: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Best-fit single-axis angle minimizing ||R_axis(θ) − m||_F
    (utility.cpp:822-843 rotationMatrixToOneAxisEuler). The least-squares
    optimum is closed-form: maximizing ⟨R(θ), m⟩ gives
    θ* = atan2(m[q,p] − m[p,q], m[p,p] + m[q,q]) over the complementary
    plane (p, q) with (axis, p, q) cyclic — the fixed point the reference's
    Gauss-Newton iteration converges to."""
    p = (axis + 1) % 3
    q = (axis + 2) % 3
    return jnp.arctan2(m[..., q, p] - m[..., p, q],
                       m[..., p, p] + m[..., q, q])


def rotation_matrix_to_two_axis_euler(m: jnp.ndarray, axis0: int, axis1: int,
                                      num_iterations: int = 20) -> jnp.ndarray:
    """Best-fit two-axis Euler (axis0 applied first, then axis1:
    R = R_axis1(t1)·R_axis0(t0)) minimizing the Frobenius distance to m
    (utility.cpp:845-857). Gauss-Newton on the 9-dim flattened residual with
    one-axis closed-form initialization, run for a fixed iteration count
    (lax.fori_loop — compiler-friendly; converged iterates are stationary)."""
    import jax

    if axis0 == axis1:
        raise ValueError("two-axis fit requires distinct axes")

    t0_init = rotation_matrix_to_one_axis_euler(m, axis0)
    t1_init = rotation_matrix_to_one_axis_euler(m, axis1)
    angles0 = jnp.stack([t0_init, t1_init], axis=-1)

    def d_axis_matrix(angle, ax):
        c, s = jnp.cos(angle), jnp.sin(angle)
        zero = jnp.zeros_like(angle)
        if ax == 0:
            rows = [zero, zero, zero, zero, -s, -c, zero, c, -s]
        elif ax == 1:
            rows = [-s, zero, c, zero, zero, zero, -c, zero, -s]
        else:
            rows = [-s, -c, zero, c, -s, zero, zero, zero, zero]
        return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))

    def step(_, angles):
        t0, t1 = angles[..., 0], angles[..., 1]
        r0 = _axis_matrix(t0, axis0)
        r1 = _axis_matrix(t1, axis1)
        resid = (r1 @ r0 - m).reshape(m.shape[:-2] + (9,))
        j0 = (r1 @ d_axis_matrix(t0, axis0)).reshape(m.shape[:-2] + (9,))
        j1 = (d_axis_matrix(t1, axis1) @ r0).reshape(m.shape[:-2] + (9,))
        jtj00 = jnp.sum(j0 * j0, -1)
        jtj01 = jnp.sum(j0 * j1, -1)
        jtj11 = jnp.sum(j1 * j1, -1)
        g0 = jnp.sum(j0 * resid, -1)
        g1 = jnp.sum(j1 * resid, -1)
        det = jtj00 * jtj11 - jtj01 * jtj01
        safe = jnp.abs(det) > 1e-12
        det = jnp.where(safe, det, 1.0)
        d0 = jnp.where(safe, -(jtj11 * g0 - jtj01 * g1) / det, 0.0)
        d1 = jnp.where(safe, -(jtj00 * g1 - jtj01 * g0) / det, 0.0)
        return angles + jnp.stack([d0, d1], axis=-1)

    return jax.lax.fori_loop(0, num_iterations, step, angles0)
