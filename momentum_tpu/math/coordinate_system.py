"""Coordinate-system conversions (up axis / handedness / length unit).

Reference: momentum/math/coordinate_system.{h,cpp} — CoordinateSystem
{UpAxis, Handedness, LengthUnit}, the canonical Momentum system (Y-up,
right-handed, centimeters), scaleFactor, and change{Vector,Quaternion,
Matrix} via the signed permutation P = toAxes · fromAxesᵀ where each
axes matrix maps semantic (right, forward, up) to world (x, y, z); a
left-handed system flips only the forward axis.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "UP_X", "UP_Y", "UP_Z",
    "HAND_LEFT", "HAND_RIGHT",
    "UNIT_METER", "UNIT_DECIMETER", "UNIT_CENTIMETER", "UNIT_MILLIMETER",
    "CoordinateSystem",
    "MOMENTUM_COORDINATE_SYSTEM",
    "scale_factor",
    "permutation_matrix",
    "change_vector",
    "change_quaternion",
    "change_matrix",
]

UP_X, UP_Y, UP_Z = "x", "y", "z"
HAND_LEFT, HAND_RIGHT = "left", "right"
UNIT_METER, UNIT_DECIMETER, UNIT_CENTIMETER, UNIT_MILLIMETER = (
    "m", "dm", "cm", "mm")

_UNIT_IN_METERS = {"m": 1.0, "dm": 0.1, "cm": 0.01, "mm": 0.001}


@dataclasses.dataclass(frozen=True)
class CoordinateSystem:
    up: str = UP_Y
    hand: str = HAND_RIGHT
    unit: str = UNIT_CENTIMETER


#: Momentum's canonical system: Y-up, right-handed, centimeters.
MOMENTUM_COORDINATE_SYSTEM = CoordinateSystem()


def scale_factor(src: CoordinateSystem, dst: CoordinateSystem) -> float:
    """Length scale converting from src's unit to dst's (m→cm = 100)."""
    return _UNIT_IN_METERS[src.unit] / _UNIT_IN_METERS[dst.unit]


def _axes(up: str, hand: str) -> np.ndarray:
    """Columns = world directions of (right, forward, up)."""
    m = np.zeros((3, 3))
    r = 1.0 if hand == HAND_RIGHT else -1.0
    if up == UP_Y:  # OpenGL-style
        m[:, 0] = [1, 0, 0]
        m[:, 1] = [0, 0, -r]
        m[:, 2] = [0, 1, 0]
    elif up == UP_Z:  # Blender/robotics-style
        m[:, 0] = [1, 0, 0]
        m[:, 1] = [0, r, 0]
        m[:, 2] = [0, 0, 1]
    elif up == UP_X:
        m[:, 0] = [0, 1, 0]
        m[:, 1] = [0, 0, r]
        m[:, 2] = [1, 0, 0]
    else:
        raise ValueError(f"unknown up axis {up!r}")
    return m


def permutation_matrix(src: CoordinateSystem, dst: CoordinateSystem):
    """Signed permutation P with v_dst = P · v_src."""
    p = _axes(dst.up, dst.hand) @ _axes(src.up, src.hand).T
    return jnp.asarray(p, jnp.float32)


def change_vector(v, src: CoordinateSystem, dst: CoordinateSystem):
    """Positions/directions: axis permutation + handedness + unit scale."""
    p = permutation_matrix(src, dst)
    return scale_factor(src, dst) * jnp.einsum("ij,...j->...i", p,
                                               jnp.asarray(v))


def change_matrix(r, src: CoordinateSystem, dst: CoordinateSystem):
    """Rotation matrices: P·R·Pᵀ (always a proper rotation; no unit scale)."""
    p = permutation_matrix(src, dst)
    return jnp.einsum("ij,...jk,lk->...il", p, jnp.asarray(r), p)


def change_quaternion(q, src: CoordinateSystem, dst: CoordinateSystem):
    """Quaternions: round-trip through the rotation matrix so handedness
    flips are handled transparently (coordinate_system.cpp changeQuaternion)."""
    from momentum_tpu.math import quaternion as quat

    m = quat.to_rotation_matrix(jnp.asarray(q))
    return quat.from_rotation_matrix(change_matrix(m, src, dst))
