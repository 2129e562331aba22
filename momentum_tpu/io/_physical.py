"""Shared JSON schema for per-joint physical mass bodies.

Reference: momentum/io/common/json_utils.cpp:310-374 — one object per body:
{"mass": float, "centerOfMass": [x,y,z], "inertia": {ixx,ixy,ixz,iyy,iyz,izz},
 "inertiaRotation": [w,x,y,z]}. Used by GLB node extensions
(gltf_builder.cpp:751), FBX custom string properties
(openfbx_loader.cpp:138-143), and USD momentum:physicalProperties attributes
(usd_io.cpp:241+).
"""

from __future__ import annotations

import numpy as np

__all__ = ["body_to_json", "body_from_json", "rows_to_physical_properties"]


def body_to_json(mass, com, inertia, quat_xyzw) -> dict:
    """One body → the reference JSON object (quaternion stored [w,x,y,z])."""
    q = np.asarray(quat_xyzw, np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-30)
    inertia = np.asarray(inertia)
    return {
        "mass": float(mass),
        "centerOfMass": [float(x) for x in np.asarray(com)],
        "inertia": {"ixx": float(inertia[0, 0]), "ixy": float(inertia[0, 1]),
                    "ixz": float(inertia[0, 2]), "iyy": float(inertia[1, 1]),
                    "iyz": float(inertia[1, 2]), "izz": float(inertia[2, 2])},
        "inertiaRotation": [float(q[3]), float(q[0]), float(q[1]), float(q[2])],
    }


def body_from_json(j: dict):
    """JSON object → (mass, com(3,), inertia(3,3), quat_xyzw(4,)) numpy."""
    inj = j.get("inertia", {})
    inertia = np.array(
        [[inj.get("ixx", 0.0), inj.get("ixy", 0.0), inj.get("ixz", 0.0)],
         [inj.get("ixy", 0.0), inj.get("iyy", 0.0), inj.get("iyz", 0.0)],
         [inj.get("ixz", 0.0), inj.get("iyz", 0.0), inj.get("izz", 0.0)]],
        np.float32)
    qwxyz = j.get("inertiaRotation", [1.0, 0.0, 0.0, 0.0])
    return (float(j.get("mass", 0.0)),
            np.asarray(j.get("centerOfMass", [0.0, 0.0, 0.0]), np.float32),
            inertia,
            np.asarray([qwxyz[1], qwxyz[2], qwxyz[3], qwxyz[0]], np.float32))


def rows_to_physical_properties(rows):
    """rows of (joint_index, mass, com, inertia, quat_xyzw, joint_name) →
    PhysicalProperties pytree (None when empty)."""
    import jax.numpy as jnp

    from momentum_tpu.character import PhysicalProperties

    if not rows:
        return None
    return PhysicalProperties(
        joint_index=jnp.asarray([r[0] for r in rows], jnp.int32),
        mass=jnp.asarray([r[1] for r in rows], jnp.float32),
        center_of_mass_offset=jnp.asarray(
            np.stack([np.asarray(r[2], np.float32) for r in rows])),
        inertia=jnp.asarray(np.stack([np.asarray(r[3], np.float32)
                                      for r in rows])),
        inertia_rotation=jnp.asarray(
            np.stack([np.asarray(r[4], np.float32) for r in rows])),
        joint_names=tuple(r[5] for r in rows),
    )
