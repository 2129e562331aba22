"""Support-contact queries: floor locators + plane-collision contacts.

Reference: character_solver/support_contacts.{h,cpp} — select the points
through which the character is supported by the ground plane (floor locators
whose plane distance ≤ contactHeight, plus collision primitives overlapping
the plane), used to build balance support polygons.

TPU shape: instead of dynamic contact vectors, every query returns
fixed-shape arrays + an `active` mask (static shapes; jit/vmap-friendly).
Host-side helpers (`support_polygon`) consume the masked arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from momentum_tpu.math import quaternion as quat, skel_state as ss
from momentum_tpu.math.support_polygon import (
    SupportPlane,
    support_polygon_from_world_points,
)

__all__ = [
    "is_floor_locator_name",
    "floor_locator_mask",
    "floor_locator_support_contacts",
    "plane_collision_support_contacts",
    "support_contact_positions",
    "support_polygon_from_contacts",
]


def is_floor_locator_name(name: str) -> bool:
    """support_contacts.cpp:22-24: the 'Floor' name prefix convention."""
    return name.startswith("Floor")


def floor_locator_mask(locators) -> np.ndarray:
    """Static (L,) bool mask of floor locators (host-side, from names)."""
    names = locators.names or ()
    out = np.zeros(locators.num_locators, bool)
    for i, n in enumerate(names[: locators.num_locators]):
        out[i] = is_floor_locator_name(str(n))
    return out


def _parent_offset(parent_states, world_points):
    """Parent-local offset reconstructing world_points under the parent
    transform (support_contacts.cpp parentOffsetFromWorldPoint)."""
    t, q, s = ss.split(parent_states)
    rel = quat.rotate_vector(quat.conjugate(q), world_points - t)
    return rel / jnp.maximum(jnp.abs(s), 1e-8) * jnp.sign(s + (s == 0))


def floor_locator_support_contacts(character, skel_states, contact_height,
                                   plane: SupportPlane | None = None):
    """computeFloorLocatorSupportContacts: dict with positions (L, 3),
    parent (L,), parent_offset (L, 3), active (L,) — active when the locator
    is a floor locator AND its signed plane distance ≤ contact_height —
    and floor_mask (L,) marking all floor locators."""
    if plane is None:
        plane = SupportPlane.create()
    locs = character.locators
    parent_states = jnp.take(skel_states, locs.parent, axis=-2)
    positions = ss.transform_points(parent_states, locs.offset)
    sd = plane.signed_distance(positions)
    fmask = jnp.asarray(floor_locator_mask(locs))
    active = fmask & (sd <= contact_height)
    return dict(
        positions=positions,
        parent=locs.parent,
        parent_offset=_parent_offset(parent_states, positions),
        signed_distance=sd,
        active=active,
        floor_mask=fmask,
    )


def plane_collision_support_contacts(character, skel_states, contact_margin,
                                     plane: SupportPlane | None = None):
    """computePlaneCollisionSupportContacts: per collision primitive, the
    deepest surface point toward the plane (plane_collision_query.cpp
    checkCollision), active when overlap = support_radius − signed_distance
    > −contact_margin. Keeps only the deepest contact per parent joint (the
    reference's per-parent dedup) via the `deepest_per_parent` mask."""
    if plane is None:
        plane = SupportPlane.create()
    col = character.collision
    if col is None:
        z = jnp.zeros((0, 3))
        return dict(positions=z, parent=jnp.zeros((0,), jnp.int32),
                    parent_offset=z, overlap=jnp.zeros((0,)),
                    active=jnp.zeros((0,), bool),
                    deepest_per_parent=jnp.zeros((0,), bool))
    from momentum_tpu.errors.collision import (
        primitive_states,
        support_radius_along,
    )

    o, d, r, q, ell, box = primitive_states(col, skel_states)
    n = plane.normal
    ptype = col.primitive_types()
    # capsule: worst endpoint; centered: center − support offset
    d0 = jnp.einsum("...i,i->...", o, n) - plane.offset
    d1 = jnp.einsum("...i,i->...", o + d, n) - plane.offset
    worst_is_0 = (d0 - r[..., 0]) <= (d1 - r[..., 1])
    cap_sd = jnp.where(worst_is_0, d0, d1)
    cap_r = jnp.where(worst_is_0, r[..., 0], r[..., 1])
    cap_pos = jnp.where(worst_is_0[..., None], o, o + d) - cap_r[..., None] * n
    r_sup = support_radius_along(ptype, q, ell, box, n)
    # support offset (plane_collision_query.cpp:214-227)
    n_local = quat.rotate_vector(quat.conjugate(q),
                                 jnp.broadcast_to(n, q[..., :3].shape))
    denom = jnp.maximum(r_sup, 1e-8)[..., None]
    ell_off = quat.rotate_vector(q, ell * ell * n_local) / denom
    box_off = quat.rotate_vector(
        q, jnp.abs(box) * jnp.where(n_local >= 0, 1.0, -1.0))
    cen_pos = o - jnp.where((ptype == 1)[..., None], ell_off, box_off)
    cen_sd = d0

    is_cap = ptype == 0
    sd = jnp.where(is_cap, cap_sd, cen_sd)
    radius = jnp.where(is_cap, cap_r, r_sup)
    positions = jnp.where(is_cap[..., None], cap_pos, cen_pos)
    overlap = radius - sd
    active = overlap > -contact_margin
    # deepest contact per parent joint (dedup as in updateActiveParentCollisions)
    np_parent = col.parent
    ov_masked = jnp.where(active, overlap, -jnp.inf)
    one_hot = np_parent[:, None] == np_parent[None, :]  # (C, C) same-parent
    best = jnp.max(jnp.where(one_hot, ov_masked[None, :], -jnp.inf), axis=-1)
    deepest = active & (ov_masked >= best)
    parent_states = jnp.take(skel_states, np_parent, axis=-2)
    return dict(
        positions=positions,
        parent=np_parent,
        parent_offset=_parent_offset(parent_states, positions),
        overlap=overlap,
        active=active,
        deepest_per_parent=deepest,
    )


def support_contact_positions(character, skel_states, contact_height,
                              plane: SupportPlane | None = None):
    """computeSupportContactPositions: merged (floor-locator + collision)
    world positions and their active mask, fixed shape."""
    if plane is None:
        plane = SupportPlane.create()
    fl = floor_locator_support_contacts(character, skel_states,
                                        contact_height, plane)
    pc = plane_collision_support_contacts(character, skel_states,
                                          contact_height, plane)
    positions = jnp.concatenate([fl["positions"], pc["positions"]], axis=-2)
    active = jnp.concatenate([fl["active"], pc["deepest_per_parent"]], axis=-1)
    return positions, active


def support_polygon_from_contacts(character, skel_states, contact_height,
                                  plane: SupportPlane | None = None):
    """Host-side: the 2-D support polygon of the active contacts."""
    if plane is None:
        plane = SupportPlane.create()
    positions, active = support_contact_positions(
        character, skel_states, contact_height, plane)
    pts = np.asarray(positions)[np.asarray(active)]
    return support_polygon_from_world_points(pts, plane)


# pymomentum.geometry binding spellings (support_contacts_pybind.cpp:341-443)
plane_collision_contacts_by_parent = plane_collision_support_contacts
support_contacts = support_contact_positions
support_polygon = support_polygon_from_contacts
