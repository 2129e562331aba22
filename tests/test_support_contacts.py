"""Support-contact queries (reference: character_solver/support_contacts)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.support_contacts import (
    floor_locator_support_contacts,
    is_floor_locator_name,
    plane_collision_support_contacts,
    support_contact_positions,
    support_polygon_from_contacts,
)
from momentum_tpu.math.support_polygon import SupportPlane
from momentum_tpu.testing.fixtures import create_test_character


def _char_with_floor_locators():
    char = create_test_character(4)
    locs = char.locators
    names = tuple(f"Floor_{i}" if i < 2 else f"loc_{i}"
                  for i in range(locs.num_locators))
    return dataclasses.replace(
        char, locators=dataclasses.replace(locs, names=names))


def test_is_floor_locator_name():
    assert is_floor_locator_name("Floor_l_heel")
    assert not is_floor_locator_name("l_heel")
    assert not is_floor_locator_name("floor_x")  # case-sensitive prefix


def test_floor_locator_contacts_threshold():
    char = _char_with_floor_locators()
    states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    # plane far below: nothing touches
    lo = floor_locator_support_contacts(
        char, states, contact_height=0.05,
        plane=SupportPlane.create(offset=-100.0))
    assert not bool(lo["active"].any())
    # plane through every locator: exactly the Floor-named ones activate
    hi = floor_locator_support_contacts(
        char, states, contact_height=1e9)
    np.testing.assert_array_equal(np.asarray(hi["active"]),
                                  np.asarray(hi["floor_mask"]))
    assert int(hi["active"].sum()) == 2
    # parent offsets reconstruct world positions
    from momentum_tpu.math import skel_state as ss
    ps = jnp.take(states, char.locators.parent, axis=-2)
    rec = ss.transform_points(ps, hi["parent_offset"])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(hi["positions"]),
                               atol=1e-5)


def test_plane_collision_contacts_deepest_per_parent():
    char = create_test_character(4)
    states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    out = plane_collision_support_contacts(
        char, states, contact_margin=1e9)  # everything is a candidate
    act = np.asarray(out["active"])
    deep = np.asarray(out["deepest_per_parent"])
    parents = np.asarray(out["parent"])
    assert act.all()
    # at most one deepest contact per parent joint
    for p in np.unique(parents):
        assert deep[parents == p].sum() <= 1
    # contact positions lie on the primitive surface toward the plane:
    # signed distance of contact = overlap shifted by radius
    plane = SupportPlane.create()
    sd_contact = np.asarray(plane.signed_distance(out["positions"]))
    assert np.isfinite(sd_contact).all()


def test_merged_positions_and_polygon():
    char = _char_with_floor_locators()
    states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    pos, active = support_contact_positions(char, states, contact_height=1e9)
    assert pos.shape[0] == active.shape[0]
    assert int(active.sum()) >= 2
    hull = support_polygon_from_contacts(char, states, contact_height=1e9)
    assert hull.ndim == 2 and hull.shape[1] == 2


def test_no_collision_geometry():
    char = create_test_character(4)
    char = dataclasses.replace(char, collision=None)
    states = char.skeleton_states(jnp.zeros(char.num_model_parameters))
    out = plane_collision_support_contacts(char, states, 0.1)
    assert out["positions"].shape == (0, 3)
    pos, active = support_contact_positions(char, states, 0.1)
    assert pos.shape[0] == char.locators.num_locators
