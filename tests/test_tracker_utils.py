"""tracker_utils tests (reference: marker_tracking/test patterns —
locator-character round trips, identity fill/remove, synthesized markers,
floor contacts)."""

import jax.numpy as jnp
import numpy as np

from momentum_tpu.tracking.tracker_utils import (
    average_triangle_skin_weights,
    closest_point_on_mesh_matching_parent,
    compute_floor_contact_constraints,
    create_locator_character,
    extract_id_and_locators_from_params,
    extract_locators_from_character,
    extract_markers_from_motion,
    extract_parameters,
    fill_identity,
    is_related_joint,
    locators_to_skinned_locators,
    remove_identity,
    skinned_locators_to_locators,
)
from momentum_tpu.testing.fixtures import create_test_character


def _rng():
    return np.random.default_rng(12345)


def test_create_locator_character_structure():
    char = create_test_character(4)
    lchar, mask = create_locator_character(char)
    nl = char.locators.num_locators
    assert lchar.skeleton.num_joints == char.skeleton.num_joints + nl
    assert lchar.num_model_parameters == char.num_model_parameters + 3 * nl
    assert mask.sum() == 3 * nl
    assert "locators" in lchar.parameter_transform.parameter_sets
    # locators reattached to their new joints with zero offset
    np.testing.assert_array_equal(
        np.asarray(lchar.locators.parent),
        np.arange(char.skeleton.num_joints,
                  char.skeleton.num_joints + nl))
    np.testing.assert_allclose(np.asarray(lchar.locators.offset), 0.0)


def test_locator_character_preserves_world_positions():
    """At zero added params the locator character's locator world positions
    equal the original's, for any body pose."""
    char = create_test_character(4)
    lchar, _ = create_locator_character(char)
    rng = _rng()
    x = rng.uniform(-0.3, 0.3, char.num_model_parameters).astype(np.float32)
    xl = np.concatenate([x, np.zeros(3 * char.locators.num_locators,
                                     np.float32)])
    w0 = char.locators.world_positions(
        char.skeleton_states(jnp.asarray(x)))
    w1 = lchar.locators.world_positions(
        lchar.skeleton_states(jnp.asarray(xl)))
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=1e-5)


def test_extract_locators_round_trip():
    """Calibrate offsets via the locator params, extract, and check the
    extracted locators reproduce the calibrated world positions."""
    char = create_test_character(4)
    lchar, mask = create_locator_character(char)
    rng = _rng()
    p = lchar.num_model_parameters
    calib = np.zeros(p, np.float32)
    calib[mask] = rng.uniform(-0.2, 0.2, mask.sum())
    world_cal = lchar.locators.world_positions(
        lchar.skeleton_states(jnp.asarray(calib)))

    extracted = extract_locators_from_character(lchar, calib)
    np.testing.assert_array_equal(np.asarray(extracted.parent),
                                  np.asarray(char.locators.parent))
    # rebuild world positions on the ORIGINAL character at the same pose
    import dataclasses as dc
    char2 = dc.replace(char, locators=extracted)
    x = calib[: char.num_model_parameters]
    w = char2.locators.world_positions(char2.skeleton_states(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(w), np.asarray(world_cal),
                               atol=1e-5)


def test_extract_id_and_locators():
    char = create_test_character(4)
    lchar, mask = create_locator_character(char)
    rng = _rng()
    p = lchar.num_model_parameters
    calib = rng.uniform(-0.2, 0.2, p).astype(np.float32)
    id_params, locators = extract_id_and_locators_from_params(
        calib, lchar, char)
    names = char.parameter_transform.names
    scale_ix = [i for i, n in enumerate(names) if "scale" in n.lower()]
    nonscale = [i for i in range(len(names)) if i not in scale_ix]
    np.testing.assert_allclose(np.asarray(id_params)[nonscale], 0.0)
    np.testing.assert_allclose(np.asarray(id_params)[scale_ix],
                               calib[scale_ix])
    assert locators.num_locators == char.locators.num_locators


def test_fill_remove_identity():
    char = create_test_character(4)
    p = char.num_model_parameters
    rng = _rng()
    motion = rng.uniform(-1, 1, (5, p)).astype(np.float32)
    identity = rng.uniform(-0.5, 0.5, p).astype(np.float32)
    filled = np.asarray(fill_identity(motion, identity, character=char))
    removed = np.asarray(remove_identity(filled, character=char))
    names = char.parameter_transform.names
    scale_ix = [i for i, n in enumerate(names) if "scale" in n.lower()]
    assert scale_ix
    for i in scale_ix:
        np.testing.assert_allclose(filled[:, i], identity[i])
        np.testing.assert_allclose(removed[:, i], 0.0)
    other = [i for i in range(p) if i not in scale_ix]
    np.testing.assert_allclose(filled[:, other], motion[:, other])


def test_extract_markers_from_motion():
    char = create_test_character(4)
    rng = _rng()
    motion = rng.uniform(-0.2, 0.2, (3, char.num_model_parameters))
    markers = extract_markers_from_motion(char, motion)
    assert markers.shape == (3, char.locators.num_locators, 3)
    # frame 0 equals direct locator-state computation
    w0 = char.locators.world_positions(char.skeleton_states(
        jnp.asarray(motion[0], jnp.float32)))
    np.testing.assert_allclose(np.asarray(markers[0]), np.asarray(w0),
                               atol=1e-6)


def test_is_related_joint():
    char = create_test_character(4)
    assert is_related_joint(char.skeleton, 1, 1)
    assert is_related_joint(char.skeleton, 1, 2)  # parent/child
    assert is_related_joint(char.skeleton, 2, 1)
    assert not is_related_joint(char.skeleton, 0, 3)


def test_average_triangle_skin_weights():
    char = create_test_character(4)
    idx, w = average_triangle_skin_weights(char, 0, (1 / 3, 1 / 3, 1 / 3))
    assert idx.shape == (8,) and w.shape == (8,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    assert (w >= 0).all()


def test_closest_point_matching_parent():
    char = create_test_character(4)
    # a point near the bottom of the strip, parent joint 0
    hit = closest_point_on_mesh_matching_parent(
        char, np.asarray([0.2, 0.1, 0.05], np.float32), 0)
    assert hit is not None
    tri, bary, point, dist = hit
    np.testing.assert_allclose(bary.sum(), 1.0, atol=1e-4)
    assert dist < 0.5
    # the chosen triangle is substantially skinned to joint 0's family
    faces = np.asarray(char.mesh.faces)
    sidx = np.asarray(char.skin_weights.index)[faces[tri]]
    assert (sidx <= 1).any()


def test_locator_skinned_round_trip():
    char = create_test_character(4)
    schar = locators_to_skinned_locators(char)
    total = (schar.locators.num_locators
             + (schar.skinned_locators.num_locators
                if schar.skinned_locators else 0))
    assert total == char.locators.num_locators
    assert schar.skinned_locators is not None
    assert schar.skinned_locators.num_locators > 0
    # weights rows normalized
    w = np.asarray(schar.skinned_locators.skin_weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)
    # back to plain locators
    back = skinned_locators_to_locators(schar)
    assert back.skinned_locators is None
    assert back.locators.num_locators == char.locators.num_locators


def test_floor_contact_constraints():
    char = create_test_character(4)
    rng = _rng()
    f = 20
    motion = np.zeros((f, char.num_model_parameters), np.float32)
    # root_ty oscillates: lowest 15% of frames are contacts
    motion[:, 1] = np.sin(np.linspace(0, 2 * np.pi, f)).astype(np.float32)
    contact, heights = compute_floor_contact_constraints(
        char, motion, floor_parents=[0], floor_offsets=[[0.0, 0.0, 0.0]],
        percentile=0.2)
    contact = np.asarray(contact)
    heights = np.asarray(heights)
    assert contact.shape == (f, 1)
    # contacts are exactly the frames at/below the 20th-percentile height
    k = int(0.2 * f)
    thresh = np.sort(heights[:, 0])[k]
    np.testing.assert_array_equal(contact[:, 0], heights[:, 0] <= thresh)
    assert 0 < contact.sum() < f
