"""`.locators` JSON IO round trips (reference: io/skeleton/locator_io.cpp,
schema validated by io_locators_test.cpp)."""

import dataclasses
import json

import numpy as np
import pytest

from momentum_tpu.character import Locators
from momentum_tpu.io.locators import (
    load_locators,
    locators_to_json,
    save_locators,
)
from momentum_tpu.math import skel_state as ss
from momentum_tpu.testing.fixtures import create_test_character


def _char_with_locators():
    char = create_test_character(4)
    loc = Locators(
        parent=np.asarray([0, 1, 3], np.int32),
        offset=np.asarray([[0.1, 0.2, 0.3], [0.0, -0.5, 0.0],
                           [1.0, 0.0, 0.25]], np.float32),
        weight=np.asarray([1.0, 2.0, 0.5], np.float32),
        names=("l_root", "l_mid", "l_tip"),
        locked=np.asarray([[1, 0, 0], [0, 0, 0], [1, 1, 1]], np.float32),
        limit_weight=np.asarray([[0.0, 0.0, 0.0], [2.5, 0.0, 0.0],
                                 [0.0, 1.0, 0.5]], np.float32),
        limit_origin=np.asarray([[0.1, 0.2, 0.3], [0.0, -0.5, 0.0],
                                 [1.0, 0.0, 0.25]], np.float32),
        attached_to_skin=np.asarray([0.0, 1.0, 0.0], np.float32),
        skin_offset=np.asarray([0.0, 0.75, 0.0], np.float32),
    )
    return dataclasses.replace(char, locators=loc)


def test_local_round_trip(tmp_path):
    char = _char_with_locators()
    path = str(tmp_path / "char.locators")
    save_locators(path, char)
    loaded = load_locators(path, char)

    src = char.locators
    assert loaded.names == src.names
    np.testing.assert_array_equal(np.asarray(loaded.parent),
                                  np.asarray(src.parent))
    np.testing.assert_allclose(np.asarray(loaded.offset),
                               np.asarray(src.offset), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.weight),
                               np.asarray(src.weight), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(loaded.locked),
                                  np.asarray(src.locked))
    np.testing.assert_allclose(np.asarray(loaded.limit_weight),
                               np.asarray(src.limit_weight), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.attached_to_skin),
                               np.asarray(src.attached_to_skin), atol=0)
    np.testing.assert_allclose(np.asarray(loaded.skin_offset),
                               np.asarray(src.skin_offset), atol=1e-6)
    # limitOrigin resets to the loaded offset (locator_io.cpp:197)
    np.testing.assert_allclose(np.asarray(loaded.limit_origin),
                               np.asarray(loaded.offset), atol=0)


def test_global_space_round_trip(tmp_path):
    """Saving in global space then loading converts back through the
    bind-pose skeleton state (locator_io.cpp:180-187, 225-233)."""
    char = _char_with_locators()
    path = str(tmp_path / "glob.locators")
    save_locators(path, char, space="global")
    with open(path) as f:
        doc = json.load(f)
    assert "globalX" in doc["locators"][0]
    assert "offsetX" not in doc["locators"][0]

    loaded = load_locators(path, char)
    np.testing.assert_allclose(np.asarray(loaded.offset),
                               np.asarray(char.locators.offset), atol=1e-4)


def test_parent_name_resolution_and_skipping():
    char = _char_with_locators()
    jn = char.skeleton.joint_names
    doc = {"locators": [
        {"name": "a", "parentName": jn[2], "offsetX": 1.0},
        {"name": "orphan", "parentName": "nope"},
        {"name": "b", "parent": 1, "offsetY": -2.0},
    ]}
    loaded = load_locators(json.dumps(doc), char)
    assert loaded.names == ("a", "b")
    np.testing.assert_array_equal(np.asarray(loaded.parent), [2, 1])
    np.testing.assert_allclose(np.asarray(loaded.offset),
                               [[1.0, 0.0, 0.0], [0.0, -2.0, 0.0]], atol=0)


def test_duplicate_names_raise():
    char = _char_with_locators()
    doc = {"locators": [
        {"name": "dup", "parent": 0}, {"name": "dup", "parent": 1}]}
    with pytest.raises(ValueError, match="dup"):
        load_locators(json.dumps(doc), char)


def test_zero_limit_weights_omitted(tmp_path):
    char = _char_with_locators()
    doc = locators_to_json(char)
    first = doc["locators"][0]  # limit weights all zero for l_root
    assert "limitWeightX" not in first and "limitWeightY" not in first
    third = doc["locators"][2]
    assert third["limitWeightY"] == pytest.approx(1.0)
    assert "limitWeightX" not in third
    assert "attachedToSkin" not in first
    assert doc["locators"][1]["attachedToSkin"] == 1
    assert doc["locators"][1]["skinOffset"] == pytest.approx(0.75)


def test_locator_fields_survive_remove_joints():
    """remove_joints remaps the optional lock/limit/skin columns too."""
    from momentum_tpu.character.utility import remove_joints

    char = _char_with_locators()
    out = remove_joints(char, ["joint3"])  # drops locator l_tip (parent 3)
    loc = out.locators
    assert loc.names == ("l_root", "l_mid")
    np.testing.assert_array_equal(np.asarray(loc.locked),
                                  np.asarray(char.locators.locked)[:2])
    np.testing.assert_allclose(np.asarray(loc.skin_offset),
                               np.asarray(char.locators.skin_offset)[:2],
                               atol=0)
