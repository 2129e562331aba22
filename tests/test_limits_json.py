"""GLB round trip of parameter limits + pose constraints through the
FB_momentum document extension (reference: gltf_builder.cpp:1005-1007 writes
transform/parameterLimits/parameterSet/poseConstraints; JSON schemas at
io/common/json_utils.cpp:400-676 and :138-167)."""

import dataclasses

import numpy as np
import pytest

from momentum_tpu.character import Character
from momentum_tpu.character.limits import make_limits
from momentum_tpu.io.limits_json import (
    limits_from_json,
    limits_to_json,
    pose_constraints_from_json,
    pose_constraints_to_json,
)
from momentum_tpu.testing.fixtures import create_test_character

_FLT_MAX = float(np.finfo(np.float32).max)


def _full_limits_char():
    char = create_test_character(5)
    ellipsoid_mat = np.eye(4)
    ellipsoid_mat[:3, 3] = [1.0, 2.0, 3.0]
    limits = make_limits(
        minmax=[(0, -0.5, 0.5, 1.0), (2, -1.0, 2.0, 0.5)],
        minmax_joint=[(1, 3, -0.4, 0.4, 2.0, False),
                      (2, 4, -0.2, 0.3, 1.0, True)],
        linear=[(0, 1, 2.0, 0.25, -1.0, 1.0, 1.5),
                (1, 2, 0.5, 0.0, -_FLT_MAX, _FLT_MAX, 1.0)],
        linear_joint=[(1 * 7 + 3, 2 * 7 + 4, 1.5, -0.1,
                       -_FLT_MAX, _FLT_MAX, 0.75)],
        halfplane=[(0, 1, 0.6, 0.8, 0.1, 1.0)],
        ellipsoid=[(1, 0, [0.1, 0.2, 0.3], ellipsoid_mat, 1.0)],
    )
    pt = dataclasses.replace(
        char.parameter_transform,
        pose_constraints={"bind": ((0, 0.5), (1, -0.25))})
    return dataclasses.replace(char, limits=limits, parameter_transform=pt)


def _assert_limits_equal(a, b):
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6,
            err_msg=f.name)


def test_json_round_trip_all_types():
    char = _full_limits_char()
    j = limits_to_json(char)
    assert len(j) == 9
    assert {e["type"] for e in j} == {
        "minmax", "minmax_joint", "minmax_joint_passive", "linear",
        "linear_joint", "half_plane", "ellipsoid"}
    back = limits_from_json(char, j)
    _assert_limits_equal(char.limits, back)


def test_open_ranges_omitted():
    char = _full_limits_char()
    j = limits_to_json(char)
    open_linear = [e for e in j if e["type"] == "linear"
                   and e["referenceParameter"] ==
                   char.parameter_transform.names[1]]
    assert open_linear and "rangeMin" not in open_linear[0] \
        and "rangeMax" not in open_linear[0]


def test_unknown_names_skipped():
    char = _full_limits_char()
    j = [{"type": "minmax", "parameter": "not_a_param",
          "limits": [0, 1], "weight": 1.0},
         {"type": "minmax", "parameter": char.parameter_transform.names[0],
          "limits": [-1.0, 1.0], "weight": 2.0}]
    back = limits_from_json(char, j)
    assert back.minmax_index.shape[0] == 1


def test_pose_constraints_round_trip():
    char = _full_limits_char()
    j = pose_constraints_to_json(char)
    assert j == {"bind": {char.parameter_transform.names[0]: 0.5,
                          char.parameter_transform.names[1]: -0.25}}
    back = pose_constraints_from_json(char, j)
    assert back == {"bind": ((0, 0.5), (1, -0.25))}


def test_glb_round_trip(tmp_path):
    from momentum_tpu.io import load_character_glb, save_character_glb

    char = _full_limits_char()
    path = tmp_path / "limits.glb"
    save_character_glb(str(path), char)
    loaded, _, _ = load_character_glb(str(path))
    _assert_limits_equal(char.limits, loaded.limits)
    assert loaded.parameter_transform.pose_constraints == \
        char.parameter_transform.pose_constraints


def test_model_definition_pose_constraints():
    from momentum_tpu.io.model_definition import load_model_definition

    char = create_test_character(3)
    pnames = char.parameter_transform.names
    text = f"""[ParameterTransform]
{char.skeleton.joint_names[1]}.rx = 1.0 * {pnames[0]}
[PoseConstraints]
poseconstraint bind {pnames[0]} 0.5
"""
    pt, _ = load_model_definition(text, char.skeleton)
    assert pt.pose_constraints == {"bind": ((0, 0.5),)}


def test_limits_from_json_skips_ellipsoid_without_matrix():
    """Partial/hand-edited ellipsoid entries missing the matrix are skipped,
    per the documented skip-malformed-entries behavior, not thrown."""
    char = create_test_character(3)
    jn = char.skeleton.joint_names
    lim = limits_from_json(char, [
        {"type": "ellipsoid", "parent": jn[1], "ellipsoidParent": jn[0]},
        {"type": "minmax", "parameter": char.parameter_transform.names[0],
         "limits": [-1.0, 1.0], "weight": 1.0},
    ])
    assert lim.ellipsoid_parent.shape[0] == 0
    assert lim.minmax_index.shape[0] == 1
