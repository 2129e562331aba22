"""load_full_character / save_character dispatch (character_io.h)."""

import dataclasses
import json

import numpy as np
import pytest

from momentum_tpu.io.character_io import (
    character_format,
    load_full_character,
    save_character,
)
from momentum_tpu.testing.fixtures import create_test_character


def test_character_format():
    assert character_format("a.glb") == "gltf"
    assert character_format("a.GLTF") == "gltf"
    assert character_format("b.fbx") == "fbx"
    assert character_format("c.usda") == "usd"
    assert character_format("d.urdf") == "urdf"
    assert character_format("x.xyz") == "unknown"


@pytest.mark.parametrize("ext", [".glb", ".fbx", ".usda"])
def test_save_load_round_trip(tmp_path, ext):
    char = create_test_character(4)
    path = str(tmp_path / f"char{ext}")
    save_character(path, char)
    loaded = load_full_character(path)
    assert loaded.skeleton.joint_names == char.skeleton.joint_names
    np.testing.assert_allclose(
        np.asarray(loaded.skeleton.translation_offset),
        np.asarray(char.skeleton.translation_offset), atol=1e-5)


def test_sidecar_parameters_and_locators(tmp_path):
    char = create_test_character(4)
    glb = str(tmp_path / "char.glb")
    save_character(glb, char)

    jn = char.skeleton.joint_names
    model_txt = f"""[ParameterTransform]
{jn[1]}.rx = 1.0 * bend
{jn[2]}.rx = 0.5 * bend
[ParameterLimits]
limit bend minmax [-0.25, 0.75]
"""
    params = tmp_path / "char.model"
    params.write_text(model_txt)

    locators = tmp_path / "char.locators"
    locators.write_text(json.dumps({"locators": [
        {"name": "tip", "parentName": jn[-1], "offsetX": 1.0, "weight": 2.0},
    ]}))

    loaded = load_full_character(glb, str(params), str(locators))
    assert loaded.parameter_transform.names == ("bend",)
    assert loaded.limits is not None and loaded.limits.minmax_index.shape[0] == 1
    assert loaded.locators.names == ("tip",)
    assert int(loaded.locators.parent[0]) == len(jn) - 1


def test_unknown_formats_raise(tmp_path):
    char = create_test_character(3)
    with pytest.raises(ValueError, match="unsupported"):
        load_full_character(str(tmp_path / "nope.xyz"))
    with pytest.raises(ValueError, match="unsupported"):
        save_character(str(tmp_path / "nope.xyz"), char)


def test_loaders_accept_bytes(tmp_path):
    """GLB/FBX loaders take raw bytes too (the reference's *_from_bytes
    variants, character_pybind.cpp)."""
    from momentum_tpu.io import (
        load_character_glb, load_fbx, save_character_glb, save_fbx,
    )

    char = create_test_character(3)
    g = tmp_path / "c.glb"
    save_character_glb(str(g), char)
    from_bytes, _, _ = load_character_glb(g.read_bytes())
    assert from_bytes.skeleton.joint_names == char.skeleton.joint_names

    f = tmp_path / "c.fbx"
    save_fbx(str(f), char)
    assert load_fbx(f.read_bytes()).skeleton.joint_names \
        == char.skeleton.joint_names
