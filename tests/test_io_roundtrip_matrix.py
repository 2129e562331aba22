"""IO round-trip matrix: character variants × formats.

The reference validates each format loader against bundled assets; this
sweeps OUR writers against OUR readers across the character-feature
combinations that exercise every optional section (mesh/skinning, locators,
collision, limits, physical bodies, blendshape rig), pinning skeleton
topology, rig matrices, and per-feature payloads through every format that
can carry them."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from momentum_tpu.character import Character, CollisionGeometry, Locators
from momentum_tpu.character.character import PhysicalProperties
from momentum_tpu.character.limits import make_limits
from momentum_tpu.testing.fixtures import create_test_character


def _base():
    return create_test_character(4)


def _with_locators(c):
    return dataclasses.replace(c, locators=Locators(
        parent=jnp.asarray([0, 2], jnp.int32),
        offset=jnp.asarray([[0.1, 0.2, 0.3], [-0.1, 0.0, 0.4]], jnp.float32),
        weight=jnp.asarray([1.0, 2.0], jnp.float32),
        names=("loc_a", "loc_b")))


def _with_collision(c):
    return dataclasses.replace(c, collision=CollisionGeometry(
        parent=jnp.asarray([1, 2], jnp.int32),
        transform=jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], jnp.float32),
                           (2, 1)),
        radius=jnp.asarray([[0.1, 0.15], [0.2, 0.2]], jnp.float32),
        length=jnp.asarray([0.5, 0.8], jnp.float32)))


def _with_limits(c):
    return dataclasses.replace(c, limits=make_limits(
        minmax=[(0, -0.5, 0.5, 1.0), (2, -1.0, 1.0, 2.0)],
        minmax_joint=[(1, 3, -0.7, 0.7, 1.0, 0)]))


def _with_bodies(c):
    return dataclasses.replace(c, physical_properties=PhysicalProperties(
        joint_index=jnp.asarray([1], jnp.int32),
        mass=jnp.asarray([2.5], jnp.float32),
        center_of_mass_offset=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        inertia=jnp.asarray([np.diag([1.0, 2.0, 3.0])], jnp.float32),
        inertia_rotation=jnp.asarray([[0, 0, 0, 1]], jnp.float32),
        joint_names=(c.skeleton.joint_names[1],)))


VARIANTS = {
    "base": _base,
    "locators": lambda: _with_locators(_base()),
    "collision": lambda: _with_collision(_base()),
    "limits": lambda: _with_limits(_base()),
    "bodies": lambda: _with_bodies(_base()),
    "everything": lambda: _with_bodies(_with_limits(_with_collision(
        _with_locators(_base())))),
}

# format → (save, load, carries) where carries lists the optional features
# the format preserves
FORMATS = {
    "glb": dict(ext=".glb",
                carries={"locators", "collision", "limits", "bodies",
                         "mesh"}),
    "usda": dict(ext=".usda",
                 carries={"locators", "collision", "mesh", "bodies"}),
    "usdc": dict(ext=".usdc",
                 carries={"locators", "collision", "mesh", "bodies"}),
    "fbx": dict(ext=".fbx", carries={"mesh", "bodies"}),
    "json": dict(ext=".json", carries={"locators"}),
}


def _save(path, character):
    from momentum_tpu.io import save_character

    save_character(str(path), character)


def _load(path):
    ext = str(path).rsplit(".", 1)[-1]
    if ext == "glb":
        from momentum_tpu.io import load_character_glb

        return load_character_glb(str(path))[0]
    if ext in ("usda", "usdc"):
        from momentum_tpu.io.usd import load_character

        return load_character(str(path))
    if ext == "fbx":
        from momentum_tpu.io import load_fbx

        return load_fbx(str(path))
    if ext == "json":
        from momentum_tpu.io import load_legacy_json

        return load_legacy_json(str(path))
    raise ValueError(ext)


@pytest.mark.parametrize("variant", sorted(VARIANTS))
@pytest.mark.parametrize("fmt", sorted(FORMATS))
def test_round_trip(variant, fmt, tmp_path):
    src = VARIANTS[variant]()
    spec = FORMATS[fmt]
    p = tmp_path / f"c{spec['ext']}"
    _save(p, src)
    out = _load(p)

    # skeleton topology always survives
    assert out.skeleton.joint_names == src.skeleton.joint_names
    np.testing.assert_array_equal(np.asarray(out.skeleton.joint_parent),
                                  np.asarray(src.skeleton.joint_parent))
    np.testing.assert_allclose(np.asarray(out.skeleton.translation_offset),
                               np.asarray(src.skeleton.translation_offset),
                               atol=1e-5)

    carries = spec["carries"]
    if "mesh" in carries and src.mesh is not None:
        assert out.mesh is not None
        assert out.mesh.num_vertices == src.mesh.num_vertices
        np.testing.assert_allclose(np.asarray(out.mesh.vertices),
                                   np.asarray(src.mesh.vertices), atol=1e-4)
    if "locators" in carries and src.locators is not None:
        assert out.locators is not None
        assert tuple(out.locators.names) == tuple(src.locators.names)
        np.testing.assert_array_equal(np.asarray(out.locators.parent),
                                      np.asarray(src.locators.parent))
        np.testing.assert_allclose(np.asarray(out.locators.offset),
                                   np.asarray(src.locators.offset), atol=1e-5)
    if "collision" in carries and src.collision is not None:
        assert out.collision is not None
        assert out.collision.parent.shape[0] == src.collision.parent.shape[0]
        np.testing.assert_allclose(np.asarray(out.collision.radius),
                                   np.asarray(src.collision.radius),
                                   atol=1e-5)
    if "limits" in carries and src.limits.minmax_index.shape[0]:
        assert out.limits.minmax_index.shape[0] == \
            src.limits.minmax_index.shape[0]
        np.testing.assert_allclose(np.asarray(out.limits.minmax_bounds),
                                   np.asarray(src.limits.minmax_bounds),
                                   atol=1e-5)
    if "bodies" in carries and src.physical_properties is not None:
        assert out.physical_properties is not None
        np.testing.assert_allclose(np.asarray(out.physical_properties.mass),
                                   np.asarray(src.physical_properties.mass),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.physical_properties.inertia),
            np.asarray(src.physical_properties.inertia), atol=1e-4)


@pytest.mark.parametrize("fmt", ["glb", "usda", "usdc", "fbx"])
def test_motion_round_trip(fmt, tmp_path):
    from momentum_tpu.io import save_character

    src = _base()
    motion = np.random.default_rng(0).normal(
        0, 0.1, (3, src.num_model_parameters)).astype(np.float32)
    p = tmp_path / f"m.{fmt}"
    save_character(str(p), src, motion=motion, fps=30.0)
    if fmt == "glb":
        from momentum_tpu.io import load_character_glb

        _, m2, fps = load_character_glb(str(p))
        np.testing.assert_allclose(np.asarray(m2), motion, atol=1e-5)
        assert fps == 30.0
    elif fmt in ("usda", "usdc"):
        from momentum_tpu.io.usd import load_character_with_motion

        _, m2, _, fps = load_character_with_motion(str(p))
        np.testing.assert_allclose(np.asarray(m2), motion, atol=1e-4)
        assert fps == 30.0
    else:
        from momentum_tpu.io import load_fbx_with_motion

        _, jp, _ = load_fbx_with_motion(str(p), fps=30.0)
        expected = np.asarray(src.parameter_transform.apply(
            jnp.asarray(motion)))
        np.testing.assert_allclose(np.asarray(jp), expected, atol=2e-3)
