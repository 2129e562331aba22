"""App-level plumbing (marker_tracking/app_utils.{h,cpp}).

`load_character_with_identity` mirrors the reference helper used by the CLI
apps: load a character (GLB/FBX/URDF by extension), optionally override the
rig from a .model/.cfg definition, and optionally bake a calibrated identity
(a saved parameter vector: .mmo first frame or a JSON list) into the default
pose so per-frame tracking solves only pose parameters.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["load_character", "load_character_with_identity"]


def load_character(path):
    import momentum_tpu.io as mio

    ext = os.path.splitext(path)[1].lower()
    if ext == ".glb":
        character, _, _ = mio.load_character_glb(path)
        return character
    if ext == ".fbx":
        return mio.load_fbx(path)
    if ext == ".urdf":
        return mio.load_urdf(path)
    if ext == ".usda":
        character, _ = mio.load_usda(path)
        return character
    raise ValueError(f"unsupported character format: {ext}")


def load_character_with_identity(character_path, model_path=None, identity_path=None):
    """→ (character, identity params (P,) jnp array)."""
    import dataclasses

    import jax.numpy as jnp

    import momentum_tpu.io as mio

    character = load_character(character_path)
    if model_path:
        pt, limits = mio.load_model_definition(model_path, character.skeleton)
        character = dataclasses.replace(
            character, parameter_transform=pt, limits=limits)

    p = character.num_model_parameters
    identity = jnp.zeros(p)
    if identity_path:
        ext = os.path.splitext(identity_path)[1].lower()
        if ext == ".mmo":
            poses, _, names, _ = mio.load_mmo(identity_path)
            name_idx = {n: i for i, n in enumerate(character.parameter_transform.names)}
            vec = np.zeros(p, np.float32)
            for i, n in enumerate(names):
                if n in name_idx:
                    vec[name_idx[n]] = poses[0, i]
            identity = jnp.asarray(vec)
        elif ext == ".json":
            with open(identity_path) as f:
                data = json.load(f)
            if isinstance(data, dict):
                name_idx = {n: i for i, n in enumerate(character.parameter_transform.names)}
                vec = np.zeros(p, np.float32)
                for n, v in data.items():
                    if n in name_idx:
                        vec[name_idx[n]] = v
                identity = jnp.asarray(vec)
            else:
                identity = jnp.asarray(np.asarray(data, np.float32)[:p])
        else:
            raise ValueError(f"unsupported identity format: {ext}")
    return character, identity
