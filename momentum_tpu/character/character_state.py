"""CharacterState: one fully-posed character snapshot.

Reference: character/character_state.{h,cpp} CharacterStateT — skeleton state
+ locator state + posed mesh + posed collision geometry for a given parameter
vector. Used by viewers, exporters, and anything that needs "the character at
this pose" without re-running each pipeline piece.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["CharacterState", "character_state"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CharacterState:
    """Posed snapshot (character_state.h): every field already in world space.

    collision_* follow collision_geometry_state.h's SoA layout."""

    model_parameters: jnp.ndarray  # (P,)
    joint_parameters: jnp.ndarray  # (nJ*7,)
    skeleton_state: jnp.ndarray  # (nJ, 8) global skel states
    locator_positions: Optional[jnp.ndarray] = None  # (L, 3)
    mesh_vertices: Optional[jnp.ndarray] = None  # (V, 3)
    mesh_normals: Optional[jnp.ndarray] = None  # (V, 3)
    collision_origin: Optional[jnp.ndarray] = None  # (C, 3)
    collision_direction: Optional[jnp.ndarray] = None  # (C, 3)
    collision_radius: Optional[jnp.ndarray] = None  # (C, 2)


def character_state(character, model_parameters: jnp.ndarray,
                    update_mesh: bool = True,
                    update_collision: bool = True) -> CharacterState:
    """Pose everything once (CharacterStateT ctor, character_state.cpp):
    FK → locators → LBS mesh (+ blendshapes if parameters drive them) →
    collision state. Jit/vmap-friendly."""
    jp = character.joint_parameters(model_parameters)
    from momentum_tpu.character import fk

    states = fk.global_skel_states(character.skeleton, jp)
    locs = None
    if character.locators is not None:
        locs = character.locators.world_positions(states)

    mesh_v = mesh_n = None
    if update_mesh and character.mesh is not None \
            and character.skin_weights is not None:
        from momentum_tpu.character.skinning import skin_points, update_normals

        rest = character.mesh.vertices
        if character.blend_shape is not None \
                and character.blend_shape_param_index:
            import numpy as np

            coeffs = model_parameters[
                ..., np.asarray(character.blend_shape_param_index)]
            rest = character.blend_shape.apply(coeffs)
        mesh_v = skin_points(character.skin_weights, states,
                             character.inverse_bind_pose, rest)
        mesh_n = update_normals(mesh_v, character.mesh.faces)

    co = cd = cr = None
    if update_collision and character.collision is not None:
        from momentum_tpu.errors.collision import capsule_states

        co, cd, cr = capsule_states(character.collision, states)

    return CharacterState(
        model_parameters=model_parameters,
        joint_parameters=jp,
        skeleton_state=states,
        locator_positions=locs,
        mesh_vertices=mesh_v,
        mesh_normals=mesh_n,
        collision_origin=co,
        collision_direction=cd,
        collision_radius=cr,
    )
