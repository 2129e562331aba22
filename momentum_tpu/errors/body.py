"""Body-level residual modules: floor, height, center of mass.

Reference forms (momentum/character_solver/):
  FloorErrorFunction (floor_error_function.cpp:63-122):
      avg = mean of the k lowest up-axis projections of tracked mesh vertices
      f = avg − targetHeight                                     (1 row)
      (soft top-k on TPU: jax.lax.top_k on negated projections)
  CenterOfMassErrorFunction (center_of_mass_error_function.cpp:37-79,162-179):
      com = Σ mᵢ·worldPos(jointᵢ, offsetᵢ) / Σ mᵢ
      f = com − target, optionally projected to a plane first    (3 rows)
  HeightErrorFunction (height_error_function.cpp:200-220):
      height = extent of the (active-params-only) posed mesh along the up axis;
      f = height − target. Simplified here: height measured on the current
      posed mesh (max−min up-projection) — the reference's separate
      active-only FK is a solver-level masking concern handled by the
      enabled-parameter mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import ErrorFunction, EvalContext
from momentum_tpu.math import skel_state as ss

__all__ = ["FloorErrorFunction", "CenterOfMassErrorFunction", "HeightErrorFunction"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FloorErrorFunction(ErrorFunction):
    vertex_index: jnp.ndarray  # (V',) tracked vertices
    up_direction: jnp.ndarray  # (3,)
    target_height: jnp.ndarray  # scalar
    weight: jnp.ndarray
    k: int = dataclasses.field(default=10, metadata=dict(static=True))

    needs_mesh = True

    def _avg_min(self, ctx):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        proj = jnp.einsum("...vi,i->...v", v, self.up_direction)
        k = min(self.k, self.vertex_index.shape[0])
        lowest = -jax.lax.top_k(-proj, k)[0]
        return jnp.mean(lowest, axis=-1)

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        diff = self._avg_min(ctx) - self.target_height
        return self.weight * diff * diff

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        diff = self._avg_min(ctx) - self.target_height
        return (jnp.sqrt(jnp.maximum(self.weight, 0.0)) * diff)[..., None]

    def num_rows(self) -> int:
        return 1

    @classmethod
    def create(cls, vertex_index, up_direction=(0.0, 1.0, 0.0), target_height=0.0,
               weight=1.0, k=10):
        return cls(
            vertex_index=jnp.asarray(vertex_index, jnp.int32),
            up_direction=jnp.asarray(up_direction, jnp.float32),
            target_height=jnp.asarray(target_height, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
            k=k,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CenterOfMassErrorFunction(ErrorFunction):
    joint_index: jnp.ndarray  # (J',) int32
    masses: jnp.ndarray  # (J',)
    offsets: jnp.ndarray  # (J', 3) local CoM offsets (zeros = joint origins)
    target: jnp.ndarray  # (3,)
    projection_normal: jnp.ndarray  # (3,) used when project_to_plane
    projection_d: jnp.ndarray  # scalar
    weight: jnp.ndarray
    project_to_plane: bool = dataclasses.field(default=False, metadata=dict(static=True))

    def _com(self, ctx):
        states = jnp.take(ctx.skel_states, self.joint_index, axis=-2)
        pos = ss.transform_points(states, self.offsets)
        total = jnp.sum(self.masses)
        return jnp.einsum("...ji,j->...i", pos, self.masses) / total

    def raw_residual(self, ctx):
        com = self._com(ctx)
        if self.project_to_plane:
            com = com - self.projection_normal * (
                jnp.einsum("...i,i->...", com, self.projection_normal) - self.projection_d
            )[..., None]
        return com - self.target

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        r = self.raw_residual(ctx)
        return self.weight * jnp.sum(r * r, axis=-1)

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        r = self.raw_residual(ctx)
        return jnp.sqrt(jnp.maximum(self.weight, 0.0)) * r

    def num_rows(self) -> int:
        return 3

    @classmethod
    def create(cls, joint_index, masses, target, offsets=None, weight=1.0,
               projection_normal=(0.0, 1.0, 0.0), projection_d=0.0, project_to_plane=False):
        joint_index = np.asarray(joint_index, np.int32)
        if offsets is None:
            offsets = np.zeros((joint_index.shape[0], 3), np.float32)
        return cls(
            joint_index=jnp.asarray(joint_index),
            masses=jnp.asarray(masses, jnp.float32),
            offsets=jnp.asarray(offsets, jnp.float32),
            target=jnp.asarray(target, jnp.float32),
            projection_normal=jnp.asarray(projection_normal, jnp.float32),
            projection_d=jnp.asarray(projection_d, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
            project_to_plane=project_to_plane,
        )

    @classmethod
    def from_physical_properties(cls, character, target, **kw):
        """COM constraint driven by the character's per-joint mass bodies
        (character.h:66 physicalProperties; each body contributes its mass at
        its local COM offset, center_of_mass_error_function.cpp:46)."""
        pp = character.physical_properties
        if pp is None or pp.num_bodies == 0:
            raise ValueError("character has no physical properties")
        return cls.create(np.asarray(pp.joint_index), np.asarray(pp.mass),
                          target, offsets=np.asarray(pp.center_of_mass_offset),
                          **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeightErrorFunction(ErrorFunction):
    up_direction: jnp.ndarray  # (3,)
    target_height: jnp.ndarray  # scalar
    weight: jnp.ndarray

    needs_mesh = True

    def _height(self, ctx):
        proj = jnp.einsum("...vi,i->...v", ctx.mesh_vertices, self.up_direction)
        return jnp.max(proj, axis=-1) - jnp.min(proj, axis=-1)

    def error(self, character, ctx: EvalContext) -> jnp.ndarray:
        diff = self._height(ctx) - self.target_height
        return self.weight * diff * diff

    def residual(self, character, ctx: EvalContext) -> jnp.ndarray:
        diff = self._height(ctx) - self.target_height
        return (jnp.sqrt(jnp.maximum(self.weight, 0.0)) * diff)[..., None]

    def num_rows(self) -> int:
        return 1

    @classmethod
    def create(cls, target_height, up_direction=(0.0, 1.0, 0.0), weight=1.0):
        return cls(
            up_direction=jnp.asarray(up_direction, jnp.float32),
            target_height=jnp.asarray(target_height, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
        )
