"""SDF-based residual modules.

Reference:
  VertexSDFErrorFunction (vertex_sdf_error_function.cpp:240-265;
  kVertexSDFWeight = 5e-3, .h:36): per constraint vertex,
      f = sdf(worldVertex) − targetDistance
  with the SDF grid optionally attached to a joint (worldToSdfTransform).
  SdfCollisionErrorFunction (sdf_collision_error_function.cpp:452,578;
  kSDFCollisionWeight = 5e-3, .h:136): per tracked vertex,
      f = min(sdf(worldVertex), 0)  (penetration depth)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.axel.sdf import SignedDistanceField
from momentum_tpu.errors.base import EvalContext, VectorErrorFunction, pad_rows
from momentum_tpu.math import skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = ["VertexSdfErrorFunction", "SdfCollisionErrorFunction"]

K_VERTEX_SDF_WEIGHT = 5e-3  # vertex_sdf_error_function.h:36
K_SDF_COLLISION_WEIGHT = 5e-3  # sdf_collision_error_function.h:136


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexSdfErrorFunction(VectorErrorFunction):
    sdf: SignedDistanceField
    vertex_index: jnp.ndarray  # (C,)
    target_distance: jnp.ndarray  # (C,)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    # joint the SDF grid is attached to (−1 = world-fixed)
    sdf_parent: int = dataclasses.field(default=-1, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 1

    def constraint_count(self) -> int:
        return self.vertex_index.shape[0]

    def _to_sdf_space(self, ctx, points):
        if self.sdf_parent < 0:
            return points
        frame = ctx.skel_states[..., self.sdf_parent, :]
        return ss.transform_points(ss.inverse(frame), points)

    def raw(self, character, ctx: EvalContext):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        d = self.sdf.sample(self._to_sdf_space(ctx, v))
        f = (d - self.target_distance)[..., None]
        return f, self.cweight * K_VERTEX_SDF_WEIGHT

    @property
    def has_analytic_jacobian(self) -> bool:
        # the joint-attached-grid case adds an inverse-frame chain term;
        # it stays on the AD path
        return self.sdf_parent < 0

    def jacobian(self, character, ctx: EvalContext, jc):
        """∇φ(v)·(LBS vertex Jacobian): the trilinear gradient is exactly
        what AD of sample() produces (vertex_sdf_error_function.cpp:240-265
        gradient path over the skinning walk)."""
        from momentum_tpu.errors.vertex import _blend_model_columns
        from momentum_tpu.solver.analytic_jacobian import skinned_point_jacobian

        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        d = self.sdf.sample(v)
        f = d - self.target_distance
        scale = self._row_scale(self.cweight * K_VERTEX_SDF_WEIGHT, f * f)
        g = self.sdf.gradient(v)  # (..., C, 3)
        jv = skinned_point_jacobian(jc, character, ctx, self.vertex_index)
        rows = scale * f
        j_jp = scale[..., None] * jnp.einsum("...ci,...cij->...cj", g, jv)
        jb = _blend_model_columns(character, ctx, self.vertex_index,
                                  ctx.model_params.shape[-1])
        j_model = None if jb is None else scale[..., None] * jnp.einsum(
            "...ci,...cip->...cp", g, jb)
        return rows, j_jp, j_model

    @classmethod
    def create(cls, sdf, vertex_index, target_distance=None, cweight=None,
               weight=1.0, sdf_parent=-1, loss=None, capacity=None):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        if target_distance is None:
            target_distance = np.zeros(n, np.float32)
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            sdf=sdf,
            vertex_index=jnp.asarray(pad_rows(vertex_index, cap)),
            target_distance=jnp.asarray(pad_rows(np.asarray(target_distance, np.float32), cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            sdf_parent=sdf_parent,
            loss=loss or GeneralizedLoss(),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SdfCollisionErrorFunction(VectorErrorFunction):
    """Penetration penalty of tracked mesh vertices against a world SDF
    (e.g. environment geometry)."""

    sdf: SignedDistanceField
    vertex_index: jnp.ndarray
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 1

    def constraint_count(self) -> int:
        return self.vertex_index.shape[0]

    def raw(self, character, ctx: EvalContext):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        d = self.sdf.sample(v)
        f = jnp.minimum(d, 0.0)[..., None]
        return f, self.cweight * K_SDF_COLLISION_WEIGHT

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Penetration rows: gate·∇φ(v)·(LBS vertex Jacobian)
        (sdf_collision_error_function.cpp gradient path)."""
        from momentum_tpu.errors.vertex import _blend_model_columns
        from momentum_tpu.solver.analytic_jacobian import skinned_point_jacobian

        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        d = self.sdf.sample(v)
        f = jnp.minimum(d, 0.0)
        active = (d < 0).astype(d.dtype)
        scale = self._row_scale(self.cweight * K_SDF_COLLISION_WEIGHT, f * f)
        g = self.sdf.gradient(v)
        jv = skinned_point_jacobian(jc, character, ctx, self.vertex_index)
        coef = (scale * active)[..., None]
        rows = scale * f
        j_jp = coef * jnp.einsum("...ci,...cij->...cj", g, jv)
        jb = _blend_model_columns(character, ctx, self.vertex_index,
                                  ctx.model_params.shape[-1])
        j_model = None if jb is None else coef * jnp.einsum(
            "...ci,...cip->...cp", g, jb)
        return rows, j_jp, j_model

    @classmethod
    def create(cls, sdf, vertex_index, cweight=None, weight=1.0, loss=None, capacity=None):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            sdf=sdf,
            vertex_index=jnp.asarray(pad_rows(vertex_index, cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )
