"""Vertex (mesh) residual modules — require the posed mesh in the EvalContext
(the reference's MeshState, mesh_state.h:28-71: neutral → blendshapes →
rest → LBS → posed, recomputed once per solver evaluation).

Reference forms (momentum/character_solver/):
  VertexPositionErrorFunction (vertex_position_error_function.cpp:35-49):
      f = posedVertex − target                                  (3 rows)
  VertexPlaneErrorFunction (vertex_plane_error_function.cpp:32-71):
      n' = n flipped toward the posed mesh normal;
      f = (v − point)·n', clamped to 0 above the plane if `above` (1 row)
  VertexNormalErrorFunction (vertex_normal_error_function.cpp:43-80,160-176):
      n = srcW·meshNormal + tgtW·(targetNormal sign-matched to meshNormal)
      f = n·(v − targetPosition)                                 (1 row)
  VertexProjectionErrorFunction (vertex_projection_error_function.cpp:28-60):
      q = P·hom(v); f = q.xy/q.z − target for q.z ≥ 1            (2 rows)

kLegacyWeight = 1e-4 for position/plane/normal leaves
(vertex_error_function.h:69-70) — callers apply it through `weight` exactly as
in the reference's setWeight compatibility path; it is not baked in here.

Derivatives: JAX AD differentiates through skinning AND through the posed mesh
normals (update_normals), subsuming the reference's hand-written
normal-rotation correction terms (skeleton_derivative.h:233-235).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import EvalContext, VectorErrorFunction, pad_rows
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = [
    "VertexPositionErrorFunction",
    "VertexPlaneErrorFunction",
    "VertexNormalErrorFunction",
    "VertexProjectionErrorFunction",
]


def _pad_fields(cap, **arrays):
    return {k: jnp.asarray(pad_rows(v, cap)) for k, v in arrays.items()}


def _blend_model_columns(character, ctx, vertex_index, p):
    """d(posed vertex)/d(model params) restricted to blendshape +
    face-expression columns: the skinning linear map applied to each basis
    delta, scattered into model space. (..., C, 3, P) or None."""
    out = None
    from momentum_tpu.solver.analytic_jacobian import skinned_blend_jacobian

    for basis, pidx in (
            (character.blend_shape, character.blend_shape_param_index),
            (character.face_expression_blend_shape,
             character.face_expression_param_index)):
        if basis is None or not pidx:
            continue
        jb = skinned_blend_jacobian(character, ctx, vertex_index, basis)
        cols = np.asarray(pidx, np.int64)
        sel = np.zeros((len(cols), p), np.float32)
        sel[np.arange(len(cols)), cols] = 1.0
        jm = jnp.einsum("...cib,bp->...cip", jb, jnp.asarray(sel))
        out = jm if out is None else out + jm
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexPositionErrorFunction(VectorErrorFunction):
    vertex_index: jnp.ndarray  # (C,) int32
    target: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 3

    def constraint_count(self) -> int:
        return self.vertex_index.shape[0]

    def raw(self, character, ctx: EvalContext):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        return v - self.target, self.cweight

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """LBS skinning-walk rows (skeleton_derivative vertex position path):
        joint columns from the per-influence rigid point Jacobians, blendshape
        columns from the skinning linear map applied to the basis."""
        from momentum_tpu.solver.analytic_jacobian import (
            skinned_blend_jacobian, skinned_point_jacobian,
        )

        f, wrow = self.raw(character, ctx)
        sq = jnp.sum(f * f, axis=-1)
        scale = self._row_scale(wrow, sq)
        j_jp = skinned_point_jacobian(jc, character, ctx, self.vertex_index)
        rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
        j_jp = (scale[..., None, None] * j_jp).reshape(
            j_jp.shape[:-3] + (rows.shape[-1], j_jp.shape[-1]))
        j_model = None
        p = ctx.model_params.shape[-1]

        def shape_columns(basis, param_index):
            jb = skinned_blend_jacobian(character, ctx, self.vertex_index,
                                        basis)
            if jb is None:
                return None
            jb = (scale[..., None, None] * jb).reshape(
                jb.shape[:-3] + (rows.shape[-1], jb.shape[-1]))
            cols = np.asarray(param_index, np.int64)
            sel = np.zeros((len(cols), p), np.float32)
            sel[np.arange(len(cols)), cols] = 1.0
            return jnp.einsum("...rb,bp->...rp", jb, jnp.asarray(sel))

        if character.blend_shape is not None \
                and character.blend_shape_param_index:
            j_model = shape_columns(character.blend_shape,
                                    character.blend_shape_param_index)
        if character.face_expression_blend_shape is not None \
                and character.face_expression_param_index:
            jf = shape_columns(character.face_expression_blend_shape,
                               character.face_expression_param_index)
            j_model = jf if j_model is None else j_model + jf
        return rows, j_jp, j_model

    @classmethod
    def create(cls, vertex_index, target, cweight=None, weight=1.0, loss=None, capacity=None):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(cap, vertex_index=vertex_index,
                        target=np.asarray(target, np.float32).reshape(n, 3), cweight=cweight)
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexPlaneErrorFunction(VectorErrorFunction):
    vertex_index: jnp.ndarray
    point: jnp.ndarray  # (C, 3) point on plane
    normal: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    above: bool = dataclasses.field(default=False, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 1

    def constraint_count(self) -> int:
        return self.vertex_index.shape[0]

    def raw(self, character, ctx: EvalContext):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        mesh_n = jnp.take(ctx.mesh_normals, self.vertex_index, axis=-2)
        flip = jnp.sum(mesh_n * self.normal, axis=-1, keepdims=True) < 0
        n = jnp.where(flip, -self.normal, self.normal)
        dist = jnp.sum((v - self.point) * n, axis=-1)
        if self.above:
            dist = jnp.minimum(dist, 0.0)
        return dist[..., None], self.cweight

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Point-to-plane rows: nᵀ · (LBS vertex Jacobian). The mesh normal
        only orients the sign (treated constant, as upstream does for the
        flip) and the `above` gate zeroes inactive rows."""
        from momentum_tpu.solver.analytic_jacobian import (
            skinned_blend_jacobian, skinned_point_jacobian,
        )

        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        mesh_n = jnp.take(ctx.mesh_normals, self.vertex_index, axis=-2)
        flip = jnp.sum(mesh_n * self.normal, axis=-1, keepdims=True) < 0
        n = jnp.where(flip, -self.normal, self.normal)
        dist = jnp.sum((v - self.point) * n, axis=-1)
        gate = jnp.ones_like(dist)
        if self.above:
            gate = (dist < 0).astype(dist.dtype)
            dist = jnp.minimum(dist, 0.0)
        sq = dist * dist
        scale = self._row_scale(self.cweight, sq)
        jv = skinned_point_jacobian(jc, character, ctx, self.vertex_index)
        rows = scale * dist
        coef = (scale * gate)[..., None]
        j_jp = coef * jnp.einsum("...ci,...cij->...cj", n, jv)
        j_model = None
        p = ctx.model_params.shape[-1]
        for basis, pidx in (
                (character.blend_shape, character.blend_shape_param_index),
                (character.face_expression_blend_shape,
                 character.face_expression_param_index)):
            if basis is None or not pidx:
                continue
            jb = skinned_blend_jacobian(character, ctx, self.vertex_index,
                                        basis)
            cols = np.asarray(pidx, np.int64)
            sel = np.zeros((len(cols), p), np.float32)
            sel[np.arange(len(cols)), cols] = 1.0
            jm = coef * jnp.einsum(
                "...ci,...cib,bp->...cp", n, jb, jnp.asarray(sel))
            j_model = jm if j_model is None else j_model + jm
        return rows, j_jp, j_model

    @classmethod
    def create(cls, vertex_index, point, normal, cweight=None, weight=1.0, above=False,
               loss=None, capacity=None):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(cap, vertex_index=vertex_index,
                        point=np.asarray(point, np.float32).reshape(n, 3),
                        normal=np.asarray(normal, np.float32).reshape(n, 3), cweight=cweight)
        return cls(weight=jnp.asarray(weight, jnp.float32), above=above,
                   loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexNormalErrorFunction(VectorErrorFunction):
    vertex_index: jnp.ndarray
    target_position: jnp.ndarray  # (C, 3)
    target_normal: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    source_normal_weight: float = dataclasses.field(default=0.5, metadata=dict(static=True))
    target_normal_weight: float = dataclasses.field(default=0.5, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 1

    def constraint_count(self) -> int:
        return self.vertex_index.shape[0]

    def raw(self, character, ctx: EvalContext):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        src_n = jnp.take(ctx.mesh_normals, self.vertex_index, axis=-2)
        flip = jnp.sum(src_n * self.target_normal, axis=-1, keepdims=True) < 0
        tgt_n = jnp.where(flip, -self.target_normal, self.target_normal)
        n = self.source_normal_weight * src_n + self.target_normal_weight * tgt_n
        f = jnp.sum(n * (v - self.target_position), axis=-1, keepdims=True)
        return f, self.cweight

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Point-to-plane rows over the LBS walk plus the normal-rotation
        correction (the reference's combined gradient+normal walk,
        skeleton_derivative.h:233-235): the source normal is treated as
        rigidly rotating with its skinning frames,
            d f = nᵀ·dv + w_src·(v − tgt)ᵀ·d(src_n),
        which captures the first-order normal motion without re-deriving it
        from face areas (that exact derivative couples all fan vertices)."""
        from momentum_tpu.solver.analytic_jacobian import (
            skinned_point_jacobian, skinned_vector_jacobian,
        )

        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        src_n = jnp.take(ctx.mesh_normals, self.vertex_index, axis=-2)
        flip = jnp.sum(src_n * self.target_normal, axis=-1, keepdims=True) < 0
        tgt_n = jnp.where(flip, -self.target_normal, self.target_normal)
        n = self.source_normal_weight * src_n + self.target_normal_weight * tgt_n
        diff = v - self.target_position
        dist = jnp.sum(n * diff, axis=-1)
        scale = self._row_scale(self.cweight, dist * dist)
        jv = skinned_point_jacobian(jc, character, ctx, self.vertex_index)
        rows = scale * dist
        j_jp = jnp.einsum("...ci,...cij->...cj", n, jv)
        if self.source_normal_weight != 0.0:
            jn = skinned_vector_jacobian(jc, character, ctx,
                                         self.vertex_index, src_n)
            j_jp = j_jp + self.source_normal_weight * jnp.einsum(
                "...ci,...cij->...cj", diff, jn)
        j_jp = scale[..., None] * j_jp
        jb = _blend_model_columns(character, ctx, self.vertex_index,
                                  ctx.model_params.shape[-1])
        j_model = None if jb is None else scale[..., None] * jnp.einsum(
            "...ci,...cip->...cp", n, jb)
        return rows, j_jp, j_model

    @classmethod
    def create(cls, vertex_index, target_position, target_normal, cweight=None, weight=1.0,
               source_normal_weight=0.5, target_normal_weight=0.5, loss=None, capacity=None):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(cap, vertex_index=vertex_index,
                        target_position=np.asarray(target_position, np.float32).reshape(n, 3),
                        target_normal=np.asarray(target_normal, np.float32).reshape(n, 3),
                        cweight=cweight)
        return cls(weight=jnp.asarray(weight, jnp.float32),
                   source_normal_weight=source_normal_weight,
                   target_normal_weight=target_normal_weight,
                   loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexProjectionErrorFunction(VectorErrorFunction):
    vertex_index: jnp.ndarray
    projection: jnp.ndarray  # (C, 3, 4)
    target: jnp.ndarray  # (C, 2)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    near_clip: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 2

    def constraint_count(self) -> int:
        return self.vertex_index.shape[0]

    def raw(self, character, ctx: EvalContext):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        q = jnp.einsum("...ij,...j->...i", self.projection[..., :3], v) + self.projection[..., 3]
        z = q[..., 2:3]
        valid = z[..., 0] >= self.near_clip
        f = q[..., :2] / jnp.where(jnp.abs(z) > 1e-16, z, 1.0) - self.target
        return jnp.where(valid[..., None], f, 0.0), self.cweight

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Exact pinhole chain rule over the LBS walk
        (vertex_projection_error_function.cpp): with q = P·[v;1],
        d(q_xy/q_z)/dv = P[:2,:3]/z − (q_xy/z²)·P[2,:3], composed with the
        per-influence rigid point Jacobians (+ blendshape columns)."""
        from momentum_tpu.solver.analytic_jacobian import skinned_point_jacobian

        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        q = jnp.einsum("...ij,...j->...i", self.projection[..., :3], v) \
            + self.projection[..., 3]
        z = q[..., 2:3]
        valid = (z[..., 0] >= self.near_clip)
        zsafe = jnp.where(jnp.abs(z) > 1e-16, z, 1.0)
        f = q[..., :2] / zsafe - self.target
        f = jnp.where(valid[..., None], f, 0.0)
        sq = jnp.sum(f * f, axis=-1)
        scale = self._row_scale(self.cweight, sq)
        gate = (scale * valid.astype(scale.dtype))[..., None, None]
        # df/dv: (..., C, 2, 3)
        dfdv = self.projection[..., :2, :3] / zsafe[..., None] \
            - (q[..., :2] / (zsafe * zsafe))[..., None] \
            * self.projection[..., 2:3, :3]
        dfdv = gate * dfdv
        jv = skinned_point_jacobian(jc, character, ctx, self.vertex_index)
        rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
        j_jp = jnp.einsum("...cdi,...cij->...cdj", dfdv, jv)
        j_jp = j_jp.reshape(j_jp.shape[:-3] + (rows.shape[-1], jv.shape[-1]))
        jb = _blend_model_columns(character, ctx, self.vertex_index,
                                  ctx.model_params.shape[-1])
        j_model = None
        if jb is not None:
            j_model = jnp.einsum("...cdi,...cip->...cdp", dfdv, jb)
            j_model = j_model.reshape(
                j_model.shape[:-3] + (rows.shape[-1], jb.shape[-1]))
        return rows, j_jp, j_model

    @classmethod
    def create(cls, vertex_index, projection, target, cweight=None, weight=1.0,
               near_clip=1.0, loss=None, capacity=None):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(cap, vertex_index=vertex_index,
                        projection=np.asarray(projection, np.float32).reshape(n, 3, 4),
                        target=np.asarray(target, np.float32).reshape(n, 2), cweight=cweight)
        return cls(weight=jnp.asarray(weight, jnp.float32), near_clip=near_clip,
                   loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointTriangleVertexErrorFunction(VectorErrorFunction):
    """Mesh vertex constrained to a barycentric point on a mesh triangle
    (point_triangle_vertex_error_function.cpp): Position type
        f = v_src − Σ_i bary_i·v_tri_i                     (3 rows)
    Plane type: f = n·(v_src − tgt) with n blended from source vertex normal
    and target triangle normal (1 row)."""

    src_vertex: jnp.ndarray  # (C,)
    tri_vertices: jnp.ndarray  # (C, 3) int32
    bary: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    constraint_type: str = dataclasses.field(default="position", metadata=dict(static=True))
    source_normal_weight: float = dataclasses.field(default=0.5, metadata=dict(static=True))
    target_normal_weight: float = dataclasses.field(default=0.5, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True

    @property
    def D(self):  # noqa: N802 - mirrors VectorErrorFunction API
        return 3 if self.constraint_type == "position" else 1

    def constraint_count(self) -> int:
        return self.src_vertex.shape[0]

    def raw(self, character, ctx: EvalContext):
        v_src = jnp.take(ctx.mesh_vertices, self.src_vertex, axis=-2)
        tri = jnp.take(ctx.mesh_vertices, self.tri_vertices.reshape(-1), axis=-2)
        tri = tri.reshape(tri.shape[:-2] + self.tri_vertices.shape + (3,)) \
            if tri.ndim > 2 else tri.reshape(self.tri_vertices.shape + (3,))
        tgt = jnp.einsum("...cv,...cvi->...ci", self.bary, tri)
        if self.constraint_type == "position":
            return v_src - tgt, self.cweight
        src_n = jnp.take(ctx.mesh_normals, self.src_vertex, axis=-2)
        a = jnp.take(ctx.mesh_vertices, self.tri_vertices[:, 0], axis=-2)
        b = jnp.take(ctx.mesh_vertices, self.tri_vertices[:, 1], axis=-2)
        c = jnp.take(ctx.mesh_vertices, self.tri_vertices[:, 2], axis=-2)
        tn = jnp.cross(b - a, c - a)
        tn = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-12)
        n = self.source_normal_weight * src_n + self.target_normal_weight * tn
        f = jnp.sum(n * (v_src - tgt), axis=-1, keepdims=True)
        return f, self.cweight

    @classmethod
    def create(cls, src_vertex, tri_vertices, bary, cweight=None, weight=1.0,
               constraint_type="position", loss=None, capacity=None):
        src_vertex = np.asarray(src_vertex, np.int32)
        n = src_vertex.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            src_vertex=jnp.asarray(pad_rows(src_vertex, cap)),
            tri_vertices=jnp.asarray(pad_rows(np.asarray(tri_vertices, np.int32).reshape(n, 3), cap)),
            bary=jnp.asarray(pad_rows(np.asarray(bary, np.float32).reshape(n, 3), cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            constraint_type=constraint_type,
            loss=loss or GeneralizedLoss(),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexVertexDistanceErrorFunction(VectorErrorFunction):
    """Distance between two posed mesh vertices vs target
    (vertex_vertex_distance_error_function.cpp:52-70)."""

    vertex1: jnp.ndarray
    vertex2: jnp.ndarray
    target: jnp.ndarray  # (C,)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 1

    def constraint_count(self) -> int:
        return self.vertex1.shape[0]

    def raw(self, character, ctx: EvalContext):
        p1 = jnp.take(ctx.mesh_vertices, self.vertex1, axis=-2)
        p2 = jnp.take(ctx.mesh_vertices, self.vertex2, axis=-2)
        dist = jnp.linalg.norm(p1 - p2 + 1e-20, axis=-1)
        return (dist - self.target)[..., None], self.cweight

    @classmethod
    def create(cls, vertex1, vertex2, target, cweight=None, weight=1.0, loss=None,
               capacity=None):
        vertex1 = np.asarray(vertex1, np.int32)
        n = vertex1.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            vertex1=jnp.asarray(pad_rows(vertex1, cap)),
            vertex2=jnp.asarray(pad_rows(np.asarray(vertex2, np.int32), cap)),
            target=jnp.asarray(pad_rows(np.asarray(target, np.float32), cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraVertexProjectionErrorFunction(VectorErrorFunction):
    """Posed mesh vertices projected through a full camera model
    (camera_vertex_projection_error_function.{h,cpp})."""

    camera: object
    vertex_index: jnp.ndarray
    target: jnp.ndarray  # (C, 2)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    near_clip: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    needs_mesh = True
    D = 2

    def constraint_count(self) -> int:
        return self.vertex_index.shape[0]

    def raw(self, character, ctx: EvalContext):
        v = jnp.take(ctx.mesh_vertices, self.vertex_index, axis=-2)
        uvz, valid = self.camera.project(v)
        valid = valid & (uvz[..., 2] >= self.near_clip)
        f = uvz[..., :2] - self.target
        return jnp.where(valid[..., None], f, 0.0), self.cweight

    @classmethod
    def create(cls, camera, vertex_index, target, cweight=None, weight=1.0,
               near_clip=0.01, loss=None, capacity=None):
        vertex_index = np.asarray(vertex_index, np.int32)
        n = vertex_index.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            camera=camera,
            vertex_index=jnp.asarray(pad_rows(vertex_index, cap)),
            target=jnp.asarray(pad_rows(np.asarray(target, np.float32).reshape(n, 2), cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            near_clip=near_clip,
            loss=loss or GeneralizedLoss(),
        )
