"""Geometric residual modules: aim, fixed-axis, plane, normal, distance,
projection.

Reference residual forms (momentum/character_solver/):
  AimDistErrorFunction   (aim_error_function.cpp:15-38):
      p = T·localPoint; d = R·localDir; t = target − p
      f = (d·t)·d − t                                         (3 rows)
  AimDirErrorFunction    (aim_error_function.cpp:40-65):
      f = d − normalize(target − p)                           (3 rows)
  FixedAxisDiffErrorFunction (fixed_axis_error_function.cpp:15-27):
      f = R·localAxis − globalAxis                            (3 rows)
  FixedAxisCosErrorFunction  (:30-42):  f = 1 − (R·localAxis)·globalAxis  (1 row)
  FixedAxisAngleErrorFunction(:45-62):  f = acos(clamp((R·a)·g))          (1 row)
  PlaneErrorFunction     (plane_error_function.cpp:51-66):
      f = (T·offset)·normal − d; halfPlane variant clamps positive values
  NormalErrorFunction    (normal_error_function.cpp:15-31):
      f = (R·localNormal)·(T·localPoint − globalPoint)        (1 row)
  DistanceErrorFunction  (distance_error_function.cpp:55-70):
      f = ‖T·offset − origin‖ − target                        (1 row)
  ProjectionErrorFunction (projection_error_function.cpp:25-51):
      q = P(3×4)·hom(T·offset); f = q.xy/q.z − target, active when q.z ≥ nearClip

Per-module legacy scale constants are noted on each class.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import EvalContext, VectorErrorFunction, pad_rows
from momentum_tpu.math import quaternion as quat, skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = [
    "AimDistErrorFunction",
    "AimDirErrorFunction",
    "FixedAxisDiffErrorFunction",
    "FixedAxisCosErrorFunction",
    "FixedAxisAngleErrorFunction",
    "PlaneErrorFunction",
    "NormalErrorFunction",
    "DistanceErrorFunction",
    "ProjectionErrorFunction",
]

_EPS = 1e-16


def _pad_fields(cap, **arrays):
    return {k: jnp.asarray(pad_rows(v, cap)) for k, v in arrays.items()}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _PointDirBase(VectorErrorFunction):
    """Shared layout: parent joint, local point, local dir, world target."""

    parent: jnp.ndarray  # (C,) int32
    local_point: jnp.ndarray  # (C, 3)
    local_dir: jnp.ndarray  # (C, 3)
    target: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray  # (C,)
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def _geom(self, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        p = ss.transform_points(states, self.local_point)
        d = ss.rotate_vectors(states, self.local_dir)
        return p, d

    @classmethod
    def create(cls, parent, local_point, local_dir, target, cweight=None, weight=1.0,
               loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            parent=parent,
            local_point=np.asarray(local_point, np.float32).reshape(n, 3),
            local_dir=np.asarray(local_dir, np.float32).reshape(n, 3),
            target=np.asarray(target, np.float32).reshape(n, 3),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AimDistErrorFunction(_PointDirBase):
    """Penalize distance of the target from the ray through p along d."""

    D = 3

    def raw(self, character, ctx: EvalContext):
        p, d = self._geom(ctx)
        t = self.target - p
        proj = jnp.sum(d * t, axis=-1, keepdims=True)
        return proj * d - t, self.cweight


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AimDirErrorFunction(_PointDirBase):
    """Penalize angular deviation of d from the direction toward the target."""

    D = 3

    def raw(self, character, ctx: EvalContext):
        p, d = self._geom(ctx)
        t = self.target - p
        norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
        tdir = jnp.where(norm > _EPS, t / jnp.maximum(norm, _EPS), 0.0)
        return d - tdir, self.cweight


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _FixedAxisBase(VectorErrorFunction):
    parent: jnp.ndarray
    local_axis: jnp.ndarray  # (C, 3)
    global_axis: jnp.ndarray  # (C, 3)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def _world_axis(self, ctx):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        return ss.rotate_vectors(states, self.local_axis)

    @classmethod
    def create(cls, parent, local_axis, global_axis, cweight=None, weight=1.0,
               loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            parent=parent,
            local_axis=np.asarray(local_axis, np.float32).reshape(n, 3),
            global_axis=np.asarray(global_axis, np.float32).reshape(n, 3),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FixedAxisDiffErrorFunction(_FixedAxisBase):
    D = 3

    def raw(self, character, ctx: EvalContext):
        return self._world_axis(ctx) - self.global_axis, self.cweight


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FixedAxisCosErrorFunction(_FixedAxisBase):
    D = 1

    def raw(self, character, ctx: EvalContext):
        dot = jnp.sum(self._world_axis(ctx) * self.global_axis, axis=-1, keepdims=True)
        return 1.0 - dot, self.cweight


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FixedAxisAngleErrorFunction(_FixedAxisBase):
    D = 1

    def raw(self, character, ctx: EvalContext):
        dot = jnp.sum(self._world_axis(ctx) * self.global_axis, axis=-1, keepdims=True)
        # clamp strictly inside (-1, 1): d(acos)/dx is infinite at ±1 and the
        # reference relies on sin(angle)=0 cancelling it (fixed_axis_error_function.cpp:57-62)
        return jnp.arccos(jnp.clip(dot, -1.0 + 1e-7, 1.0 - 1e-7)), self.cweight


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlaneErrorFunction(VectorErrorFunction):
    """Point-to-plane: f = (T·offset)·n − d. `half_plane=True` penalizes only
    the negative side (plane_error_function.cpp:62-64; also used by the
    "floor" style constraints). kLegacyWeight = 1e-4 (plane_error_function.h:86)."""

    parent: jnp.ndarray
    offset: jnp.ndarray  # (C, 3)
    normal: jnp.ndarray  # (C, 3)
    d: jnp.ndarray  # (C,)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    half_plane: bool = dataclasses.field(default=False, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 1

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def raw(self, character, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        p = ss.transform_points(states, self.offset)
        val = jnp.sum(p * self.normal, axis=-1) - self.d
        if self.half_plane:
            val = jnp.minimum(val, 0.0)
        return val[..., None], self.cweight

    @classmethod
    def create(cls, parent, offset, normal, d, cweight=None, weight=1.0,
               half_plane=False, loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            parent=parent,
            offset=np.asarray(offset, np.float32).reshape(n, 3),
            normal=np.asarray(normal, np.float32).reshape(n, 3),
            d=np.asarray(d, np.float32).reshape(n),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), half_plane=half_plane,
                   loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NormalErrorFunction(VectorErrorFunction):
    """Point-to-plane with body-attached normal:
    f = (R·localNormal)·(T·localPoint − globalPoint) (normal_error_function.cpp:15-31)."""

    parent: jnp.ndarray
    local_point: jnp.ndarray
    local_normal: jnp.ndarray
    global_point: jnp.ndarray
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 1

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def raw(self, character, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        p = ss.transform_points(states, self.local_point)
        nrm = ss.rotate_vectors(states, self.local_normal)
        f = jnp.sum(nrm * (p - self.global_point), axis=-1, keepdims=True)
        return f, self.cweight

    @classmethod
    def create(cls, parent, local_point, local_normal, global_point, cweight=None,
               weight=1.0, loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            parent=parent,
            local_point=np.asarray(local_point, np.float32).reshape(n, 3),
            local_normal=np.asarray(local_normal, np.float32).reshape(n, 3),
            global_point=np.asarray(global_point, np.float32).reshape(n, 3),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistanceErrorFunction(VectorErrorFunction):
    """f = ‖T·offset − origin‖ − target (distance_error_function.cpp:55-70;
    kDistanceWeight = 1, .cpp:72)."""

    parent: jnp.ndarray
    offset: jnp.ndarray  # (C, 3)
    origin: jnp.ndarray  # (C, 3) world-space
    target: jnp.ndarray  # (C,)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 1

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def raw(self, character, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        p = ss.transform_points(states, self.offset)
        dist = jnp.linalg.norm(p - self.origin + 1e-20, axis=-1)
        return (dist - self.target)[..., None], self.cweight

    @classmethod
    def create(cls, parent, offset, origin, target, cweight=None, weight=1.0,
               loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            parent=parent,
            offset=np.asarray(offset, np.float32).reshape(n, 3),
            origin=np.asarray(origin, np.float32).reshape(n, 3),
            target=np.asarray(target, np.float32).reshape(n),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), loss=loss or GeneralizedLoss(), **f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectionErrorFunction(VectorErrorFunction):
    """Pinhole-matrix projection residual (projection_error_function.cpp:25-51):
    q = P·hom(worldPoint); f = q.xy/q.z − target for q.z ≥ nearClip, else 0.
    kProjectionWeight = 1 (projection_error_function.h:112)."""

    parent: jnp.ndarray
    offset: jnp.ndarray  # (C, 3)
    projection: jnp.ndarray  # (C, 3, 4)
    target: jnp.ndarray  # (C, 2)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    near_clip: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 2

    def constraint_count(self) -> int:
        return self.parent.shape[0]

    def raw(self, character, ctx: EvalContext):
        states = jnp.take(ctx.skel_states, self.parent, axis=-2)
        p = ss.transform_points(states, self.offset)
        q = jnp.einsum("...ij,...j->...i", self.projection[..., :3], p) \
            + self.projection[..., 3]
        z = q[..., 2:3]
        valid = z[..., 0] >= self.near_clip
        f = q[..., :2] / jnp.where(jnp.abs(z) > _EPS, z, 1.0) - self.target
        return jnp.where(valid[..., None], f, 0.0), self.cweight

    @classmethod
    def create(cls, parent, offset, projection, target, cweight=None, weight=1.0,
               near_clip=1.0, loss=None, capacity=None):
        parent = np.asarray(parent, np.int32)
        n = parent.shape[0]
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        f = _pad_fields(
            cap,
            parent=parent,
            offset=np.asarray(offset, np.float32).reshape(n, 3),
            projection=np.asarray(projection, np.float32).reshape(n, 3, 4),
            target=np.asarray(target, np.float32).reshape(n, 2),
            cweight=cweight,
        )
        return cls(weight=jnp.asarray(weight, jnp.float32), near_clip=near_clip,
                   loss=loss or GeneralizedLoss(), **f)


# ---------------------------------------------------------------------------
# analytic Jacobians (chain rules over point/vector joint derivatives;
# reference: the corresponding getJacobian paths which combine evalFunction's
# dfdv with SkeletonDerivative's point/vector walks)
# ---------------------------------------------------------------------------

def _aim_geom_jacobians(self, ctx, jc):
    from momentum_tpu.solver.analytic_jacobian import point_jacobian, vector_jacobian

    states = jnp.take(ctx.skel_states, self.parent, axis=-2)
    p = ss.transform_points(states, self.local_point)
    d = ss.rotate_vectors(states, self.local_dir)
    jp = point_jacobian(jc, p, self.parent)  # (C, 3, J)
    jd = vector_jacobian(jc, d, self.parent)
    return p, d, jp, jd


def _finish(self, f, j, w):
    sq = jnp.sum(f * f, axis=-1)
    scale = self._row_scale(w, sq)
    rows = (scale[..., None] * f).reshape(f.shape[:-2] + (-1,))
    jrows = (scale[..., None, None] * j).reshape(
        j.shape[:-3] + (rows.shape[-1], j.shape[-1]))
    return rows, jrows, None


def _aim_dist_jacobian(self, character, ctx, jc):
    p, d, jp, jd = _aim_geom_jacobians(self, ctx, jc)
    t = self.target - p
    jt = -jp
    dt = jnp.sum(d * t, axis=-1)  # (C,)
    # f = (d·t)d − t ; df = d(d·t)·d + (d·t)·Jd − Jt
    ddt = jnp.einsum("...ci,...cij->...cj", t, jd) + jnp.einsum("...ci,...cij->...cj", d, jt)  # (C, J)
    j = d[..., None] * ddt[..., None, :] + dt[..., None, None] * jd - jt
    f = dt[..., None] * d - t
    return _finish(self, f, j, self.cweight)


def _aim_dir_jacobian(self, character, ctx, jc):
    p, d, jp, jd = _aim_geom_jacobians(self, ctx, jc)
    t = self.target - p
    norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
    safe = jnp.maximum(norm, 1e-12)
    that = jnp.where(norm > _EPS, t / safe, 0.0)
    # d t̂ = (I − t̂ t̂ᵀ)/‖t‖ · dt ; dt = −Jp
    proj = jp - jnp.einsum("...ci,...cj,...cjk->...cik", that, that, jp)
    j = jd + proj / safe[..., None]
    f = d - that
    return _finish(self, f, j, self.cweight)


def _fixed_axis_geom(self, ctx, jc):
    from momentum_tpu.solver.analytic_jacobian import vector_jacobian

    states = jnp.take(ctx.skel_states, self.parent, axis=-2)
    v = ss.rotate_vectors(states, self.local_axis)
    jv = vector_jacobian(jc, v, self.parent)
    return v, jv


def _fixed_axis_diff_jacobian(self, character, ctx, jc):
    v, jv = _fixed_axis_geom(self, ctx, jc)
    return _finish(self, v - self.global_axis, jv, self.cweight)


def _fixed_axis_cos_jacobian(self, character, ctx, jc):
    v, jv = _fixed_axis_geom(self, ctx, jc)
    f = 1.0 - jnp.sum(v * self.global_axis, axis=-1, keepdims=True)
    j = -jnp.einsum("...ci,...cij->...cj", self.global_axis, jv)[..., None, :]
    return _finish(self, f, j, self.cweight)


def _fixed_axis_angle_jacobian(self, character, ctx, jc):
    v, jv = _fixed_axis_geom(self, ctx, jc)
    c = jnp.clip(jnp.sum(v * self.global_axis, axis=-1), -1.0 + 1e-7, 1.0 - 1e-7)
    f = jnp.arccos(c)[..., None]
    dacos = -1.0 / jnp.sqrt(1.0 - c * c)
    j = (dacos[..., None] * jnp.einsum("...ci,...cij->...cj", self.global_axis, jv))[..., None, :]
    return _finish(self, f, j, self.cweight)


def _plane_jacobian(self, character, ctx, jc):
    from momentum_tpu.solver.analytic_jacobian import point_jacobian

    states = jnp.take(ctx.skel_states, self.parent, axis=-2)
    p = ss.transform_points(states, self.offset)
    jp = point_jacobian(jc, p, self.parent)
    val = jnp.sum(p * self.normal, axis=-1) - self.d
    gate = jnp.where(val < 0, 1.0, 0.0) if self.half_plane else jnp.ones_like(val)
    if self.half_plane:
        val = jnp.minimum(val, 0.0)
    j = (gate[..., None] * jnp.einsum("...ci,...cij->...cj", self.normal, jp))[..., None, :]
    return _finish(self, val[..., None], j, self.cweight)


def _normal_jacobian(self, character, ctx, jc):
    from momentum_tpu.solver.analytic_jacobian import point_jacobian, vector_jacobian

    states = jnp.take(ctx.skel_states, self.parent, axis=-2)
    p = ss.transform_points(states, self.local_point)
    nrm = ss.rotate_vectors(states, self.local_normal)
    jp = point_jacobian(jc, p, self.parent)
    jn = vector_jacobian(jc, nrm, self.parent)
    diff = p - self.global_point
    f = jnp.sum(nrm * diff, axis=-1, keepdims=True)
    j = (jnp.einsum("...ci,...cij->...cj", diff, jn)
         + jnp.einsum("...ci,...cij->...cj", nrm, jp))[..., None, :]
    return _finish(self, f, j, self.cweight)


def _distance_jacobian(self, character, ctx, jc):
    from momentum_tpu.solver.analytic_jacobian import point_jacobian

    states = jnp.take(ctx.skel_states, self.parent, axis=-2)
    p = ss.transform_points(states, self.offset)
    jp = point_jacobian(jc, p, self.parent)
    dvec = p - self.origin
    dist = jnp.linalg.norm(dvec + 1e-20, axis=-1)
    dhat = dvec / jnp.maximum(dist, 1e-12)[..., None]
    f = (dist - self.target)[..., None]
    j = jnp.einsum("...ci,...cij->...cj", dhat, jp)[..., None, :]
    return _finish(self, f, j, self.cweight)


def _projection_jacobian(self, character, ctx, jc):
    from momentum_tpu.solver.analytic_jacobian import point_jacobian

    states = jnp.take(ctx.skel_states, self.parent, axis=-2)
    p = ss.transform_points(states, self.offset)
    jp = point_jacobian(jc, p, self.parent)
    q = jnp.einsum("...ij,...j->...i", self.projection[..., :3], p) + self.projection[..., 3]
    z = q[..., 2]
    valid = (z >= self.near_clip).astype(p.dtype)
    safe_z = jnp.where(jnp.abs(z) > _EPS, z, 1.0)
    f = (q[..., :2] / safe_z[..., None]
         - self.target) * valid[..., None]
    # d(q.xy/z) = [1/z, 0, -x/z²; 0, 1/z, -y/z²]·M[:, :3]·Jp
    jq = jnp.einsum("...cij,...cjk->...cik", self.projection[..., :3], jp)
    inv_z = 1.0 / safe_z
    j = jnp.stack([
        inv_z[:, None] * jq[:, 0] - (q[..., 0] * inv_z**2)[:, None] * jq[:, 2],
        inv_z[:, None] * jq[:, 1] - (q[..., 1] * inv_z**2)[:, None] * jq[:, 2],
    ], axis=1) * valid[:, None, None]
    return _finish(self, f, j, self.cweight)


for _cls, _fn in [
    (AimDistErrorFunction, _aim_dist_jacobian),
    (AimDirErrorFunction, _aim_dir_jacobian),
    (FixedAxisDiffErrorFunction, _fixed_axis_diff_jacobian),
    (FixedAxisCosErrorFunction, _fixed_axis_cos_jacobian),
    (FixedAxisAngleErrorFunction, _fixed_axis_angle_jacobian),
    (PlaneErrorFunction, _plane_jacobian),
    (NormalErrorFunction, _normal_jacobian),
    (DistanceErrorFunction, _distance_jacobian),
    (ProjectionErrorFunction, _projection_jacobian),
]:
    _cls.has_analytic_jacobian = True
    _cls.jacobian = _fn
