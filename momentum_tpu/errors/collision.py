"""Collision error function: tapered-capsule self-penetration penalty.

Reference: character_solver/collision_error_function.{h,cpp} —
  * capsule world state (collision_geometry_state.cpp:27-49):
      T = T_parent · T_local;  origin = T.t;
      direction = T.R·ex · T.s · length;  radii = radii_local · s_parent
  * overlap (collision_geometry_state.h:120-157):
      (s, t, dist) = closestPointsOnSegments(...)
      overlap = (rA0 + s·ΔA + rB0 + t·ΔB) − dist, active when > 0 and
      dist ≥ 1e-8 (degenerate coincident centerlines rejected)
  * energy  = kCollisionWeight(=5e-3, collision_error_function.h:139) ·
      weight · Σ_pairs overlap²; residual rows = √(kW·w)·overlap
      (collision_error_function.cpp:286-338)

Pair pruning: the reference runs a BVH broadphase per iteration and
precomputes `validPairs_` by excluding pairs already overlapping at the rest
pose and pairs of primitives on the same joint (collision_error_function.cpp
computeBroadPhase / excludedPairs). On TPU the pair list is STATIC: we
enumerate all pairs once on the host with the same exclusions
(`compute_valid_pairs`) and evaluate them densely — at ≤ a few hundred
capsules the all-pairs masked evaluation is cheaper than any broadphase.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import EvalContext, VectorErrorFunction
from momentum_tpu.math import skel_state as ss
from momentum_tpu.math.geometry import closest_points_on_segments
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = ["CollisionErrorFunction", "compute_valid_pairs", "K_COLLISION_WEIGHT",
           "primitive_states", "support_radius_along"]

K_COLLISION_WEIGHT = 5e-3  # collision_error_function.h:139


def capsule_states(collision, skel_states):
    """World-space capsule state: (origin (C,3), direction (C,3), radii (C,2)).

    Mirrors CollisionGeometryStateT::update (collision_geometry_state.cpp:27-49).
    """
    parent_states = jnp.take(skel_states, collision.parent, axis=-2)
    full = ss.multiply(parent_states, collision.transform)
    t, q, s = ss.split(full)
    _, _, s_par = ss.split(parent_states)
    ex = jnp.zeros_like(t).at[..., 0].set(1.0)
    from momentum_tpu.math import quaternion as quat

    direction = quat.rotate_vector(q, ex) * s * collision.length[..., None]
    radii = collision.radius * s_par
    return t, direction, radii


def primitive_states(collision, skel_states):
    """World-space SoA primitive state (collision_geometry_state.h:20-60):
    (origin, direction, radii, orientation q, ellipsoid_radii, box_half_extents),
    all scaled by the parent joint's world scale."""
    parent_states = jnp.take(skel_states, collision.parent, axis=-2)
    full = ss.multiply(parent_states, collision.transform)
    t, q, s = ss.split(full)
    _, _, s_par = ss.split(parent_states)
    ex = jnp.zeros_like(t).at[..., 0].set(1.0)
    from momentum_tpu.math import quaternion as quat

    direction = quat.rotate_vector(q, ex) * s * collision.length[..., None]
    radii = collision.radius * s_par
    ell = collision.shape3("ellipsoid_radii") * s
    box = collision.shape3("box_half_extents") * s
    return t, direction, radii, q, ell, box


def support_radius_along(ptype, q, ell, box, n):
    """Support radius of a centered primitive along world direction n
    (plane_collision_query.cpp centeredPrimitiveRadiusAlongDirection):
    ellipsoid ‖radii ∘ n_local‖; box Σ|h_i·n_local_i|. Branch-free select."""
    from momentum_tpu.math import quaternion as quat

    n_local = quat.rotate_vector(quat.conjugate(q), jnp.broadcast_to(n, q[..., :3].shape))
    # safe norm: capsule rows carry zero radii and the unselected branch must
    # not emit NaN gradients (0-cotangent × d‖0‖ = NaN otherwise)
    sq = jnp.sum(jnp.square(ell * n_local), axis=-1)
    r_ell = jnp.sqrt(jnp.maximum(sq, 1e-20))
    r_ell = jnp.where(sq > 0, r_ell, 0.0)
    r_box = jnp.sum(jnp.abs(box * n_local), axis=-1)
    return jnp.where(ptype == 1, r_ell, r_box)


def compute_valid_pairs(character) -> np.ndarray:
    """Static (NP, 2) candidate pair list: all capsule pairs except same-joint
    pairs and pairs overlapping at the rest pose (the reference's excluded
    pairs, collision_error_function.cpp computeBroadPhase)."""
    col = character.collision
    n = col.num_capsules
    rest = character.bind_pose()
    o, d, r = capsule_states(col, rest)
    o, d, r = np.asarray(o), np.asarray(d), np.asarray(r)
    parent = np.asarray(col.parent)
    ptypes = np.asarray(col.primitive_types())
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            if parent[i] == parent[j]:
                continue
            if ptypes[i] != 0 or ptypes[j] != 0:
                continue  # capsule-capsule narrowphase only (as upstream)
            s, t, dist = (np.asarray(x) for x in closest_points_on_segments(
                jnp.asarray(o[i]), jnp.asarray(d[i]), jnp.asarray(o[j]), jnp.asarray(d[j])))
            delta_i = r[i, 1] - r[i, 0]
            delta_j = r[j, 1] - r[j, 0]
            overlap = (r[i, 0] + s * delta_i + r[j, 0] + t * delta_j) - dist
            if overlap > 0:
                continue  # overlapping at rest → excluded forever
            pairs.append((i, j))
    return np.asarray(pairs, np.int32).reshape(-1, 2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CollisionErrorFunction(VectorErrorFunction):
    pair_a: jnp.ndarray  # (NP,) int32 capsule indices
    pair_b: jnp.ndarray  # (NP,)
    pweight: jnp.ndarray  # (NP,) 0 = padding
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 1

    def constraint_count(self) -> int:
        return self.pair_a.shape[0]

    def raw(self, character, ctx: EvalContext):
        o, d, r = capsule_states(character.collision, ctx.skel_states)
        oa = jnp.take(o, self.pair_a, axis=-2)
        ob = jnp.take(o, self.pair_b, axis=-2)
        da = jnp.take(d, self.pair_a, axis=-2)
        db = jnp.take(d, self.pair_b, axis=-2)
        ra = jnp.take(r, self.pair_a, axis=-2)
        rb = jnp.take(r, self.pair_b, axis=-2)
        s, t, dist = closest_points_on_segments(oa, da, ob, db)
        rad = ra[..., 0] + s * (ra[..., 1] - ra[..., 0]) \
            + rb[..., 0] + t * (rb[..., 1] - rb[..., 0])
        overlap = rad - dist
        active = (overlap > 0) & (dist >= 1e-8)
        f = jnp.where(active, overlap, 0.0)[..., None]
        return f, self.pweight * K_COLLISION_WEIGHT

    has_analytic_jacobian = True

    def jacobian(self, character, ctx: EvalContext, jc):
        """Analytic rows with the closest-point parameters (s, t) frozen —
        the reference's collision gradient (collision_error_function.cpp:80+):
        d overlap = d rad − û·(d p_a − d p_b) with û the separation direction,
        p_a/p_b the closest points treated as rigid attachments of the two
        capsules' joints, and d rad the ln2-scale column for every scale DoF
        whose joint is an ancestor (radii scale with the parent's global
        scale, capsule_states). Envelope theorem: ∂dist/∂(s,t) = 0 at the
        minimizer, so freezing s, t matches AD except through the tapered-
        radius term ∂rad/∂s·∂s/∂θ (zero for uniform radii)."""
        col = character.collision
        o, d, r = capsule_states(col, ctx.skel_states)
        pa_j = jnp.take(jnp.asarray(col.parent), self.pair_a)
        pb_j = jnp.take(jnp.asarray(col.parent), self.pair_b)
        oa = jnp.take(o, self.pair_a, axis=-2)
        ob = jnp.take(o, self.pair_b, axis=-2)
        da = jnp.take(d, self.pair_a, axis=-2)
        db = jnp.take(d, self.pair_b, axis=-2)
        ra = jnp.take(r, self.pair_a, axis=-2)
        rb = jnp.take(r, self.pair_b, axis=-2)
        s, t, dist = closest_points_on_segments(oa, da, ob, db)
        rad_a = ra[..., 0] + s * (ra[..., 1] - ra[..., 0])
        rad_b = rb[..., 0] + t * (rb[..., 1] - rb[..., 0])
        overlap = rad_a + rad_b - dist
        active = (overlap > 0) & (dist >= 1e-8)
        f = jnp.where(active, overlap, 0.0)
        scale = self._row_scale(self.pweight * K_COLLISION_WEIGHT, f * f)
        gate = (scale * active.astype(scale.dtype))

        from momentum_tpu.solver.analytic_jacobian import point_jacobian

        p_a = oa + s[..., None] * da
        p_b = ob + t[..., None] * db
        u = (p_a - p_b) / jnp.maximum(dist, 1e-8)[..., None]
        j_pa = point_jacobian(jc, p_a, pa_j)  # (..., NP, 3, nJ7)
        j_pb = point_jacobian(jc, p_b, pb_j)
        j_dist = jnp.einsum("...ci,...cij->...cj", u, j_pa - j_pb)
        # radius term: world radii = local radii · parent scale, and the
        # parent scale is exp2(Σ ancestor scale params) ⇒ the scale-DoF
        # column of d rad is ln2·(rad_a·anc[j, parent_a] + rad_b·anc[...])
        nj = jc.anc_mask.shape[0]
        mask_a = jnp.take(jc.anc_mask, pa_j, axis=1)  # (nJ, NP)
        mask_b = jnp.take(jc.anc_mask, pb_j, axis=1)
        ln2 = 0.6931471805599453
        drad = ln2 * (rad_a[..., None] * jnp.swapaxes(mask_a, -1, -2)
                      + rad_b[..., None] * jnp.swapaxes(mask_b, -1, -2))
        j_rad = jnp.zeros(j_dist.shape[:-1] + (nj, 7), j_dist.dtype)
        j_rad = j_rad.at[..., 6].set(drad)
        j_rad = j_rad.reshape(j_dist.shape)
        rows = scale * f
        j_jp = gate[..., None] * (j_rad - j_dist)
        return rows, j_jp, None

    @classmethod
    def create(cls, character, pairs=None, weight=1.0, loss=None):
        if pairs is None:
            pairs = compute_valid_pairs(character)
        pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
        return cls(
            pair_a=jnp.asarray(pairs[:, 0]),
            pair_b=jnp.asarray(pairs[:, 1]),
            pweight=jnp.ones(pairs.shape[0], jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlaneCollisionErrorFunction(VectorErrorFunction):
    """Tapered capsules vs a fixed world plane (plane_collision_error_function
    .cpp:140-169 + plane_collision_query.h): per capsule, overlap = max over
    both endpoints of (radius − signedDistance(endpoint, plane)); energy
    kCollisionWeight(5e-3)·weight·Σ overlap²."""

    plane_normal: jnp.ndarray  # (3,) unit
    plane_offset: jnp.ndarray  # scalar: plane is n·x = offset
    pweight: jnp.ndarray  # (C,) per-capsule weight
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 1

    def constraint_count(self) -> int:
        return self.pweight.shape[0]

    def raw(self, character, ctx: EvalContext):
        col = character.collision
        o, d, r, q, ell, box = primitive_states(col, ctx.skel_states)
        n = self.plane_normal
        # capsule: worst endpoint overlap (plane_collision_query.cpp:181-199)
        p0 = o
        p1 = o + d
        d0 = jnp.einsum("...i,i->...", p0, n) - self.plane_offset
        d1 = jnp.einsum("...i,i->...", p1, n) - self.plane_offset
        over_cap = jnp.maximum(r[..., 0] - d0, r[..., 1] - d1)
        # ellipsoid/box: center distance vs support radius along the normal
        # (plane_collision_query.cpp:200-228)
        ptype = col.primitive_types()
        r_sup = support_radius_along(ptype, q, ell, box, n)
        over_cen = r_sup - d0
        overlap = jnp.maximum(jnp.where(ptype == 0, over_cap, over_cen), 0.0)
        return overlap[..., None], self.pweight * K_COLLISION_WEIGHT

    @classmethod
    def create(cls, character, plane_normal=(0.0, 1.0, 0.0), plane_offset=0.0,
               weight=1.0, loss=None):
        n = np.asarray(plane_normal, np.float32)
        n = n / np.linalg.norm(n)
        c = character.collision.num_capsules
        return cls(
            plane_normal=jnp.asarray(n),
            plane_offset=jnp.asarray(plane_offset, jnp.float32),
            pweight=jnp.ones(c, jnp.float32),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )
