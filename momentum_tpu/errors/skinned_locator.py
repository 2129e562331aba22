"""SkinnedLocatorErrorFunction: position targets on multi-joint skinned
locators.

Reference: character/skinned_locator.h:25-47 (locator whose world position is
the skin-weighted blend of up to kMaxSkinJoints joint transforms applied to a
rest-pose point) + character_solver/skinned_locator_error_function.cpp
(position residual vs target).
    world = Σ_k w_k · (T_k · invBind_k) · restPos
    f = world − target
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from momentum_tpu.errors.base import EvalContext, VectorErrorFunction, pad_rows
from momentum_tpu.math import skel_state as ss
from momentum_tpu.math.generalized_loss import GeneralizedLoss

__all__ = ["SkinnedLocatorErrorFunction", "SkinnedLocatorTriangleErrorFunction"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkinnedLocatorErrorFunction(VectorErrorFunction):
    parents: jnp.ndarray  # (C, K) int32 skinning joints
    skin_weights: jnp.ndarray  # (C, K)
    rest_position: jnp.ndarray  # (C, 3) in the rest pose
    target: jnp.ndarray  # (C, 3) world targets
    cweight: jnp.ndarray
    weight: jnp.ndarray
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 3

    def constraint_count(self) -> int:
        return self.parents.shape[0]

    def world_positions(self, character, skel_states):
        char = character.with_inverse_bind_pose()
        skin_t = ss.multiply(
            jnp.take(skel_states, self.parents, axis=-2),
            jnp.take(char.inverse_bind_pose, self.parents, axis=0),
        )  # (..., C, K, 8)
        pts = ss.transform_points(skin_t, self.rest_position[..., :, None, :])
        return jnp.einsum("...ck,...cki->...ci", self.skin_weights, pts)

    def raw(self, character, ctx: EvalContext):
        world = self.world_positions(character, ctx.skel_states)
        return world - self.target, self.cweight

    @classmethod
    def create(cls, parents, skin_weights, rest_position, target, cweight=None,
               weight=1.0, loss=None, capacity=None):
        parents = np.asarray(parents, np.int32)
        n, k = parents.shape
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        return cls(
            parents=jnp.asarray(pad_rows(parents, cap)),
            skin_weights=jnp.asarray(pad_rows(np.asarray(skin_weights, np.float32).reshape(n, k), cap)),
            rest_position=jnp.asarray(pad_rows(np.asarray(rest_position, np.float32).reshape(n, 3), cap)),
            target=jnp.asarray(pad_rows(np.asarray(target, np.float32).reshape(n, 3), cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            loss=loss or GeneralizedLoss(),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkinnedLocatorTriangleErrorFunction(VectorErrorFunction):
    """Constrain a skinned locator to a point on the posed mesh
    (skinned_locator_triangle_error_function.h:59-63): target point =
    Σᵢ baryᵢ·triangle_vertexᵢ + depth·triangle_normal; residual pulls the
    locator and the triangle toward each other (both are functions of θ, so
    AD distributes the force to all participating joints/vertices).

    Sliding (candidateTriangles): when `candidates` is given (C, S) triangle
    indices, the residual reprojects onto the closest candidate each
    evaluation — branch-free min over the static candidate set; -1 pads.
    """

    parents: jnp.ndarray  # (C, K) locator skinning joints
    skin_weights: jnp.ndarray  # (C, K)
    rest_position: jnp.ndarray  # (C, 3)
    tri_indices: jnp.ndarray  # (C, 3) reference-triangle vertex indices
    bary: jnp.ndarray  # (C, 3)
    depth: jnp.ndarray  # (C,)
    cweight: jnp.ndarray
    weight: jnp.ndarray
    candidates: jnp.ndarray | None = None  # (C, S) triangle indices, -1 pad
    candidate_faces: jnp.ndarray | None = None  # (C, S, 3) their vertices
    loss: GeneralizedLoss = dataclasses.field(
        default=GeneralizedLoss(), metadata=dict(static=True)
    )

    D = 3
    needs_mesh = True

    def constraint_count(self) -> int:
        return self.parents.shape[0]

    def _locator_world(self, character, skel_states):
        char = character.with_inverse_bind_pose()
        skin_t = ss.multiply(
            jnp.take(skel_states, self.parents, axis=-2),
            jnp.take(char.inverse_bind_pose, self.parents, axis=0),
        )
        pts = ss.transform_points(skin_t, self.rest_position[..., :, None, :])
        return jnp.einsum("...ck,...cki->...ci", self.skin_weights, pts)

    @staticmethod
    def _tri_point(verts, tri, bary, depth):
        v = jnp.take(verts, tri, axis=-2)  # (..., C, 3, 3)
        p = jnp.einsum("...cb,...cbi->...ci", bary, v)
        n = jnp.cross(v[..., 1, :] - v[..., 0, :], v[..., 2, :] - v[..., 0, :])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return p + depth[..., None] * n

    def raw(self, character, ctx: EvalContext):
        if ctx.mesh_vertices is None:
            raise ValueError("SkinnedLocatorTriangleErrorFunction needs the "
                             "posed mesh in the context")
        world = self._locator_world(character, ctx.skel_states)
        if self.candidate_faces is not None:
            # sliding: reproject onto the closest candidate triangle
            v = jnp.take(ctx.mesh_vertices, self.candidate_faces, axis=-2)
            # v: (..., C, S, 3, 3); pick the candidate whose centroid is
            # nearest the locator (branch-free argmin over the static set)
            centers = jnp.mean(v, axis=-2)
            d2 = jnp.sum((centers - world[..., :, None, :]) ** 2, axis=-1)
            d2 = jnp.where(self.candidates >= 0, d2, jnp.inf)
            best = jnp.argmin(d2, axis=-1)  # (..., C)
            vbest = jnp.take_along_axis(
                v, best[..., None, None, None], axis=-3)[..., 0, :, :]
            p = jnp.einsum("...cb,...cbi->...ci", self.bary, vbest)
            nrm = jnp.cross(vbest[..., 1, :] - vbest[..., 0, :],
                            vbest[..., 2, :] - vbest[..., 0, :])
            nrm = nrm / jnp.maximum(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
            target = p + self.depth[..., None] * nrm
        else:
            target = self._tri_point(ctx.mesh_vertices, self.tri_indices,
                                     self.bary, self.depth)
        return world - target, self.cweight

    @classmethod
    def create(cls, parents, skin_weights, rest_position, tri_indices, bary,
               depth=None, cweight=None, weight=1.0, loss=None,
               candidates=None, faces=None, capacity=None):
        parents = np.asarray(parents, np.int32)
        n, k = parents.shape
        depth = np.zeros(n, np.float32) if depth is None else np.asarray(depth, np.float32)
        cweight = np.ones(n, np.float32) if cweight is None else np.asarray(cweight, np.float32)
        cap = capacity or n
        cand = cand_faces = None
        if candidates is not None:
            if faces is None:
                raise ValueError("candidates requires the mesh faces array")
            candidates = np.asarray(candidates, np.int32)
            cf = np.asarray(faces, np.int32)[np.maximum(candidates, 0)]
            cand = jnp.asarray(pad_rows(candidates, cap, fill=-1))
            cand_faces = jnp.asarray(pad_rows(cf, cap))
        return cls(
            parents=jnp.asarray(pad_rows(parents, cap)),
            skin_weights=jnp.asarray(pad_rows(
                np.asarray(skin_weights, np.float32).reshape(n, k), cap)),
            rest_position=jnp.asarray(pad_rows(
                np.asarray(rest_position, np.float32).reshape(n, 3), cap)),
            tri_indices=jnp.asarray(pad_rows(
                np.asarray(tri_indices, np.int32).reshape(n, 3), cap)),
            bary=jnp.asarray(pad_rows(
                np.asarray(bary, np.float32).reshape(n, 3), cap)),
            depth=jnp.asarray(pad_rows(depth, cap)),
            cweight=jnp.asarray(pad_rows(cweight, cap)),
            weight=jnp.asarray(weight, jnp.float32),
            candidates=cand,
            candidate_faces=cand_faces,
            loss=loss or GeneralizedLoss(),
        )
