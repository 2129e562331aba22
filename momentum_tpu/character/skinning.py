"""Linear blend skinning (LBS) and skin weights.

Reference: momentum/character/skin_weights.h (fixed max 8 influences per
vertex, kMaxSkinJoints=8) and linear_skinning.cpp applySSD: the skinning
transform per vertex is Σ_k w_k · (JointWorld_k · InverseBindPose_k), applied
to rest-pose vertices. On TPU this is a (V, 8) gather of joint matrices plus
an einsum — pure MXU/VPU work, no per-vertex loops.

Normals are transformed by the same blended linear map and renormalized (exact
for rigid+uniform-scale blends, matching the reference's behavior).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from momentum_tpu.math import skel_state as ss

MAX_SKIN_JOINTS = 8  # reference kMaxSkinJoints (skin_weights.h:19)

__all__ = ["SkinWeights", "MAX_SKIN_JOINTS", "skinning_matrices", "apply_ssd", "skin_points"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkinWeights:
    """(V, 8) int32 joint indices + (V, 8) float weights, zero-padded,
    sorted descending by weight (reference convention)."""

    index: jnp.ndarray
    weight: jnp.ndarray

    @property
    def num_vertices(self) -> int:
        return self.index.shape[0]


def skinning_matrices(
    global_states: jnp.ndarray, inverse_bind_pose: jnp.ndarray
) -> jnp.ndarray:
    """Per-joint skinning matrices (..., nJ, 3, 4): world · inverseBindPose.

    `inverse_bind_pose` is (nJ, 8) skel_states (the reference stores Affine3f;
    uniform-scale rigs round-trip exactly through the 8-param form).
    """
    m = ss.to_matrix(ss.multiply(global_states, inverse_bind_pose))
    return m[..., :3, :4]


def apply_ssd(
    skin: SkinWeights,
    matrices: jnp.ndarray,
    rest_points: jnp.ndarray,
    rest_normals: jnp.ndarray | None = None,
):
    """Blend skinning matrices per vertex and transform rest points (+normals).

    matrices: (..., nJ, 3, 4); rest_points: (V, 3) or (..., V, 3).
    Returns posed points (..., V, 3) (and normals if given).
    """
    gathered = jnp.take(matrices, skin.index, axis=-3)  # (..., V, 8, 3, 4)
    blended = jnp.einsum("...vk,...vkij->...vij", skin.weight, gathered)  # (..., V, 3, 4)
    pts = jnp.einsum("...vij,...vj->...vi", blended[..., :3], rest_points) + blended[..., 3]
    if rest_normals is None:
        return pts
    nrm = jnp.einsum("...vij,...vj->...vi", blended[..., :3], rest_normals)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    return pts, nrm


def skin_points(
    skin: SkinWeights,
    global_states: jnp.ndarray,
    inverse_bind_pose: jnp.ndarray,
    rest_points: jnp.ndarray,
) -> jnp.ndarray:
    """Convenience: applySSD(inverseBindPose, state, points) (linear_skinning.h:40-50)."""
    return apply_ssd(skin, skinning_matrices(global_states, inverse_bind_pose), rest_points)


def update_normals(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals (math/mesh.h updateNormals equivalent).

    vertices: (..., V, 3); faces: (F, 3) int32. Scatter-add of face normals.
    """
    v0 = jnp.take(vertices, faces[:, 0], axis=-2)
    v1 = jnp.take(vertices, faces[:, 1], axis=-2)
    v2 = jnp.take(vertices, faces[:, 2], axis=-2)
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    out = jnp.zeros_like(vertices)
    for k in range(3):
        out = out.at[..., faces[:, k], :].add(fn)
    n = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(n, 1e-12)
