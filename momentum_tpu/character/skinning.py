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

__all__ = ["SkinWeights", "MAX_SKIN_JOINTS", "skinning_matrices", "apply_ssd", "skin_points", "skin_points_coo", "apply_inverse_ssd", "unskin_points", "blended_vertex_matrices"]


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

    # ---- pymomentum.geometry.SkinWeights surface (skin_weights_pybind.cpp) ----

    @property
    def max_influences_per_vertex(self) -> int:
        """kMaxSkinJoints (skin_weights.h:19) — the padded influence width."""
        return self.index.shape[1]

    @property
    def num_joints(self) -> int:
        """Highest referenced joint index + 1 (among nonzero weights)."""
        import numpy as np

        idx = np.asarray(self.index)
        w = np.asarray(self.weight)
        used = idx[w > 0]
        return int(used.max()) + 1 if used.size else 0

    def to_dense(self, num_joints: int):
        """(V, num_joints) dense weight matrix (pybind to_dense)."""
        import numpy as np

        if num_joints <= 0:
            raise ValueError(f"num_joints must be positive, got {num_joints}")
        idx = np.asarray(self.index)
        w = np.asarray(self.weight)
        if idx[w > 0].size and idx[w > 0].max() >= num_joints:
            raise ValueError("num_joints smaller than referenced joint index")
        out = np.zeros((idx.shape[0], num_joints), np.float32)
        rows = np.repeat(np.arange(idx.shape[0]), idx.shape[1])
        np.add.at(out, (rows, idx.reshape(-1)), w.reshape(-1))
        return out

    @classmethod
    def from_dense(cls, dense_weights, weight_threshold: float = 1e-6,
                   max_influences: int = 8) -> "SkinWeights":
        """Keep each vertex's top-`max_influences` weights above threshold,
        renormalized, sorted descending (pybind from_dense)."""
        import numpy as np

        if weight_threshold < 0:
            raise ValueError("weight_threshold must be non-negative")
        d = np.asarray(dense_weights, np.float32)
        if d.ndim != 2:
            raise ValueError(f"dense weights must be 2-D, got {d.ndim}-D")
        d = np.where(d >= weight_threshold, d, 0.0)
        order = np.argsort(-d, axis=1, kind="stable")[:, :max_influences]
        w = np.take_along_axis(d, order, axis=1)
        idx = order.astype(np.int32)
        idx = np.where(w > 0, idx, 0)
        total = w.sum(axis=1, keepdims=True)
        w = np.where(total > 0, w / np.where(total == 0, 1, total), 0.0)
        if w.shape[1] < max_influences:  # pad to the kMaxSkinJoints width
            pad = max_influences - w.shape[1]
            w = np.pad(w, ((0, 0), (0, pad)))
            idx = np.pad(idx, ((0, 0), (0, pad)))
        return cls(index=jnp.asarray(idx), weight=jnp.asarray(w, jnp.float32))

    def normalize_weights(self) -> "SkinWeights":
        """Rescale each vertex's weights to sum to 1 (pybind
        normalize_weights); all-zero rows stay zero."""
        total = jnp.sum(self.weight, axis=1, keepdims=True)
        w = jnp.where(total > 0, self.weight / jnp.where(total == 0, 1.0, total),
                      self.weight)
        import dataclasses as _dc

        return _dc.replace(self, weight=w)


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


def skin_points_coo(
    rest_points: jnp.ndarray,
    global_states: jnp.ndarray,
    inverse_bind_pose: jnp.ndarray,
    skin_indices: jnp.ndarray,
    skin_weights: jnp.ndarray,
    vert_indices: jnp.ndarray,
) -> jnp.ndarray:
    """Flattened-COO linear blend skinning for heterogeneous topologies
    (pymomentum/backend/trs_backend.py:603 multi_topology_skinning).

    Instead of the fixed (V, 8) influence table, influences arrive as three
    flat arrays of length N: `vert_indices[n]` receives
    `skin_weights[n] ·  M[skin_indices[n]] · rest`, accumulated by
    segment-sum (deterministic scatter-add on TPU). With a batch dimension,
    `skin_indices` flattens batch·joint (index = b·nJ + j) and `vert_indices`
    flattens batch·vertex — letting ONE call skin a batch of characters with
    different topologies/influence counts.

    rest_points: (V, 3) or (B, V, 3); global_states: (nJ, 8) or (B, nJ, 8);
    inverse_bind_pose: (nJ, 8). Returns (V, 3) / (B, V, 3).
    """
    batched = global_states.ndim == 3
    mats = skinning_matrices(global_states, inverse_bind_pose)  # (..., nJ, 3, 4)
    if batched:
        b, nj = mats.shape[0], mats.shape[1]
        v = rest_points.shape[-2]
        if rest_points.ndim == 2:
            rest_points = jnp.broadcast_to(rest_points, (b, v, 3))
        mats_flat = mats.reshape(b * nj, 3, 4)
        rest_flat = rest_points.reshape(b * v, 3)
        out_size = b * v
    else:
        mats_flat = mats
        rest_flat = rest_points
        out_size = rest_points.shape[0]
    m = jnp.take(mats_flat, skin_indices, axis=0)  # (N, 3, 4)
    p = jnp.take(rest_flat, vert_indices, axis=0)  # (N, 3)
    contrib = (jnp.einsum("nij,nj->ni", m[..., :3], p) + m[..., 3]) \
        * skin_weights[:, None]
    out = jax.ops.segment_sum(contrib, vert_indices, num_segments=out_size)
    if batched:
        return out.reshape(b, v, 3)
    return out


def blended_vertex_matrices(
    skin: SkinWeights, matrices: jnp.ndarray
) -> jnp.ndarray:
    """Per-vertex blended skinning matrices (..., V, 3, 4)."""
    gathered = jnp.take(matrices, skin.index, axis=-3)
    return jnp.einsum("...vk,...vkij->...vij", skin.weight, gathered)


def apply_inverse_ssd(
    skin: SkinWeights,
    matrices: jnp.ndarray,
    posed_points: jnp.ndarray,
) -> jnp.ndarray:
    """Map posed points back to rest space through the inverse of each
    vertex's blended skinning matrix (linear_skinning.h:200-240
    getInverseSSDTransformation / applyInverseSSD): rest = B⁻¹·(p − t) with
    B the blended 3×3 block and t its translation column. The blended
    affine is invertible for any convex blend of rigid(+uniform scale)
    transforms in practice; a batched LU solve keeps this jittable."""
    blended = blended_vertex_matrices(skin, matrices)  # (..., V, 3, 4)
    rhs = posed_points - blended[..., 3]
    return jnp.linalg.solve(blended[..., :3], rhs[..., None])[..., 0]


def unskin_points(
    skin: SkinWeights,
    global_states: jnp.ndarray,
    inverse_bind_pose: jnp.ndarray,
    posed_points: jnp.ndarray,
) -> jnp.ndarray:
    """Convenience inverse of skin_points: posed world points → rest points."""
    return apply_inverse_ssd(
        skin, skinning_matrices(global_states, inverse_bind_pose),
        posed_points)
