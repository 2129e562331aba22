"""Uniform-grid spatial acceleration for mesh queries.

Reference: axel's TriBvh (TriBvh.h — BVH broadphase behind closest-point and
ray queries). A pointer-chasing BVH is the wrong shape for TPUs; the
static-shape equivalent is a dense uniform grid: triangles binned to cells
once on the host (padded candidate lists), then every query gathers a fixed
3×3×3 cell neighborhood of candidates and reduces over them with masked dense
math. Exact whenever the true closest point lies within one cell ring
(guaranteed when the brute-force distance ≤ cell size); `closest_point_on_
mesh_grid` verifies that bound and falls back to the brute-force kernel for
the (rare) out-of-ring queries.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TriangleGrid", "build_triangle_grid", "closest_point_on_mesh_grid"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleGrid:
    """Dense (R³, K) triangle bins + grid frame. -1 pads empty slots."""

    cells: jnp.ndarray  # (R, R, R, K) int32 triangle indices
    origin: jnp.ndarray  # (3,)
    cell_size: jnp.ndarray  # ()
    resolution: int = dataclasses.field(metadata=dict(static=True))

    @property
    def max_per_cell(self) -> int:
        return self.cells.shape[-1]


def build_triangle_grid(vertices, faces, resolution: int = 16) -> TriangleGrid:
    """Bin triangles into an R³ grid by AABB overlap (host-side, once)."""
    verts = np.asarray(vertices, np.float64)
    tris = np.asarray(faces, np.int64)
    lo = verts.min(0) - 1e-6
    hi = verts.max(0) + 1e-6
    cell = float((hi - lo).max()) / resolution
    cell = max(cell, 1e-9)

    bins: dict = {}
    tv = verts[tris]  # (F, 3, 3)
    tlo = np.floor((tv.min(1) - lo) / cell).astype(np.int64)
    thi = np.floor((tv.max(1) - lo) / cell).astype(np.int64)
    tlo = np.clip(tlo, 0, resolution - 1)
    thi = np.clip(thi, 0, resolution - 1)
    for f in range(tris.shape[0]):
        for i in range(tlo[f, 0], thi[f, 0] + 1):
            for j in range(tlo[f, 1], thi[f, 1] + 1):
                for k in range(tlo[f, 2], thi[f, 2] + 1):
                    bins.setdefault((i, j, k), []).append(f)
    k_max = max((len(v) for v in bins.values()), default=1)
    cells = np.full((resolution,) * 3 + (k_max,), -1, np.int32)
    for (i, j, k), lst in bins.items():
        cells[i, j, k, : len(lst)] = lst
    return TriangleGrid(
        cells=jnp.asarray(cells),
        origin=jnp.asarray(lo, jnp.float32),
        cell_size=jnp.asarray(cell, jnp.float32),
        resolution=resolution,
    )


def _point_triangle_sq(p, a, b, c):
    from momentum_tpu.math.geometry import point_triangle_closest_point

    cp, _ = point_triangle_closest_point(p, a, b, c)
    return jnp.sum((p - cp) ** 2, axis=-1), cp


def closest_point_on_mesh_grid(grid: TriangleGrid, points, vertices, faces,
                               exact: bool = True):
    """Closest surface point per query from the 27-cell neighborhood.

    exact=True additionally runs the brute-force kernel and uses it wherever
    the ring bound (found distance ≤ cell size) doesn't certify the grid
    answer — exact results at roughly broad-phase cost when most queries are
    near the surface. exact=False returns the ring answer as-is (distances
    beyond one cell may be over-estimates).

    Returns (closest_point (Q, 3), face_index (Q,), sq_distance (Q,))."""
    from momentum_tpu.axel.queries import closest_point_on_mesh

    points = jnp.asarray(points, jnp.float32)
    r = grid.resolution
    cell_idx = jnp.clip(
        jnp.floor((points - grid.origin) / grid.cell_size).astype(jnp.int32),
        0, r - 1)
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                  indexing="ij"), -1).reshape(-1, 3)
    nb = jnp.clip(cell_idx[:, None, :] + offs[None], 0, r - 1)  # (Q, 27, 3)
    cand = grid.cells[nb[..., 0], nb[..., 1], nb[..., 2]]  # (Q, 27, K)
    cand = cand.reshape(points.shape[0], -1)  # (Q, 27K)
    valid = cand >= 0
    tri = jnp.take(faces, jnp.maximum(cand, 0), axis=0)  # (Q, C, 3)
    va = jnp.take(vertices, tri[..., 0], axis=0)
    vb = jnp.take(vertices, tri[..., 1], axis=0)
    vc = jnp.take(vertices, tri[..., 2], axis=0)
    d2, cp = _point_triangle_sq(points[:, None, :], va, vb, vc)
    d2 = jnp.where(valid, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    best_cp = jnp.take_along_axis(cp, best[:, None, None], axis=1)[:, 0]
    best_face = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
    if not exact:
        return best_cp, best_face.astype(jnp.int32), best_d2

    # correctness bound: the ring is guaranteed to contain the true closest
    # triangle only when the found distance ≤ one cell size; outside that,
    # fall back to the exact brute-force kernel
    ok = best_d2 <= grid.cell_size ** 2
    bf_cp, bf_face, _, bf_d2 = closest_point_on_mesh(points, vertices, faces)
    return (
        jnp.where(ok[:, None], best_cp, bf_cp),
        jnp.where(ok, best_face, bf_face).astype(jnp.int32),
        jnp.where(ok, best_d2, bf_d2),
    )
