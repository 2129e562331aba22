from momentum_tpu.axel.queries import (  # noqa: F401
    closest_point_on_mesh,
    knn,
    ray_mesh_intersect,
)
from momentum_tpu.axel.sdf import SignedDistanceField, mesh_to_sdf, sdf_to_mesh  # noqa: F401
from momentum_tpu.axel.grid import (  # noqa: F401
    TriangleGrid,
    build_triangle_grid,
    closest_point_on_mesh_grid,
    ray_mesh_intersect_grid,
)
